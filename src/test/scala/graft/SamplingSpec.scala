package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Contracts of the deterministic sampling algebra (operators/Sampling):
  * exact long floor-division (the >2^53 double trap), priority pack /
  * unpack round-trip, bounds enforcement, agreement of the windowless
  * bounded-aggregate top-k path with a reference window ranking, and
  * balanceAccept's expectation + layout independence.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("ldiv is exact where double division is not") {
    // 2^60 + 1 over 2: true floor = 2^59; via double, (2^60+1) rounds to
    // 2^60 and the quotient comes back 2^59 exactly — make the operand
    // pair where the double path is off by one.
    val a = (1L << 60) + 3L
    val b = 2L
    val row = Seq((a, b)).toDF("a", "b")
      .select(Sampling.ldiv(col("a"), col("b")).as("q"),
        (col("a") / col("b")).cast("long").as("qd"))
      .first()
    assert(row.getLong(0) == a / b, "ldiv matches JVM long division")
    assert(row.getLong(1) != a / b, "double-division path is genuinely wrong here")
  }

  test("priority pack/unpack round-trips and orders by (priority desc, id asc)") {
    val df = (0L until 1000L).map(i => (i, 40L + i % 300)).toDF("id", "w")
      .select(col("id"), col("w"),
        Sampling.priorityPacked("t|", col("id"), col("w")).as("pk"))
    val (prio, id) = Sampling.unpackPriority(col("pk"))
    val rows = df.select(col("id"), col("w"), prio.as("p"), id.as("id2"), col("pk"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(3), "id survives the round-trip")
      val expected = (r.getLong(1) * (1L << Sampling.PriorityHashBits)) /
        (hash24("t|" + r.getLong(0)) + 1L)
      assert(r.getLong(2) == expected, s"priority formula for id=${r.getLong(0)}")
    }
    // packed order == (priority desc, id asc) lexicographic order
    val byPacked = rows.sortBy(r => -r.getLong(4)).map(_.getLong(0)).toSeq
    val byPair = rows.sortBy(r => (-r.getLong(2), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byPacked == byPair)
  }

  private def hash24(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16)
  }

  test("priorityPacked enforces its weight and id bounds in-plan") {
    val badW = Seq((1L, 0L)).toDF("id", "w")
      .select(Sampling.priorityPacked("t|", col("id"), col("w")))
    val e1 = intercept[Exception](badW.collect())
    assert(e1.getMessage.contains("priorityPacked bounds"))
    val badId = Seq((1L << 25, 10L)).toDF("id", "w")
      .select(Sampling.priorityPacked("t|", col("id"), col("w")))
    val e2 = intercept[Exception](badId.collect())
    assert(e2.getMessage.contains("priorityPacked bounds"))
  }

  test("bounded-aggregate top-k path agrees with the window-ranking reference") {
    val df = (0L until 2000L)
      .map(i => (s"g${i % 3}", i, 40L + (i * 37) % 500)).toDF("g", "id", "w")
    val k = 25
    val packed = df.select(col("g"),
      Sampling.priorityPacked("p|", col("id"), col("w")).as("pk"))
      .select(col("g"), (-col("pk")).as("npk"))
    val viaAgg = packed.groupBy(col("g"))
      .agg(graft.operators.Kmv.sketch(col("npk"), k).as("arr"))
      .select(col("g"), explode(col("arr")).as("neg"))
      .select(col("g"), (-col("neg")).as("pk"))
    val (prio, id) = Sampling.unpackPriority(col("pk"))
    val aggRows = viaAgg.select(col("g"), id.as("id"), prio.as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val w = Window.partitionBy(col("g"))
      .orderBy(col("p").desc, col("id"))
    val refRows = df.select(col("g"), col("id"),
      Sampling.priorityPacked("p|", col("id"), col("w")).as("pk"))
      .select(col("g"), col("id"), shiftright(col("pk"), Sampling.PackIdBits).as("p"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("g"), col("id"), col("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(aggRows == refRows)
  }

  test("balanceAccept hits the target count in expectation, independent of layout") {
    val n = 20000L
    val target = 2500L
    val df = (0L until n).toDF("id")
    def kept(parts: Int): Set[Long] = df.repartition(parts)
      .select(col("id"),
        Sampling.hashBits("b|", col("id"), 40).as("h"))
      .filter(Sampling.balanceAccept(col("h"), lit(n), lit(target)))
      .collect().map(_.getLong(0)).toSet
    val k1 = kept(1)
    assert(kept(11) == k1, "acceptance is a pure row function of the id")
    val dev = math.abs(k1.size - target.toDouble) / target
    // binomial sd = sqrt(target * (1 - p)) ~ 47 → 5 sigma ≈ 9.5%
    assert(dev < 0.1, s"kept ${k1.size} of expected ~$target")
  }

  test("hashBits rejects bad widths and matches the md5 prefix definition") {
    intercept[IllegalArgumentException](Sampling.hashBits("x", lit(1L), 7))
    intercept[IllegalArgumentException](Sampling.hashBits("x", lit(1L), 64))
    val h = Seq(123L).toDF("id")
      .select(Sampling.hashBits("pre|", col("id"), 24)).first().getLong(0)
    assert(h == hash24("pre|123"))
  }
}
