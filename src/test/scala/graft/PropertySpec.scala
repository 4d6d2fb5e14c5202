package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.functions.Locale
import graft.operators.Relational

/** The SURVEY §5 property-based contracts (ScalaCheck), beyond the
  * example-based specs: pt-BR formatter∘parser round-trip, dedup
  * idempotence + partition-order invariance, month-trunc containment.
  * Data-plane properties evaluate through actual Spark plans (one
  * DataFrame per sampled batch, not per case, to keep the suite fast).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def pass(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("property: pt-BR format∘parse round-trips every cent value") {
    // format cents the way a pt-BR source writes them ("1.234,56"),
    // parse with the engine's ptBrToDouble, recover the exact cents
    val fmt = java.text.NumberFormat.getNumberInstance(
      java.util.Locale.forLanguageTag("pt-BR"))
    fmt.setMinimumFractionDigits(2)
    fmt.setMaximumFractionDigits(2)
    pass(Prop.forAll(Gen.listOfN(50, Gen.choose(-100000000L, 100000000L))) { cents =>
      val strs = cents.map(c => fmt.format(c / 100.0))
      val parsed = strs.toDF("s")
        .select(Locale.ptBrToDouble(col("s")).as("v"))
        .collect().map(r => math.round(r.getDouble(0) * 100))
      parsed.toList == cents
    })
  }

  test("property: KMV sketch == bottom-k of the distinct set under any partitioning") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val k = 16
    pass(Prop.forAll(
      Gen.listOfN(300, Gen.choose(0L, 200L)), Gen.choose(1, 8)) { (vs, parts) =>
      val sketch = ColumnBridge.column(graft.plans.KmvSketchLong(
        ColumnBridge.expression(col("v")), k).toAggregateExpression())
      val got = vs.toDF("v").repartition(parts).agg(sketch.as("s"))
        .first().getSeq[Long](0)
      got == vs.distinct.sorted.take(k)
    })
  }

  test("property: dedupKeepFirst is idempotent and partition-order invariant") {
    val rowGen = for {
      k <- Gen.choose(0, 8) // few keys -> guaranteed collisions
      v <- Gen.choose(-1000, 1000)
    } yield (k.toLong, v.toLong)
    pass(Prop.forAll(Gen.listOfN(60, rowGen), Gen.choose(1, 7)) { (rows, nPart) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, nPart)).toDF("k", "v")
      val once = Relational.dedupKeepFirst(df, keys = Seq("k"), order = Seq(col("v")))
      val twice = Relational.dedupKeepFirst(once, keys = Seq("k"), order = Seq(col("v")))
      val expected = rows.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).min) }.toSet
      val got = once.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expected && twice.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == got
    })
  }

  test("property: month truncation lands on the first instant of the same month") {
    val tsGen = Gen.choose(0L, 2051222400L) // 1970..2035, seconds
    pass(Prop.forAll(Gen.listOfN(50, tsGen)) { secs =>
      val rows = secs.map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
      rows.toDF("ts")
        .select(col("ts"), date_trunc("month", col("ts")).as("m"))
        .collect().forall { r =>
          val ts = r.getTimestamp(0).toInstant.atZone(java.time.ZoneOffset.UTC)
          val m = r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC)
          m.getYear == ts.getYear && m.getMonth == ts.getMonth &&
            m.getDayOfMonth == 1 && m.getHour == 0 && m.getMinute == 0 &&
            m.getSecond == 0 && !m.toInstant.isAfter(ts.toInstant)
        }
    })
  }

  test("property: mixture keep/split buckets are total and disjoint by construction") {
    // the q44/q49 hash-bucket rules: every doc lands in exactly one
    // split, and the mixture keep decision is stable across reruns
    pass(Prop.forAll(Gen.listOfN(40, Gen.choose(0L, Long.MaxValue / 2))) { ids =>
      val df = ids.toDF("doc_id")
      val b = conv(substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 7), 16, 10)
        .cast("long") % 100
      val splits = df.select(
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("s"))
        .collect().map(_.getString(0))
      val again = df.select(
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("s"))
        .collect().map(_.getString(0))
      splits.forall(Set("train", "val", "test")) && splits.sameElements(again)
    })
  }

  test("property: SeriesFillStream fold is split-invariant at any batch boundary") {
    // the streaming LOCF kernel: folding an in-order day sequence in
    // one slice equals folding any prefix then the rest from its state
    import graft.streaming.SeriesFillStream
    val gen = for {
      n <- Gen.choose(1, 30)
      gaps <- Gen.listOfN(n, Gen.choose(1, 9))
      cents <- Gen.listOfN(n, Gen.choose(-500L, 500L))
      cut <- Gen.choose(0, n)
    } yield (gaps.scanLeft(100)(_ + _).tail.zip(cents), cut)
    pass(Prop.forAll(gen) { case (obs, cut) =>
      val whole = SeriesFillStream.foldSlice(obs, None)
      val split = SeriesFillStream.foldSlice(obs.drop(cut),
        if (cut == 0) None else Some(SeriesFillStream.foldSlice(obs.take(cut), None)))
      whole == split
    })
  }

  test("property: PostingsStream fold is split-invariant and replay-absorbing") {
    // the incremental index kernel: folding a sorted id set in one
    // slice equals folding any prefix then the rest from its state;
    // re-folding an already-folded prefix is a no-op (at-least-once)
    import graft.streaming.PostingsStream
    val gen = for {
      n <- Gen.choose(1, 40)
      gaps <- Gen.listOfN(n, Gen.choose(1L, 400L)) // gaps straddle blocks
      cut <- Gen.choose(0, n)
    } yield (gaps.scanLeft(0L)(_ + _).tail, cut)
    pass(Prop.forAll(gen) { case (ids, cut) =>
      val whole = PostingsStream.foldSlice(ids, None)
      val pre = if (cut == 0) None
        else Some(PostingsStream.foldSlice(ids.take(cut), None))
      val split = PostingsStream.foldSlice(ids.drop(cut), pre)
      val replayed = PostingsStream.foldSlice(ids.take(cut),
        Some(whole)) // whole already folded every id in the prefix
      whole == split && replayed == whole
    })
  }

  test("property: FunnelStream fold is split-invariant at any batch boundary") {
    // the streaming funnel kernel: same state whether the in-order
    // event sequence arrives whole or split at any point
    import graft.streaming.FunnelStream
    val gen = for {
      n <- Gen.choose(1, 40)
      ts <- Gen.listOfN(n, Gen.choose(1L, 60L))
      st <- Gen.listOfN(n, Gen.choose(0, 3))
      cut <- Gen.choose(0, n)
    } yield (ts.sorted.zip(st), cut)
    pass(Prop.forAll(gen) { case (evs, cut) =>
      val whole = FunnelStream.foldSlice(evs, None, 4)
      val split = FunnelStream.foldSlice(evs.drop(cut),
        if (cut == 0) None else Some(FunnelStream.foldSlice(evs.take(cut), None, 4)), 4)
      whole == split
    })
  }

  test("property: HLL registers are a set-union homomorphism (merge == registers of union)") {
    import graft.operators.Hll
    // split any multiset at any point: registers(A ∪ B) must equal
    // merge(registers(A), registers(B)) — the exact law that makes
    // HllStream's replay-free fold correct; also max(estimate error)
    // sanity: registers are non-empty whenever input is
    val gen = for {
      vs <- Gen.listOfN(200, Gen.choose(Long.MinValue / 4, Long.MaxValue / 4))
        .map(_.map(math.abs))
      cut <- Gen.choose(0, 200)
    } yield (vs, cut)
    pass(Prop.forAll(gen) { case (vs, cut) =>
      def reg(xs: Seq[Long]): Map[Long, Int] =
        if (xs.isEmpty) Map.empty
        else Hll.registers(xs.toDF("hv").withColumn("k", lit("g")), "k", "hv")
          .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
      val (a, b) = vs.splitAt(cut)
      val whole = reg(vs)
      val merged = (reg(a).toSeq ++ reg(b).toSeq)
        .groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }
      merged == whole
    })
  }
}
