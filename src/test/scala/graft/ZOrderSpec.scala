package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.plans.{GraftExtensions, ZOrder}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-loop reference: the definition, independent of the
    * magic-number spread in the production path. */
  private def refInterleave(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("interleave16 matches the bit-loop definition") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val x = rng.nextLong()
      val y = rng.nextLong()
      assert(ZOrder.interleave16(x, y) == refInterleave(x & 0xffffL, y & 0xffffL))
    }
    assert(ZOrder.interleave16(0L, 0L) == 0L)
    assert(ZOrder.interleave16(0xffffL, 0xffffL) == 0xffffffffL)
    assert(ZOrder.interleave16(1L, 0L) == 1L)
    assert(ZOrder.interleave16(0L, 1L) == 2L)
    // higher input bits are masked off, not folded in
    assert(ZOrder.interleave16(0x10000L, 0L) == 0L)
    assert(ZOrder.interleave16(-1L, 0L) == 0x55555555L)
  }

  test("interleave16 is invertible: even/odd bit extraction round-trips") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val x = rng.nextInt(65536).toLong
      val y = rng.nextInt(65536).toLong
      val z = ZOrder.interleave16(x, y)
      val gotX = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
      val gotY = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
      assert(gotX == x && gotY == y)
    }
  }

  test("column expression agrees with the JVM path and propagates nulls") {
    val df = Seq(
      (Some(3L), Some(5L)),
      (Some(65535L), Some(0L)),
      (None: Option[Long], Some(1L)),
      (Some(1L), None: Option[Long]))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder(col("x"), col("y")).as("z"))
    val rows = df.collect()
    assert(rows(0).getLong(2) == ZOrder.interleave16(3L, 5L))
    assert(rows(1).getLong(2) == ZOrder.interleave16(65535L, 0L))
    assert(rows(2).isNullAt(2) && rows(3).isNullAt(2))
  }

  test("zorder_long is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT zorder_long(3L, 5L) AS z").first().getLong(0)
    assert(got == ZOrder.interleave16(3L, 5L))
  }

  test("z-locality: nearby points share high bucket bits, far points do not") {
    // The point of the code: a 2-D neighborhood maps into a small code
    // range. Points inside one 16x16 tile differ only in the low 8 code
    // bits; points in tiles far apart differ in high bits.
    val z00 = ZOrder.interleave16(0L, 0L)
    val z15 = ZOrder.interleave16(15L, 15L)
    assert((z15 >> 8) == (z00 >> 8), "one tile -> one high-bit bucket")
    val far = ZOrder.interleave16(32768L, 32768L)
    assert((far >> 8) != (z00 >> 8))
  }

  test("zorderedWrite shrinks per-file 2-D ranges vs an unsorted write") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val rng = new scala.util.Random(3)
    val pts = Seq.fill(20000)((rng.nextInt(4096).toLong, rng.nextInt(4096).toLong))
      .toDF("x", "y")
    val files = 8
    pts.repartition(files).write.mode("overwrite").parquet(s"$tmp/plain")
    Layout.zorderedWrite(pts, "x", "y", files, s"$tmp/zorder")

    // Mean per-file bounding-box area ~ what footer min/max pruning can
    // exclude: the round-robin layout gives every file the full domain;
    // the z-clustered layout gives each file a compact rectangle.
    def meanArea(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max(col("x")) - min(col("x"))) *
          (max(col("y")) - min(col("y")))).as("area"))
        .select(avg(col("area")))
        .first().getDouble(0)
      perFile
    }
    val plain = meanArea(s"$tmp/plain")
    val z = meanArea(s"$tmp/zorder")
    assert(z < plain / 2.0,
      s"z-clustered files must cover <1/2 the 2-D area of unsorted files " +
        s"(got z=$z vs plain=$plain)")
  }
}
