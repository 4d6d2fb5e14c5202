package graft

import java.sql.Date

import org.apache.spark.sql.functions.col

import graft.operators.Profile

/** operators/Profile contracts: dynamic schema, per-dtype normalization,
  * null accounting, the below-k exact branch, numeric-only min/max. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles a mixed-type table with nulls in one pass") {
    val df = Seq(
      (1L, Some(2.5), Some("a"), Some(Date.valueOf("2024-01-01"))),
      (2L, None, Some("b"), Some(Date.valueOf("2024-01-02"))),
      (3L, Some(7.25), None, None),
      (4L, Some(2.5), Some("a"), Some(Date.valueOf("2024-01-01"))))
      .toDF("id", "x", "s", "d")
    val p = Profile.profile(df, k = 16)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap

    assert(p.keySet == Set("id", "x", "s", "d"))
    p.values.foreach(r => assert(r.getAs[Long]("n_rows") == 4L))
    assert(p("x").getAs[Long]("n_nulls") == 1L)
    assert(p("s").getAs[Long]("n_nulls") == 1L)
    assert(p("d").getAs[Long]("n_nulls") == 1L)
    assert(p("id").getAs[Long]("n_nulls") == 0L)
    // below k the estimate IS the exact distinct count (nulls excluded)
    assert(p("id").getAs[Double]("est_distinct") == 4.0)
    assert(p("x").getAs[Double]("est_distinct") == 2.0)
    assert(p("s").getAs[Double]("est_distinct") == 2.0)
    assert(p("d").getAs[Double]("est_distinct") == 2.0)
    // numeric min/max; null for strings and dates
    assert(p("id").getAs[Double]("min_num") == 1.0 &&
      p("id").getAs[Double]("max_num") == 4.0)
    assert(p("x").getAs[Double]("min_num") == 2.5 &&
      p("x").getAs[Double]("max_num") == 7.25)
    assert(p("s").isNullAt(p("s").fieldIndex("min_num")))
    assert(p("d").isNullAt(p("d").fieldIndex("max_num")))
  }

  test("doubles hash on their quantized form — 0.1+0.2 equals 0.3 at 1e-6") {
    val df = Seq(0.1 + 0.2, 0.3).toDF("v") // differ in the 17th digit
    val p = Profile.profile(df, k = 16).collect().head
    assert(p.getAs[Double]("est_distinct") == 1.0,
      "1e-6 quantization must collapse float-noise duplicates")
  }

  test("column order in the output is name-sorted regardless of schema order") {
    val names = Profile.profile(Seq((1, "z")).toDF("zz", "aa"), k = 4)
      .collect().map(_.getAs[String]("column_name")).toSeq
    assert(names == names.sorted)
  }
}
