package graft

import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot_long is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT array_dot_long(a, b) AS d FROM vecs").first().getLong(0)
    assert(got == 4 + 10 + 18)
  }

  test("registration is idempotent") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT array_dot_long(array(2L, 2L), array(3L, 3L))")
      .first().getLong(0)
    assert(got == 12L)
  }
}
