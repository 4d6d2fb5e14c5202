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

  test("cell_argmax_cosine_long is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT cell_argmax_cosine_long(
           array(1L, 0L), 1L,
           array(0L, 1L),
           array(array(1L, 0L), array(0L, 1L)),
           array(1L, 1L)) AS cell""").first().getLong(0)
    assert(got == 0L, "query (1,0) must route to the (1,0) centroid's cell")
  }

  test("registration is idempotent") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT array_dot_long(array(2L, 2L), array(3L, 3L))")
      .first().getLong(0)
    assert(got == 12L)
  }
}
