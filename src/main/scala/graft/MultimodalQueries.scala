package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column query surface (north-star "multimodal columns"):
  * documents ride as opaque BINARY payloads + typed metadata; features
  * derive deterministically from payload bytes (decode stubbed — see
  * [[graft.multimodal.Multimodal]]). Oracle-checked: per-source payload
  * sizes and exact-integer-averaged pseudo features.
  */
object MultimodalQueries {

  private def hex7Sql(e: String): String =
    s"""list_sum(list_transform(range(7), i ->
        (strpos('0123456789abcdef', substr(md5($e), CAST(i AS INT) + 1, 1)) - 1)
          * CAST(power(16, 6 - i) AS BIGINT)))"""

  // --- binary payload + metadata + feature extraction --------------------
  private val q31 = Q(
    (spark, dir) => {
      val d = Multimodal.withMeta(
        Multimodal.withPayload(Tables.documents(spark, dir), "text"))
      d.select(col("source"), col("meta.n_bytes").as("n_bytes"),
          Multimodal.fakeFeature(col("text"), 0).as("k0"),
          Multimodal.fakeFeature(col("text"), 1).as("k1"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("total_bytes"),
          (sum(col("k0")).cast("double") / lit(268435456.0) / count(lit(1))).as("avg_f0"),
          (sum(col("k1")).cast("double") / lit(268435456.0) / count(lit(1))).as("avg_f1"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH f AS (
        SELECT source, strlen(text) AS n_bytes,
               ${hex7Sql("'0|' || text")} AS k0,
               ${hex7Sql("'1|' || text")} AS k1
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             CAST(sum(k0) AS DOUBLE) / 268435456.0 / count(*) AS avg_f0,
             CAST(sum(k1) AS DOUBLE) / 268435456.0 / count(*) AS avg_f1
      FROM f GROUP BY 1 ORDER BY source ASC NULLS FIRST"""))

  val all: Seq[(String, Q)] = Seq(
    "q31_multimodal_features" -> q31)
}
