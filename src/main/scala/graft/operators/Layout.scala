package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the 100 TB posture: bucketed tables make
  * repeated fact-to-fact equi-joins and aggregations CO-LOCATED — both
  * sides are pre-hash-partitioned (and pre-sorted) by the join key at
  * write time, so the join plans with NO shuffle exchange and no
  * re-sort. At cluster scale this converts the dominant network cost of
  * a fact/fact join into a local merge per bucket.
  *
  * (Hive-style partitioning — `partitionBy` — handles pruning by
  * low-cardinality columns and is used by the gold sinks; bucketing
  * handles join/agg key distribution. They compose.)
  */
object Layout {

  /** Write `df` as a bucketed, in-bucket-sorted table registered in the
    * session catalog at `path`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when both were written with the same `buckets` count. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
