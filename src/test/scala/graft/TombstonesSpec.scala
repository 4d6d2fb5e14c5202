package graft

import org.apache.spark.sql.functions._

import graft.operators.Tombstones

/** The shared deletion ledger's own laws (VERDICT r12 #1): segment
  * listing, cross-batch dedupe (a twice-deleted id must never
  * double-subtract from BM25 stats), crash cleanup (a failed append
  * leaves no partial segment), the staged-empty-directory semantics a
  * rebuild promotes, and anti-join identity without a ledger.
  */
class TombstonesSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-tomb").toString + "/t"

  import org.apache.spark.sql.DataFrame
  private def ids(xs: Long*): DataFrame =
    spark.createDataFrame(xs.map(Tuple1(_))).toDF("doc_id")

  test("append dedupes within the batch and against prior segments; read unifies") {
    val root = tmp()
    assert(Tombstones.read(spark, root).isEmpty)
    Tombstones.append(spark, root, ids(1L, 2L, 2L, 3L))
    Tombstones.append(spark, root, ids(3L, 4L)) // 3 already tombstoned
    assert(Tombstones.segmentIds(spark, root) == Seq(0L, 1L))
    assert(Tombstones.count(spark, root) == 4)
    val all = Tombstones.read(spark, root).get
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(all == Seq(1L, 2L, 3L, 4L), s"deduped union, got $all")
  }

  test("a failed append deletes its own fresh segment") {
    val root = tmp()
    Tombstones.append(spark, root, ids(1L))
    val poison = ids(2L).withColumn("doc_id",
      when(col("doc_id") === 2L,
        raise_error(lit("injected"))).otherwise(col("doc_id")))
    intercept[Exception] { Tombstones.append(spark, root, poison) }
    assert(Tombstones.segmentIds(spark, root) == Seq(0L),
      "the aborted segment directory must not survive")
    assert(Tombstones.count(spark, root) == 1)
    Tombstones.append(spark, root, ids(5L)) // the next append proceeds
    assert(Tombstones.count(spark, root) == 2)
  }

  test("an empty staged directory (a rebuild's cleared ledger) reads as no tombstones") {
    val root = tmp()
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    assert(Tombstones.read(spark, root).isEmpty)
    assert(Tombstones.count(spark, root) == 0)
    // antiJoin without a ledger is the identity — same plan, no join
    val df = ids(1L, 2L, 3L)
    assert(Tombstones.antiJoin(spark, root, df, "doc_id")
      .collect().toSeq == df.collect().toSeq)
  }

  test("antiJoin suppresses exactly the tombstoned keys; clear drops the ledger") {
    val root = tmp()
    Tombstones.append(spark, root, ids(2L))
    val kept = Tombstones.antiJoin(spark, root, ids(1L, 2L, 3L), "doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(1L, 3L))
    Tombstones.clear(spark, root)
    assert(Tombstones.read(spark, root).isEmpty)
  }
}
