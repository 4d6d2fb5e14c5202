package graft.pipeline

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.silver.Silver
import graft.sources.{BcbSource, CsvDialect, IbgeSource, JsonFetcher}

/** Run configuration (reference inputs/run_config.json, S5). `warehouse`
  * replaces the reference's DuckDB path: tables load as full-replace
  * parquet directories (same idempotent replace semantics as
  * load.py:18-28, S9 — Spark's `mode("overwrite")`). */
final case class RunConfig(
    startDate: String,
    endDate: String,
    anpBronzeFile: String,
    warehousePath: String)

object RunConfig {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Driver-side JSON config parse (main.py:18-20). Accepts the
    * reference's key names; `duckdb_path` maps to the warehouse dir. */
  def fromJson(json: String): RunConfig = {
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def str(k: String): String = m(k).asInstanceOf[JString].s
    RunConfig(
      startDate = str("start_date"),
      endDate = str("end_date"),
      anpBronzeFile = str("anp_bronze_file"),
      warehousePath = m.get("warehouse_path").orElse(m.get("duckdb_path"))
        .map(_.asInstanceOf[JString].s).getOrElse("data/warehouse"))
  }

  def fromFile(path: String): RunConfig =
    fromJson(Files.readString(Paths.get(path)))
}

/** Incremental state document (reference state/state.json — a stub there;
  * real here, SURVEY §7.2-5): per-source high-water marks that become
  * pushdown predicates on the next run. */
final case class IncrementalState(
    bcbLastDate: Option[String],
    anpLastPeriod: Option[String],
    ibgeLastSync: Option[String])

object IncrementalState {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  val empty: IncrementalState = IncrementalState(None, None, None)

  def fromFile(path: String): IncrementalState = {
    if (!Files.exists(Paths.get(path))) empty
    else {
      val m = JsonMethods.parse(Files.readString(Paths.get(path)))
        .asInstanceOf[JObject].obj.toMap
      def opt(k: String): Option[String] = m.get(k).collect { case JString(s) => s }
      IncrementalState(opt("bcb_last_date"), opt("anp_last_period"), opt("ibge_last_sync"))
    }
  }

  def write(path: String, s: IncrementalState): Unit = {
    def j(v: Option[String]) = v.map("\"" + _ + "\"").getOrElse("null")
    val json =
      s"""{
         |  "bcb_last_date": ${j(s.bcbLastDate)},
         |  "anp_last_period": ${j(s.anpLastPeriod)},
         |  "ibge_last_sync": ${j(s.ibgeLastSync)}
         |}""".stripMargin
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path), json.getBytes(StandardCharsets.UTF_8))
  }
}

/** Atomic multi-table tier commit (VERDICT r7 #5): the gold marts, the
  * warehouse tables, and summary.md previously committed independently,
  * so a crash between tier writes left the tiers observably inconsistent
  * (new gold + old warehouse). This is the plain-directory approximation
  * of a transactional multi-table commit — a write-ahead redo manifest:
  *
  *   1. STAGE every output to its `.__swap_tmp` sibling (the slow part;
  *      a crash here changes nothing observable — targets untouched,
  *      stale tmps are overwritten by the next run's stages);
  *   2. write ONE manifest file listing every target, via tmp + atomic
  *      rename — this rename IS the commit point;
  *   3. PROMOTE each target (graveyard old → rename tmp in → drop
  *      graveyard; each step idempotent);
  *   4. delete the manifest.
  *
  * A crash before 2 is all-old; after 2, [[heal]] (run at the start of
  * every pipeline run, before any tier is read) rolls the remaining
  * promotions forward — all-new. No intermediate state survives a
  * restart. Readers outside the pipeline resolve consistency the same
  * way: call [[heal]] before reading the tiers.
  *
  * The reference has no analog (its five DuckDB loads, load.py:18-28 +
  * main.py:72-76, each replace independently); the capability being
  * honored is its *idempotent full-replace* posture, strengthened to
  * crash-atomicity across tables. */
object TierCommit {
  import org.apache.hadoop.fs.{FileSystem, Path}

  val ManifestName = "_tier_commit.json"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def swapTmp(t: Path) = new Path(t.getParent, t.getName + ".__swap_tmp")
  private def swapOld(t: Path) = new Path(t.getParent, t.getName + ".__swap_old")

  /** Where a stage for `target` must land — for writers that stage a
    * whole directory TREE themselves (a segmented index: postings +
    * stats + meta) rather than one DataFrame/file. Write the tree at
    * this path, then [[commit]] promotes it under `target` atomically. */
  def stagePath(target: String): String = swapTmp(new Path(target)).toString

  /** Stage a DataFrame at `target`'s tmp sibling (not yet visible). */
  def stageDf(spark: SparkSession, df: DataFrame, target: String,
              partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(swapTmp(new Path(target)).toString)
  }

  /** Stage raw bytes (summary.md) at `target`'s tmp sibling. */
  def stageFile(spark: SparkSession, bytes: Array[Byte], target: String): Unit = {
    val tmp = swapTmp(new Path(target))
    val out = fsOf(spark, tmp).create(tmp, true) // creates parent dirs
    try out.write(bytes) finally out.close()
  }

  /** Idempotent swap-in of a staged target. Re-entrant after a crash at
    * any point: tmp absent means the swap already happened (only the
    * graveyard cleanup can remain); target absent with tmp present means
    * the graveyard rename happened but not the swap-in. */
  private def promote(spark: SparkSession, targetStr: String): Unit = {
    val target = new Path(targetStr)
    val fs = fsOf(spark, target)
    val (tmp, old) = (swapTmp(target), swapOld(target))
    if (fs.exists(tmp)) {
      if (fs.exists(target)) {
        fs.delete(old, true)
        if (!fs.rename(target, old))
          sys.error(s"tier commit: failed to graveyard $target")
      }
      if (!fs.rename(tmp, target))
        sys.error(s"tier commit: failed to promote $tmp to $target")
    }
    fs.delete(old, true)
  }

  private def manifestPath(rootDir: String) = new Path(rootDir, ManifestName)

  /** The commit point alone: publish the manifest via tmp + atomic
    * rename. Split from [[commit]] so crash-injection tests can stop the
    * world here and prove [[heal]] completes the promotion. */
  private[graft] def writeManifest(spark: SparkSession, rootDir: String,
                                   targets: Seq[String]): Unit = {
    val mf = manifestPath(rootDir)
    val fs = fsOf(spark, mf)
    val mfTmp = new Path(mf.getParent, mf.getName + ".__tmp")
    val json = targets
      .map(t => "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("{\"targets\": [", ", ", "]}")
    val out = fs.create(mfTmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fs.delete(mf, false) // stale manifest was healed before staging began
    if (!fs.rename(mfTmp, mf))
      sys.error(s"tier commit: failed to publish manifest $mf")
  }

  /** Commit all staged targets atomically: manifest rename = commit point. */
  def commit(spark: SparkSession, rootDir: String, targets: Seq[String]): Unit = {
    writeManifest(spark, rootDir, targets)
    targets.foreach(promote(spark, _))
    fsOf(spark, manifestPath(rootDir)).delete(manifestPath(rootDir), false)
  }

  val LockName = "_tier_writer.lock"

  private def lockPath(rootDir: String) = new Path(rootDir, LockName)

  /** Run `body` holding `rootDir`'s EXCLUSIVE writer lock — the
    * single-writer assumption every in-place index rebuild/compaction
    * makes, now enforced instead of assumed (VERDICT r10 #6): two
    * concurrent rebuilds on one index dir would interleave stage and
    * commit (they share the swap path), and the loser's manifest would
    * silently win. Acquisition is an atomic create-exclusive of
    * `_tier_writer.lock`; a second concurrent writer RAISES at entry —
    * before it can touch the winner's staged tree — instead of
    * clobbering.
    *
    * A writer that CRASHES inside the critical section leaves a stale
    * lock, which blocks subsequent writers loudly (by design: the
    * filesystem cannot distinguish a stale lock from a live writer).
    * Recovery is the operator's assertion that no writer is live:
    * [[breakLock]], then retry — [[heal]] itself never takes or clears
    * the lock, so crash-healed READS are unaffected.
    *
    * Acquisition atomicity (ADVICE r11): on the local filesystem
    * Hadoop's create(overwrite=false) is exists-then-create — two truly
    * concurrent racers could both win — so the local path uses java.nio
    * CREATE_NEW (POSIX O_CREAT|O_EXCL, atomic at the kernel). On HDFS
    * the Hadoop create IS an atomic namenode operation, so the generic
    * path keeps it. Either way the lock file is OURS the instant the
    * create succeeds, so a failure writing the lock METADATA deletes it
    * before rethrowing — no stale lock leaks from a writer that never
    * entered the critical section. */
  def withWriteLock[T](spark: SparkSession, rootDir: String)(body: => T): T = {
    val lp = lockPath(rootDir)
    val fs = fsOf(spark, lp)
    if (!fs.exists(lp.getParent)) fs.mkdirs(lp.getParent)
    def held(e: Exception): Nothing =
      sys.error(s"tier commit: writer lock $lp is held — a concurrent " +
        "rebuild/compaction/append is running (or crashed; if no writer " +
        s"is live, TierCommit.breakLock and retry): $e")
    val payload =
      s"""{"acquired_utc_ms": ${System.currentTimeMillis()}, "pid": ${ProcessHandle.current().pid()}}\n"""
        .getBytes(StandardCharsets.UTF_8)
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(lp.toUri.getPath)
      try java.nio.file.Files.createFile(local) // O_CREAT|O_EXCL: atomic
      catch { case e: java.io.IOException => held(e) }
      try java.nio.file.Files.write(local, payload)
      catch { case e: Throwable => fs.delete(lp, false); throw e }
    } else {
      val out = try fs.create(lp, false) // overwrite=false: atomic on HDFS
      catch { case e: java.io.IOException => held(e) }
      try out.write(payload)
      catch { case e: Throwable => out.close(); fs.delete(lp, false); throw e }
      out.close()
    }
    try body
    finally fs.delete(lp, false)
  }

  /** Remove a stale writer lock — the explicit operator recovery step
    * after a crashed in-place rebuild (see [[withWriteLock]]). */
  def breakLock(spark: SparkSession, rootDir: String): Boolean = {
    val lp = lockPath(rootDir)
    fsOf(spark, lp).delete(lp, false)
  }

  /** Roll an interrupted commit forward. Returns true when a manifest was
    * found (and its promotions completed). Call before reading any tier.
    * Never touches the writer lock — healing is a READ-side recovery
    * (roll the published manifest forward); write-side recovery after a
    * crash is [[breakLock]]. */
  def heal(spark: SparkSession, rootDir: String): Boolean = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val mf = manifestPath(rootDir)
    val fs = fsOf(spark, mf)
    if (!fs.exists(mf)) return false
    val in = fs.open(mf)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      buf.toString("UTF-8")
    } finally in.close()
    val targets = (JsonMethods.parse(json) \ "targets") match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Nil
    }
    targets.foreach(promote(spark, _))
    fs.delete(mf, false)
    true
  }
}

/** The medallion pipeline runner (reference src/main.py:24-86):
  * config → extract (bronze) → silver → gold → load → summary.
  *
  * Tier layout under `rootDir`:
  *   bronze/  raw per-source parquet (S6)
  *   silver/  standardized contracts (S7)
  *   gold/    hive-partitioned marts (S8) + summary.md (S10)
  *   <warehouse>/  full-replace "table" parquet dirs (S9 equivalent)
  *
  * All writes are `mode("overwrite")` — restart-safe idempotent batch,
  * the capability the reference's full-replace DuckDB loads encode.
  * If `statePath` is set, the BCB extract pushes `date > bcb_last_date`
  * down to the source and the state advances to the new max date.
  */
object Pipeline {

  final case class Result(
      bcbSilver: DataFrame, // FULL silver after merging any increment
      bcbIncrement: DataFrame, // just this run's new rows
      anpSilver: DataFrame, // FULL silver after merging any increment
      anpIncrement: DataFrame, // just this run's rows past the ANP mark
      ufDim: DataFrame,
      gold: Map[String, DataFrame],
      summary: String)

  def run(spark: SparkSession, fetcher: JsonFetcher, cfg: RunConfig,
          rootDir: String, seriesCsvPath: String,
          statePath: Option[String] = None,
          forceDimRefresh: Boolean = false): Result = {

    // Roll forward any tier commit a previous run crashed inside — no
    // tier may be read (or re-staged) against a half-promoted layout.
    TierCommit.heal(spark, rootDir)

    val state = statePath.map(IncrementalState.fromFile).getOrElse(IncrementalState.empty)

    // ---------- EXTRACT (main.py:31-50) ----------
    // Series control table: enabled flag is case-insensitive {"true","1","yes"} (P3).
    val seriesCfg = spark.read.option("header", "true").csv(seriesCsvPath)
      .filter(lower(col("enabled")).isin("true", "1", "yes"))
      .select(col("series_id").cast("long"), col("series_name"))
      .collect() // control table: O(series), driver-side by design
    // Partition-parallel fetch (SURVEY §2.1-S1): the reference loops
    // series sequentially on the driver (main.py:36-41); here each
    // fetch + bronze write runs on a bounded thread pool, so wall-clock
    // stays ~flat as the series count grows. SparkSession is
    // thread-safe; per-series outputs go to disjoint bronze paths. Any
    // fetch failure propagates (fail-fast, like the sequential loop).
    val bcbFrames = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(8, seriesCfg.length)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val futures = seriesCfg.toSeq.map { row =>
          scala.concurrent.Future {
            val id = row.getAs[Long]("series_id")
            val name = row.getAs[String]("series_name")
            val bronze0 = BcbSource.fetch(spark, fetcher, id, cfg.startDate, cfg.endDate)
            // Incremental: only rows past the high-water mark flow downstream.
            val bronze = state.bcbLastDate match {
              case Some(d) => bronze0.filter(col("date") > lit(d).cast("timestamp"))
              case None => bronze0
            }
            bronze.write.mode("overwrite").parquet(s"$rootDir/bronze/bcb_sgs_$id.parquet")
            Silver.toSilverBcb(bronze, name)
          }
        }
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf)
        catch { case e: Throwable =>
          // fail-fast must not leave orphaned futures writing bronze
          // paths that a retry of run() would race: interrupt the pool
          // and wait for in-flight writes to wind down before rethrowing
          pool.shutdownNow()
          if (!pool.awaitTermination(5, java.util.concurrent.TimeUnit.MINUTES))
            System.err.println(
              "[pipeline] WARNING: fetch pool did not quiesce within 5 min; " +
                "an in-flight bronze write may race a retried run")
          throw e
        }
      } finally pool.shutdown()
    }
    val bcbIncrement = bcbFrames.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "series_id BIGINT, series_name STRING, date TIMESTAMP, value DOUBLE")))

    // Incremental merge: an increment is rows PAST the high-water mark,
    // so downstream tiers must see prior history plus the increment —
    // a full-replace write of just the increment would destroy every
    // previously loaded row. The silver store is the durable merge
    // target; it is rewritten via temp-dir-and-swap (Spark cannot
    // overwrite a path it is reading from), and gold/warehouse/summary
    // always recompute from the merged whole, so their full-replace
    // writes stay idempotent and correct.
    // The merge is belt-and-braces idempotent: even if a mark at coarser
    // granularity than the data (or a same-day revision) lets a row
    // through twice, the keep-first dedup on the natural key collapses
    // it — the merged store can never hold duplicate (series_id, date)
    // rows regardless of mark/timestamp granularity.
    val silverPath = s"$rootDir/silver/bcb_sgs.parquet"
    val merged = state.bcbLastDate match {
      case Some(_) if pathExists(spark, silverPath) =>
        graft.operators.Relational.dedupKeepFirst(
          spark.read.parquet(silverPath).unionByName(bcbIncrement),
          keys = Seq("series_id", "date"), order = Seq(col("value")))
      case _ => bcbIncrement
    }
    swapWrite(spark, merged, silverPath)
    val bcbSilver = spark.read.parquet(silverPath)

    // `ibge_last_sync` drives a real skip (the asymmetry vs the BCB/ANP
    // marks closed): the UF dimension changes ~never, so when the state
    // says it was synced TODAY and the bronze copy exists, the refetch is
    // skipped and bronze is served as-is. `forceDimRefresh` (or a stale /
    // absent mark, or a missing bronze file) takes the fetch path.
    val ufDimPath = s"$rootDir/bronze/ibge_uf_dim.parquet"
    val dimFresh = !forceDimRefresh &&
      state.ibgeLastSync.contains(java.time.LocalDate.now().toString) &&
      pathExists(spark, ufDimPath)
    val ufDim =
      if (dimFresh) spark.read.parquet(ufDimPath)
      else {
        val fetched = IbgeSource.fetch(spark, fetcher)
        fetched.write.mode("overwrite").parquet(ufDimPath)
        fetched
      }

    val anpRaw = CsvDialect.read(spark, cfg.anpBronzeFile)
    anpRaw.write.mode("overwrite").parquet(s"$rootDir/bronze/anp_raw.parquet")

    // ---------- TRANSFORM (main.py:53-56) ----------
    // ANP incremental (reference state stub state/state.json:1-5): the
    // bronze CSV is always re-read in full (it is a file drop), but only
    // rows past `anp_last_period` flow into the increment — the same
    // high-water-mark pushdown as the BCB path, applied right after the
    // silver projection so Catalyst pushes the date_ref predicate below
    // the enrich join. The durable silver store merges increment +
    // history with the same natural-key dedup as BCB.
    //
    // SEMANTIC TRADE (inherent to any high-water-mark scheme): a later
    // CSV drop that REVISES or backfills a row at date_ref <= mark is
    // not picked up by incremental runs — the mark filter is what buys
    // skipping old periods. Sources that revise history should run
    // without statePath (full reprocess, the reference's own behavior)
    // or reset state.json; append-only drops get the fast path.
    val anpSilverAll = Silver.enrichUf(Silver.toSilverAnp(anpRaw), ufDim)
    val anpIncrement = state.anpLastPeriod match {
      case Some(p) => anpSilverAll.filter(col("date_ref") > lit(p).cast("timestamp"))
      case None => anpSilverAll
    }
    val anpPath = s"$rootDir/silver/anp_prices.parquet"
    val anpMerged = state.anpLastPeriod match {
      case Some(_) if pathExists(spark, anpPath) =>
        graft.operators.Relational.dedupKeepFirst(
          spark.read.parquet(anpPath).unionByName(anpIncrement),
          keys = Seq("date_ref", "uf_sigla", "product"), order = Seq(col("price")))
      case _ => anpIncrement
    }
    swapWrite(spark, anpMerged, anpPath)
    val anpSilver = spark.read.parquet(anpPath)

    // ---------- GOLD (main.py:59) ----------
    val gold = Silver.buildGold(bcbSilver, anpSilver)

    // ---------- LOAD (main.py:62-76): one atomic tier commit ----------
    // (bcb + anp silver already written by the merge swaps above; they
    // are upstream durable state, not part of the serving tier set.)
    // dim_uf + both gold marts + all five warehouse tables + summary.md
    // stage invisibly, then commit as ONE manifest-pinned unit: a crash
    // anywhere leaves either all-old or all-new (TierCommit scaladoc).
    val wh = if (Paths.get(cfg.warehousePath).isAbsolute) cfg.warehousePath
             else s"$rootDir/${cfg.warehousePath}"
    val summary = Summary.build(bcbSilver, anpSilver)
    val staged = scala.collection.mutable.ArrayBuffer.empty[String]
    def stage(df: DataFrame, path: String, parts: Seq[String] = Nil): Unit = {
      TierCommit.stageDf(spark, df, path, parts); staged += path
    }
    stage(ufDim, s"$rootDir/silver/dim_uf.parquet")
    stage(gold("bcb_monthly"), s"$rootDir/gold/bcb_monthly", Seq("series_id"))
    stage(gold("anp_monthly"), s"$rootDir/gold/anp_monthly", Seq("uf_sigla"))
    Seq(
      "silver_bcb_sgs" -> bcbSilver, "silver_anp_prices" -> anpSilver,
      "dim_uf" -> ufDim, "gold_bcb_monthly" -> gold("bcb_monthly"),
      "gold_anp_monthly" -> gold("anp_monthly")
    ).foreach { case (t, df) => stage(df, s"$wh/$t") }

    // ---------- SUMMARY (main.py:79-86): part of the same commit ------
    TierCommit.stageFile(spark, summary.getBytes(StandardCharsets.UTF_8),
      s"$rootDir/gold/summary.md")
    staged += s"$rootDir/gold/summary.md"
    TierCommit.commit(spark, rootDir, staged.toSeq)

    // ---------- STATE ----------
    // High-water marks carry the FULL max timestamp (not a truncated
    // date): a date-granular mark would re-admit same-day rows with
    // intra-day time components on the next run. (The merge dedup above
    // would still collapse them, but the mark itself should be exact.)
    statePath.foreach { p =>
      // full microsecond precision (Spark timestamps are micros): a
      // seconds-granular mark would re-admit rows with fractional parts
      val hwmFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      def mark(df: DataFrame, ts: String, prev: Option[String]): Option[String] =
        Option(df.agg(max(col(ts))).collect().head.get(0))
          .map(_.asInstanceOf[java.sql.Timestamp].toLocalDateTime.format(hwmFmt))
          .orElse(prev)
      IncrementalState.write(p, state.copy(
        bcbLastDate = mark(bcbSilver, "date", state.bcbLastDate),
        anpLastPeriod = mark(anpSilver, "date_ref", state.anpLastPeriod),
        ibgeLastSync = Some(java.time.LocalDate.now().toString)))
    }

    Result(bcbSilver, bcbIncrement, anpSilver, anpIncrement, ufDim, gold, summary)
  }

  private def swapTmp(t: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(t.getParent, t.getName + ".__swap_tmp")
  private def swapOld(t: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(t.getParent, t.getName + ".__swap_old")

  /** Scheme-aware existence check through the Hadoop FileSystem API —
    * `java.nio.file.Files.exists` sees only the LOCAL filesystem and
    * would make every merge-vs-initial-load decision wrong on
    * hdfs:// / s3a:// paths (an existing remote store would be silently
    * replaced by just the increment).
    *
    * SELF-HEALING: before answering, repair a swap that crashed between
    * its two renames (see [[swapWrite]]) — otherwise a merge decision
    * taken on the crashed state would silently treat the whole store as
    * empty and a subsequent full-replace write would make the loss
    * permanent. A missing target with a COMPLETE tmp (its _SUCCESS
    * commit marker exists) promotes the tmp; a missing target with an
    * incomplete tmp restores the graveyarded previous version. */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    // Path(path).getFileSystem resolves scheme-less paths against
    // fs.defaultFS — the SAME resolution spark.read.parquet applies to
    // the string — so the existence check and the read can never
    // disagree about which filesystem a path lives on. (Hardcoding a
    // file: prefix here would re-introduce the local-only bug for
    // scheme-less paths on a defaultFS=hdfs cluster.)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val (tmp, old) = (swapTmp(p), swapOld(p))
      if (fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
        // crashed after graveyarding the old version, before promoting
        // the fully-committed new one: finish the swap
        if (!fs.rename(tmp, p)) sys.error(s"failed to heal swap of $p from $tmp")
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        // crashed mid-write (tmp incomplete): restore the old version
        fs.delete(tmp, true)
        if (!fs.rename(old, p)) sys.error(s"failed to heal swap of $p from $old")
      }
    }
    fs.exists(p)
  }

  /** Overwrite `path` with `df` even when `df`'s lineage reads `path`:
    * write to a sibling temp dir, then swap via FileSystem renames
    * (atomic moves on HDFS/local; on object stores a rename is a copy
    * but still correct). Public: the streaming merge sink
    * ([[graft.streaming.EventStreams.mergeSink]]) reuses it per batch.
    *
    * CRASH POSTURE: the target is never deleted before its replacement
    * is fully committed — the old version is renamed to a graveyard
    * sibling, the tmp is renamed into place, then the graveyard is
    * dropped. The target therefore never exists in a partial state, and
    * a crash in the vulnerable window (target absent) is repaired by
    * [[pathExists]]'s heal step on the next read/merge decision. A
    * transactional table format would make this one atomic commit; this
    * is the strongest sequence plain directories support. */
  def swapWrite(spark: SparkSession, df: DataFrame, path: String,
                partitionBy: Seq[String] = Nil): Unit = {
    // same defaultFS-aware resolution as pathExists (and as the write/
    // read below): no hand-built URIs, so paths with spaces or a
    // cluster defaultFS both resolve consistently
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (tmp, old) = (swapTmp(target), swapOld(target))
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp.toString)
    if (fs.exists(target)) {
      fs.delete(old, true) // stale graveyard from an interrupted cleanup
      if (!fs.rename(target, old))
        sys.error(s"failed to graveyard $target before swapping in $tmp")
    }
    if (!fs.rename(tmp, target))
      sys.error(s"failed to swap $tmp into place at $target")
    fs.delete(old, true)
  }
}
