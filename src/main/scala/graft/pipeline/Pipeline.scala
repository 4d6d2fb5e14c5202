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
      anpSilver: DataFrame,
      ufDim: DataFrame,
      gold: Map[String, DataFrame],
      summary: String)

  def run(spark: SparkSession, fetcher: JsonFetcher, cfg: RunConfig,
          rootDir: String, seriesCsvPath: String,
          statePath: Option[String] = None): Result = {

    val state = statePath.map(IncrementalState.fromFile).getOrElse(IncrementalState.empty)

    // ---------- EXTRACT (main.py:31-50) ----------
    // Series control table: enabled flag is case-insensitive {"true","1","yes"} (P3).
    val seriesCfg = spark.read.option("header", "true").csv(seriesCsvPath)
      .filter(lower(col("enabled")).isin("true", "1", "yes"))
      .select(col("series_id").cast("long"), col("series_name"))
      .collect() // control table: O(series), driver-side by design
    val bcbFrames = seriesCfg.toSeq.map { row =>
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
    val silverPath = s"$rootDir/silver/bcb_sgs.parquet"
    val merged = state.bcbLastDate match {
      case Some(_) if java.nio.file.Files.exists(java.nio.file.Paths.get(silverPath)) =>
        spark.read.parquet(silverPath).unionByName(bcbIncrement)
      case _ => bcbIncrement
    }
    swapWrite(spark, merged, silverPath)
    val bcbSilver = spark.read.parquet(silverPath)

    val ufDim = IbgeSource.fetch(spark, fetcher)
    ufDim.write.mode("overwrite").parquet(s"$rootDir/bronze/ibge_uf_dim.parquet")

    val anpRaw = CsvDialect.read(spark, cfg.anpBronzeFile)
    anpRaw.write.mode("overwrite").parquet(s"$rootDir/bronze/anp_raw.parquet")

    // ---------- TRANSFORM (main.py:53-56) ----------
    val anpSilver = Silver.enrichUf(Silver.toSilverAnp(anpRaw), ufDim)

    // ---------- GOLD (main.py:59) ----------
    val gold = Silver.buildGold(bcbSilver, anpSilver)

    // ---------- LOAD (main.py:62-76) ----------
    // (bcb silver already written by the merge swap above)
    anpSilver.write.mode("overwrite").parquet(s"$rootDir/silver/anp_prices.parquet")
    ufDim.write.mode("overwrite").parquet(s"$rootDir/silver/dim_uf.parquet")

    gold("bcb_monthly").write.mode("overwrite")
      .partitionBy("series_id").parquet(s"$rootDir/gold/bcb_monthly")
    gold("anp_monthly").write.mode("overwrite")
      .partitionBy("uf_sigla").parquet(s"$rootDir/gold/anp_monthly")

    val wh = if (Paths.get(cfg.warehousePath).isAbsolute) cfg.warehousePath
             else s"$rootDir/${cfg.warehousePath}"
    Seq(
      "silver_bcb_sgs" -> bcbSilver, "silver_anp_prices" -> anpSilver,
      "dim_uf" -> ufDim, "gold_bcb_monthly" -> gold("bcb_monthly"),
      "gold_anp_monthly" -> gold("anp_monthly")
    ).foreach { case (t, df) => df.write.mode("overwrite").parquet(s"$wh/$t") }

    // ---------- SUMMARY (main.py:79-86) ----------
    val summary = Summary.build(bcbSilver, anpSilver)
    Files.createDirectories(Paths.get(s"$rootDir/gold"))
    Files.write(Paths.get(s"$rootDir/gold/summary.md"),
      summary.getBytes(StandardCharsets.UTF_8))

    // ---------- STATE ----------
    statePath.foreach { p =>
      val maxDate = bcbSilver.agg(max(col("date"))).collect().head
      val newMark = Option(maxDate.get(0))
        .map(_.asInstanceOf[java.sql.Timestamp].toLocalDateTime.toLocalDate.toString)
        .orElse(state.bcbLastDate)
      IncrementalState.write(p, state.copy(
        bcbLastDate = newMark,
        ibgeLastSync = Some(java.time.LocalDate.now().toString)))
    }

    Result(bcbSilver, bcbIncrement, anpSilver, ufDim, gold, summary)
  }

  /** Overwrite `path` with `df` even when `df`'s lineage reads `path`:
    * write to a sibling temp dir, then atomically swap via FileSystem
    * rename (works on HDFS/local; on object stores rename is a copy but
    * still correct). */
  private def swapWrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    // resolve scheme-less paths to absolute file: URIs so relative
    // rootDirs don't produce malformed URIs
    val abs = if (path.contains("://")) path
              else "file:" + new java.io.File(path).getAbsolutePath
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(abs), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(abs)
    val tmp = new org.apache.hadoop.fs.Path(abs + ".__swap_tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      sys.error(s"failed to swap $tmp into place at $target")
  }
}
