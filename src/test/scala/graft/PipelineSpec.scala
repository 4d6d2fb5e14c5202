package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.{IncrementalState, Pipeline, RunConfig, Summary}
import graft.silver.Silver
import graft.sources.{BcbSource, FixtureFetcher, IbgeSource}

class PipelineSpec extends SparkSpec {

  private def fetcher = FixtureFetcher(Map(
    BcbSource.url(11, "2024-01-01", "2024-03-01") -> fixtureText("bcb_payload.json"),
    IbgeSource.Url -> fixtureText("ibge_ufs.json")))

  private def cfg = RunConfig(
    startDate = "2024-01-01", endDate = "2024-03-01",
    anpBronzeFile = fixture("anp_semicolon.csv"), warehousePath = "warehouse")

  private val GoldenSummary =
    """BCB/SGS (série 11) - selic_sgs_11: último valor em 2024-02-29 = 12.00.
      |Variação vs mês anterior: +0.25 (variação absoluta).
      |ANP - Destaques de 2024-02-01:
      |- AM / DIESEL S10: variação média +0.74 (vs mês anterior).
      |- SP / GASOLINA: variação média +0.50 (vs mês anterior).
      |- RJ / ETANOL: variação média -0.01 (vs mês anterior).""".stripMargin

  test("end-to-end medallion run matches the golden summary and layouts") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val res = Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"))

    assert(res.summary == GoldenSummary)
    assert(Files.readString(Paths.get(s"$root/gold/summary.md")) == GoldenSummary)

    // gold is hive-partitioned (S8)
    assert(Files.exists(Paths.get(s"$root/gold/bcb_monthly/series_id=11")))
    assert(Files.exists(Paths.get(s"$root/gold/anp_monthly/uf_sigla=SP")))
    // warehouse tables are full-replace parquet dirs (S9)
    assert(Files.exists(Paths.get(s"$root/warehouse/gold_bcb_monthly")))

    // gold values: Jan avg 11.75/last 11.75; Feb avg (1234.56+12)/2=623.28/last 12.0
    val bm = res.gold("bcb_monthly").orderBy("month").collect()
    assert(bm.map(_.getAs[Double]("avg_value")).toSeq == Seq(11.75, 623.28))
    assert(bm.map(_.getAs[Double]("last_value")).toSeq == Seq(11.75, 12.0))

    // dedup kept one of the duplicate (15/01, SP, GASOLINA) rows; silver
    // row count: 8 valid raw rows + dedup -1 = 8 kept out of 12 raw
    assert(res.anpSilver.count() == 8)
    // uf enrich is a left join on the 6-row dim
    val sp = res.anpSilver.filter(col("uf_sigla") === "SP").select("uf_nome").first()
    assert(sp.getString(0) == "São Paulo")
  }

  test("re-running is idempotent (full-replace semantics)") {
    val root = Files.createTempDirectory("graft-idem").toString
    val r1 = Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"))
    val r2 = Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"))
    assert(r1.summary == r2.summary)
    assert(spark.read.parquet(s"$root/silver/anp_prices.parquet").count() == 8)
  }

  test("incremental state advances, filters the increment, and preserves history") {
    val root = Files.createTempDirectory("graft-incr").toString
    val statePath = s"$root/state/state.json"
    val r1 = Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"), Some(statePath))
    val s1 = IncrementalState.fromFile(statePath)
    // marks are FULL timestamps, not truncated dates (same-day rows with
    // intra-day time components must not be re-admitted)
    assert(s1.bcbLastDate.contains("2024-02-29 00:00:00.000000"))
    val fullRows = r1.bcbSilver.count()
    assert(fullRows == 4)
    // second run: the increment is empty (nothing past the mark), but
    // every downstream tier must still hold the full history — a
    // full-replace of just the increment would destroy it.
    val r2 = Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"), Some(statePath))
    assert(r2.bcbIncrement.isEmpty)
    assert(r2.bcbSilver.count() == fullRows)
    assert(spark.read.parquet(s"$root/silver/bcb_sgs.parquet").count() == fullRows)
    assert(spark.read.parquet(s"$root/warehouse/gold_bcb_monthly").count() == 2)
    assert(r2.summary == r1.summary) // summary still reports the history
    // the mark survives an empty increment
    assert(IncrementalState.fromFile(statePath).bcbLastDate.contains("2024-02-29 00:00:00.000000"))
  }

  test("ANP incremental: mark pushdown loads only new periods and merges history") {
    val root = Files.createTempDirectory("graft-anp-incr").toString
    val statePath = s"$root/state/state.json"
    val r1 = Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"), Some(statePath))
    assert(r1.anpSilver.count() == 8)
    assert(IncrementalState.fromFile(statePath)
      .anpLastPeriod.contains("2024-02-20 00:00:00.000000"))
    // the CSV grows by two March rows; only those pass the mark
    val cfg2 = cfg.copy(anpBronzeFile = fixture("anp_semicolon_v2.csv"))
    val r2 = Pipeline.run(spark, fetcher, cfg2, root, fixture("bcb_series.csv"), Some(statePath))
    assert(r2.anpIncrement.count() == 2)
    assert(r2.anpSilver.count() == 10)
    assert(spark.read.parquet(s"$root/silver/anp_prices.parquet").count() == 10)
    assert(IncrementalState.fromFile(statePath)
      .anpLastPeriod.contains("2024-03-12 00:00:00.000000"))
    // third run on the unchanged CSV: empty increment, history intact
    val r3 = Pipeline.run(spark, fetcher, cfg2, root, fixture("bcb_series.csv"), Some(statePath))
    assert(r3.anpIncrement.isEmpty)
    assert(r3.anpSilver.count() == 10)
  }

  test("ANP revision semantics: incremental skips old-period revisions; full reprocess recovers them") {
    // The documented high-water-mark trade (Pipeline.scala TRANSFORM
    // comment): a revised row at date_ref <= mark is invisible to
    // incremental runs, and a stateless run (the reference's own
    // full-reprocess behavior) picks it up.
    val root = Files.createTempDirectory("graft-anp-rev").toString
    val statePath = s"$root/state/state.json"
    Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"), Some(statePath))
    def amDiesel(): Double = spark.read.parquet(s"$root/silver/anp_prices.parquet")
      .filter(col("uf_sigla") === "AM" && col("date_ref") === lit("2024-02-15").cast("timestamp"))
      .first().getAs[Double]("price")
    assert(amDiesel() == 6.74)
    // revised CSV: the 15/02 AM DIESEL price changes 6,74 -> 6,80
    val revised = Paths.get(root, "anp_revised.csv")
    Files.writeString(revised,
      fixtureText("anp_semicolon.csv").replace("15/02/2024;6,74", "15/02/2024;6,80"))
    val cfgRev = cfg.copy(anpBronzeFile = revised.toString)
    Pipeline.run(spark, fetcher, cfgRev, root, fixture("bcb_series.csv"), Some(statePath))
    assert(amDiesel() == 6.74, "incremental run must not see the old-period revision")
    Pipeline.run(spark, fetcher, cfgRev, root, fixture("bcb_series.csv"))
    assert(amDiesel() == 6.80, "stateless full reprocess must pick up the revision")
  }

  test("ibge_last_sync skips the dim refetch when synced today; force refetches") {
    val root = Files.createTempDirectory("graft-ibge-sync").toString
    val statePath = s"$root/state/state.json"
    Pipeline.run(spark, fetcher, cfg, root, fixture("bcb_series.csv"), Some(statePath))
    assert(IncrementalState.fromFile(statePath)
      .ibgeLastSync.contains(java.time.LocalDate.now().toString))
    // a fetcher WITHOUT an IBGE fixture: the synced-today skip means the
    // dim endpoint is never consulted and bronze serves the dimension
    val noIbge = FixtureFetcher(Map(
      BcbSource.url(11, "2024-01-01", "2024-03-01") -> fixtureText("bcb_payload.json")))
    val r2 = Pipeline.run(spark, noIbge, cfg, root, fixture("bcb_series.csv"), Some(statePath))
    assert(r2.ufDim.count() == 6)
    assert(r2.ufDim.filter(col("uf_sigla") === "SP").first()
      .getAs[String]("uf_nome") == "São Paulo")
    // forceDimRefresh overrides the freshness skip -> fetcher consulted
    val e = intercept[RuntimeException] {
      Pipeline.run(spark, noIbge, cfg, root, fixture("bcb_series.csv"),
        Some(statePath), forceDimRefresh = true)
    }
    assert(e.getMessage.contains("no fixture"))
  }

  test("per-series fetch is parallel-safe: 12 series land correct bronze + silver") {
    // 12 enabled series through the bounded fetch pool — every series
    // must land its own bronze file and contribute its rows to silver,
    // regardless of completion order.
    val ids = 101L to 112L
    val payloads = ids.map(id =>
      BcbSource.url(id, "2024-01-01", "2024-03-01") -> fixtureText("bcb_payload.json")).toMap +
      (IbgeSource.Url -> fixtureText("ibge_ufs.json"))
    val root = Files.createTempDirectory("graft-par").toString
    val csv = Paths.get(root, "series.csv")
    Files.writeString(csv,
      "series_id,series_name,enabled\n" +
        ids.map(id => s"$id,series_$id,true\n").mkString)
    val res = Pipeline.run(spark, FixtureFetcher(payloads), cfg, root, csv.toString)
    ids.foreach { id =>
      assert(Files.exists(Paths.get(s"$root/bronze/bcb_sgs_$id.parquet")), s"bronze $id missing")
    }
    // every series parses the same fixture payload, so per-series silver
    // row counts must all be equal (a lost/duplicated fetch would skew one)
    val perSeries = res.bcbSilver.groupBy("series_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSeries.keySet == ids.toSet)
    assert(perSeries.values.toSet.size == 1, s"uneven per-series rows: $perSeries")
  }

  test("a swap interrupted between renames self-heals on the next pathExists") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-heal").toString
    val table = s"$root/t.parquet"
    val target = new org.apache.hadoop.fs.Path(table)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, "t.parquet.__swap_tmp")
    val old = new org.apache.hadoop.fs.Path(root, "t.parquet.__swap_old")
    def readKeys() = spark.read.parquet(table).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq

    Pipeline.swapWrite(spark, Seq((1L, "a")).toDF("k", "v"), table)

    // crash AFTER the replacement fully committed to tmp and the old
    // version was graveyarded, BEFORE the tmp->target rename: the heal
    // must promote the committed tmp (v2 wins, graveyard dropped)
    Seq((2L, "b")).toDF("k", "v").write.parquet(tmp.toString)
    assert(fs.rename(target, old))
    assert(!fs.exists(target))
    assert(Pipeline.pathExists(spark, table), "heal must restore the table")
    assert(readKeys() == Seq(2L))
    assert(!fs.exists(old) && !fs.exists(tmp))

    // crash MID-WRITE: tmp exists but is uncommitted (no _SUCCESS) and
    // the old version is graveyarded: the heal must restore the old
    // version and drop the garbage tmp
    Seq((3L, "c")).toDF("k", "v").write.parquet(tmp.toString)
    fs.delete(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), false)
    assert(fs.rename(target, old))
    assert(Pipeline.pathExists(spark, table), "heal must restore the old version")
    assert(readKeys() == Seq(2L))
    assert(!fs.exists(old) && !fs.exists(tmp))
  }

  test("gold marts hash identically across different input partitionings") {
    // exactAvg's determinism contract: the same rows through ANY
    // partitioning/merge order produce bit-identical doubles. A float
    // avg() would pass the %.2f golden compare yet drift in raw bits.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (1L, "s", java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        math.round(rnd.nextDouble() * 1e5) / 100.0)
    }
    val base = rows.toDF("series_id", "series_name", "date", "value")
    val anp = Seq.empty[(String, String, java.sql.Timestamp, Double)]
      .toDF("uf_sigla", "product", "date_ref", "price")
    def hashOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      Silver.buildGold(df, anp)("bcb_monthly")
        .orderBy("month")
        .collect()
        .map(r => (java.lang.Double.doubleToRawLongBits(r.getAs[Double]("avg_value")),
          java.lang.Double.doubleToRawLongBits(r.getAs[Double]("last_value")))).toSeq
    val a = hashOf(base.repartition(13))
    val b = hashOf(base.repartition(3, col("date")))
    assert(a == b, "gold mart doubles drift across partitionings")
  }

  test("RunConfig parses the reference's config shape") {
    val c = RunConfig.fromFile(fixture("run_config.json"))
    assert(c.startDate == "2024-01-01" && c.endDate == "2024-03-01")
    assert(c.anpBronzeFile == "data/bronze/anp_precos.csv")
    assert(c.warehousePath == "data/macropulse.duckdb")
  }

  test("ANP variant price header resolves; missing product column errors") {
    val variant = graft.sources.CsvDialect.read(spark, fixture("anp_variant_price.csv"))
    val silver = Silver.toSilverAnp(variant)
    assert(silver.count() == 2)
    assert(silver.filter(col("uf_sigla") === "SP").first().getAs[Double]("price") == 5.89)

    val missing = graft.sources.CsvDialect.read(spark, fixture("anp_missing_product.csv"))
    val e = intercept[IllegalArgumentException](Silver.toSilverAnp(missing))
    assert(e.getMessage.contains("product"))
  }

  test("empty inputs produce the reference's fallback summary lines") {
    import spark.implicits._
    val emptyBcb = Seq.empty[(Long, String, java.sql.Timestamp, Double)]
      .toDF("series_id", "series_name", "date", "value")
    val emptyAnp = Seq.empty[(String, String, java.sql.Timestamp, Double)]
      .toDF("uf_sigla", "product", "date_ref", "price")
    val text = Summary.build(emptyBcb, emptyAnp)
    assert(text ==
      "BCB/SGS - sem dados para o período.\nANP - sem dados para o período.")
  }
}
