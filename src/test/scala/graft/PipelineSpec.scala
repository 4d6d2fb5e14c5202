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
    assert(s1.bcbLastDate.contains("2024-02-29"))
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
    assert(IncrementalState.fromFile(statePath).bcbLastDate.contains("2024-02-29"))
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
