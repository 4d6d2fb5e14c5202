package graft

import graft.sources.{BcbSource, CsvDialect, IbgeSource, JsonlDocs}

class SourcesSpec extends SparkSpec {

  test("BCB payload parses pt-BR values, drops unparseable dates") {
    val df = BcbSource.fromPayload(spark, fixtureText("bcb_payload.json"), 11L)
    val rows = df.orderBy("date").collect()
    assert(rows.length == 4) // the 99/99/2024 row is dropped
    assert(rows.map(_.getAs[Long]("series_id")).forall(_ == 11L))
    assert(rows.map(_.getAs[Double]("value")).toSeq == Seq(11.75, 11.75, 1234.56, 12.0))
  }

  test("empty BCB payload yields a typed empty frame") {
    val df = BcbSource.fromPayload(spark, fixtureText("bcb_empty.json"), 11L)
    assert(df.isEmpty)
    assert(df.schema.fieldNames.toSeq == Seq("series_id", "date", "value"))
  }

  test("BCB url reformats ISO params as dd/MM/yyyy (F6)") {
    val u = BcbSource.url(11, "2024-01-01", "2024-03-05")
    assert(u.contains("bcdata.sgs.11"))
    assert(u.contains("dataInicial=01/01/2024") && u.contains("dataFinal=05/03/2024"))
  }

  test("IBGE nested payload flattens regiao.nome, preserves accents") {
    val rows = IbgeSource.fromPayload(spark, fixtureText("ibge_ufs.json"))
      .orderBy("uf_id").collect()
    assert(rows.length == 6)
    val sp = rows.find(_.getAs[String]("uf_sigla") == "SP").get
    assert(sp.getAs[String]("uf_nome") == "São Paulo")
    assert(sp.getAs[String]("regiao_nome") == "Sudeste")
    assert(sp.getAs[Long]("uf_id") == 35L)
  }

  test("JsonlDocs reads a document corpus; corrupt lines are counted, not fatal") {
    val (good, corrupt) = JsonlDocs.readWithAudit(spark, fixture("docs.jsonl"))
    assert(corrupt == 1L, "exactly the broken line is corrupt")
    // count() prunes the scan — must not trip Spark's corrupt-column-only
    // restriction (the returned frame never references _corrupt)
    assert(good.count() == 4L)
    val rows = good.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.head.getAs[String]("text") == "spark engines process data fast")
    assert(good.columns.toSeq == Seq("doc_id", "text", "lang", "source"),
      "_corrupt is an ingestion concern, not part of the document schema")
  }

  test("CsvDialect reads semicolon files and falls back to comma") {
    val semi = CsvDialect.read(spark, fixture("anp_semicolon.csv"))
    assert(semi.columns.length == 8 && semi.count() == 12)
    val comma = CsvDialect.read(spark, fixture("anp_comma.csv"))
    assert(comma.columns.length == 8 && comma.count() == 3)
  }

  test("missing CSV raises an actionable error") {
    val e = intercept[java.io.FileNotFoundException] {
      CsvDialect.read(spark, "/nonexistent/anp.csv")
    }
    assert(e.getMessage.contains("/nonexistent/anp.csv"))
  }

  test("CsvDialect existence check is filesystem-aware, not local-only") {
    // a scheme-qualified path to an EXISTING file must read (a
    // java.nio Files.exists check would see the URI as a relative local
    // path and wrongly raise "not found")...
    val semi = CsvDialect.read(spark, "file://" + fixture("anp_semicolon.csv"))
    assert(semi.columns.length == 8 && semi.count() == 12)
    // ...while a scheme-qualified MISSING path still gets the actionable
    // error rather than a raw Spark analysis failure
    val e = intercept[java.io.FileNotFoundException] {
      CsvDialect.read(spark, "file:///nonexistent/anp.csv")
    }
    assert(e.getMessage.contains("file:///nonexistent/anp.csv"))
  }
}
