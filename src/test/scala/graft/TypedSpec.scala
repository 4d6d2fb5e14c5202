package graft

import graft.silver.{Silver, Typed}
import graft.sources.{BcbSource, CsvDialect}

class TypedSpec extends SparkSpec {

  test("typed BCB view round-trips the silver contract with compile-time fields") {
    val silver = Silver.toSilverBcb(
      BcbSource.fromPayload(spark, fixtureText("bcb_payload.json"), 11L), "selic_sgs_11")
    val ds = Typed.bcb(silver)
    val latest = ds.collect().maxBy(_.date.getTime)
    assert(latest.value == 12.0 && latest.series_name == "selic_sgs_11")
  }

  test("typed ANP view exposes the standardized price rows") {
    val ds = Typed.anp(Silver.toSilverAnp(
      CsvDialect.read(spark, fixture("anp_semicolon.csv"))))
    assert(ds.filter(_.uf_sigla == "SP").collect().forall(_.price > 0))
    assert(ds.count() == 8)
  }
}
