package graft.silver

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed views of the silver contracts (SURVEY §1.1: `Dataset[T]` with
  * case-class Encoders where type safety helps — the silver schemas are
  * stable, so downstream transform code can be compile-time checked
  * while the storage layer stays columnar parquet; Encoders keep rows in
  * Tungsten format, so this costs no boxing until fields are accessed).
  */
object Typed {

  /** One BCB/SGS observation (transform.py:14 contract). */
  final case class BcbObs(series_id: Long, series_name: String,
                          date: Timestamp, value: Double)

  /** One standardized ANP price row (transform.py:74-81 contract). */
  final case class AnpPrice(uf_sigla: String, product: String,
                            date_ref: Timestamp, price: Double)

  def bcb(silver: DataFrame): Dataset[BcbObs] = {
    import silver.sparkSession.implicits._
    // the typed view exposes fully-parsed observations: silver only
    // drops null dates, so a coerced-null value would crash primitive
    // Double deserialization — filter it here
    silver.filter(silver("value").isNotNull)
      .select("series_id", "series_name", "date", "value").as[BcbObs]
  }

  def anp(silver: DataFrame): Dataset[AnpPrice] = {
    import silver.sparkSession.implicits._
    silver.select("uf_sigla", "product", "date_ref", "price").as[AnpPrice]
  }
}
