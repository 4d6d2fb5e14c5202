package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test SparkSession (one per forked test JVM). Mirrors the
  * harness session config: UTC, ANSI off (pandas coerce parity),
  * nanos-as-long parquet reads. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
  def fixtureText(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture(name))), java.nio.charset.StandardCharsets.UTF_8)
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
