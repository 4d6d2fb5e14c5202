package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Distributed Bloom filter as a RELATION: the filter is a table of
  * (word, bits) rows — `words` 60-bit words, each the `bit_or` of every
  * member key's masks — so building is one map-side-combinable
  * aggregate over the member set and probing is an equi-join on the
  * word index. Membership sketches are how a pipeline decontaminates
  * an incoming batch against a multi-petabyte history WITHOUT joining
  * the history itself: the sketch is O(words), the history is scanned
  * once to build it, and probes touch [[K]] words per key.
  *
  * No false negatives (a member's bits are always set); false positives
  * at the classic (1 - e^(-K·n/m))^K rate — DETERMINISTIC here because
  * the hashes are md5-derived and the word bit_or is order-free, so the
  * same inputs give bit-identical sketches on any layout or engine
  * (the DuckDB oracle replays build + probe verbatim; q82 measures the
  * FP count against the exact join).
  *
  * 60 usable bits per word (not 64): masks stay positive longs on both
  * engines — no sign-bit pitfalls from `1 << 63` cross-engine.
  */
object Bloom {

  /** Hash functions per key. */
  val K = 2

  /** Usable bits per word (see class doc). */
  val BitsPerWord = 60L

  private def shl(value: Column, amount: Column): Column =
    ColumnBridge.column(ShiftLeft(
      ColumnBridge.expression(value), ColumnBridge.expression(amount)))

  /** (word index, bit mask) of hash j of `key` in an m = words*60-bit
    * filter. DuckDB twin: bp = hash60('bloomj|' || key) % (words*60);
    * word = bp // 60; mask = CAST(1 AS BIGINT) << CAST(bp % 60 AS INT). */
  def wordAndMask(key: Column, j: Int, words: Int): (Column, Column) = {
    val bp = pmod(Kmv.hash60(concat(lit(s"bloom$j|"), key)),
      lit(words * BitsPerWord))
    (Sampling.ldiv(bp, lit(BitsPerWord)),
      shl(lit(1L), pmod(bp, lit(BitsPerWord)).cast("int")))
  }

  /** Build the (word, bits) sketch over `keys(keyCol)`: K (word, mask)
    * rows per key, bit_or-combined per word — after map-side combine
    * the only exchange moves at most `words` rows per task. */
  def build(keys: DataFrame, keyCol: String, words: Int): DataFrame =
    (0 until K).map { j =>
      val (w, m) = wordAndMask(col(keyCol), j, words)
      keys.select(w.as("word"), m.as("mask"))
    }.reduce(_ unionByName _)
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("bits"))

  /** Flag each probe row with `maybeCol`: true iff ALL K of its bits
    * are set in the sketch. `bloom` is words-sized, so it broadcasts —
    * the probe side never shuffles. */
  def probe(probes: DataFrame, bloom: DataFrame, keyCol: String,
            words: Int, maybeCol: String): DataFrame = {
    val joined = (0 until K).foldLeft(probes) { (df, j) =>
      val (w, m) = wordAndMask(col(keyCol), j, words)
      df.withColumn(s"__w$j", w).withColumn(s"__m$j", m)
        .join(broadcast(bloom.select(col("word").as(s"__w$j"),
          col("bits").as(s"__b$j"))), Seq(s"__w$j"), "left")
    }
    val allSet = (0 until K).map { j =>
      coalesce(col(s"__b$j").bitwiseAND(col(s"__m$j")) === col(s"__m$j"),
        lit(false))
    }.reduce(_ && _)
    (0 until K).flatMap(j => Seq(s"__w$j", s"__m$j", s"__b$j"))
      .foldLeft(joined.withColumn(maybeCol, allSet))((df, c) => df.drop(c))
  }
}
