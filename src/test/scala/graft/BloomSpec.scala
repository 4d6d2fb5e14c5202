package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val members = (0 until 300).map(i => s"member-$i")
  private val strangers = (0 until 300).map(i => s"stranger-$i")

  test("no false negatives: every member probes true, for any layout") {
    val keys = members.toDF("k").repartition(7)
    val bloom = Bloom.build(keys, "k", words = 16)
    val probed = Bloom.probe(keys, bloom, "k", 16, "maybe")
    assert(probed.filter(!col("maybe")).count() == 0)
  }

  test("sketch is bounded by the word count and masks stay positive") {
    val bloom = Bloom.build(members.toDF("k"), "k", words = 16)
    assert(bloom.count() <= 16)
    assert(bloom.filter(col("bits") < 0L).count() == 0,
      "60-bit masks must never set the sign bit")
  }

  test("sketch is layout-deterministic: 1 vs 13 partitions, same words") {
    val a = Bloom.build(members.toDF("k").coalesce(1), "k", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Bloom.build(members.toDF("k").repartition(13), "k", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("false positives exist at an undersized width but stay a minority") {
    // 300 members x 2 hashes into 16*60 = 960 bits -> classic rate
    // (1-e^(-0.625))^2 ~ 21%; the point is they are measurable and
    // deterministic, not that they are rare.
    val bloom = Bloom.build(members.toDF("k"), "k", 16)
    val probed = Bloom.probe(strangers.toDF("k"), bloom, "k", 16, "maybe")
    val fp = probed.filter(col("maybe")).count()
    assert(fp > 0, "undersized sketch must produce false positives")
    assert(fp < strangers.size / 2, s"FP rate out of control: $fp/300")
    val fp2 = Bloom.probe(strangers.toDF("k"), bloom, "k", 16, "maybe")
      .filter(col("maybe")).count()
    assert(fp == fp2, "FP set must be deterministic")
  }

  test("a wide-enough sketch clears the stranger set") {
    val bloom = Bloom.build(members.toDF("k"), "k", words = 4096)
    val probed = Bloom.probe(strangers.toDF("k"), bloom, "k", 4096, "maybe")
    assert(probed.filter(col("maybe")).count() == 0,
      "246k bits for 300 keys should produce no FPs on this probe set")
  }

  test("probing an empty sketch is all-false, not an error") {
    val empty = Bloom.build(members.toDF("k").filter(lit(false)), "k", 16)
    val probed = Bloom.probe(strangers.toDF("k"), empty, "k", 16, "maybe")
    assert(probed.filter(col("maybe")).count() == 0)
  }
}
