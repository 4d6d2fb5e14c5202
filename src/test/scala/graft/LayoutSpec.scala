package graft

import java.nio.file.Files

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("hive-partitioned layout prunes partitions at the scan (S8 scale posture)") {
    // The gold tiers are partitionBy(series_id / uf_sigla); at 100 TB a
    // key-filtered read must touch ONE partition directory, not scan
    // everything and filter. Assert the predicate lands in the scan's
    // PartitionFilters (partition pruning), not a post-scan Filter.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-prune").toString
    (1L to 1000L).map(i => (i % 10, i, i * 1.5)).toDF("series_id", "k", "v")
      .write.partitionBy("series_id").parquet(s"$dir/gold")
    val read = spark.read.parquet(s"$dir/gold").filter(col("series_id") === 3)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    // the predicate must be INSIDE the PartitionFilters list — the key
    // alone always appears (empty list + output attributes), so match
    // the bracket contents
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pf.contains("series_id"),
      s"partition predicate not pruned at scan (PartitionFilters: [$pf]):\n$scan")
    assert(read.count() == 100)
  }

  test("dynamic partition pruning: a filtered dim join skips fact partitions at runtime") {
    // load.py:12-15's layout promise, runtime half: when the selective
    // predicate sits on the DIM (not the fact's partition column),
    // static pruning can't help — the fact scan must take a
    // `dynamicpruning` subquery filter fed by the dim's broadcast, so
    // at 100 TB a region-filtered join reads ~5/25 of the fact's
    // partition directories instead of all of them.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    val fact = (1L to 5000L).map(i => (i % 25, i, i * 2.0))
      .toDF("nation_key", "k", "v")
    fact.write.partitionBy("nation_key").parquet(s"$dir/fact")
    val dim = Tables.nation(spark, "/root/testdata/sf0.001")
      .select(col("n_nationkey").cast("long").as("nation_key"),
        col("n_regionkey"), col("n_name"))

    val joined = spark.read.parquet(s"$dir/fact")
      .join(broadcast(dim.filter(col("n_regionkey") === 2)), Seq("nation_key"))
    val scans = joined.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val factScan = scans.find(_.contains("PartitionFilters")).getOrElse("")
    assert(factScan.contains("dynamicpruning"),
      s"fact scan carries no dynamicpruning filter:\n${scans.mkString("\n")}")

    // and the pruned plan still computes exactly the plain join
    val want = fact.join(dim.filter(col("n_regionkey") === 2), Seq("nation_key")).count()
    assert(joined.count() == want)
  }

  test("runtime bloom filter: a selective dim filter prunes fact rows before the shuffle") {
    // The shuffle-join sibling of DPP: when the fact side is NOT
    // hive-partitioned on the join key, Spark's InjectRuntimeFilter can
    // still build a bloom filter from the filtered dim side and apply
    // it to fact rows BEFORE the join exchange — at 100 TB that is the
    // difference between shuffling the whole fact table and shuffling
    // the ~1/5 that can possibly match. Thresholds are sized for
    // clusters, so pin them down to make injection observable at test
    // scale; the assertion is the plan shape, which is scale-free.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom").toString
    (1L to 5000L).map(i => (i % 25, i, i * 2.0)).toDF("nation_key", "k", "v")
      .write.parquet(s"$dir/fact")
    Tables.nation(spark, "/root/testdata/sf0.001")
      .select(col("n_nationkey").cast("long").as("nation_key"),
        col("n_regionkey"), col("n_name"))
      .write.parquet(s"$dir/dim")
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      // force a shuffle join (no broadcast; broadcast sides get DPP-style
      // reuse instead) and let the tiny test tables qualify
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("n_regionkey") === 2)
      val joined = fact.join(dim, Seq("nation_key"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected on the fact side:\n$plan")
      // and the filtered plan computes exactly the plain join
      val keys = dim.select("nation_key").as[Long].collect().toSet
      val want = (1L to 5000L).count(i => keys.contains(i % 25))
      assert(want > 0 && joined.count() == want)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE skew-join splitting activates on a 95%-hot-key shuffle join") {
    // Relational.saltedJoin's scaladoc routes duplicate-heavy facts to
    // AQE's runtime skew splitting (it splits by partition SIZE, not
    // row content) — prove that path actually engages: a 95%-hot-key
    // sort-merge join must come out of AQE with its skewed partition
    // split (the SMJ marked skew=true). Thresholds are cluster-sized,
    // so pin them down to test scale; the plan shape is the contract.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

      val fact = (1L to 200000L)
        .map(i => (if (i % 20 != 0) 0L else i % 97, i, s"payload-$i"))
        .toDF("key", "id", "payload")
      val dim = (0L until 97L).map(k => (k, s"dim-$k")).toDF("key", "label")
      val joined = fact.join(dim, Seq("key"))
      // materialize THIS queryExecution (count() would build its own)
      // so AQE finalizes the inspected plan
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("same-key bucketed tables join with no shuffle exchange") {
    val dir = Files.createTempDirectory("graft-buckets").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 4, s"$dir/b_orders")
    Layout.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4, s"$dir/b_lineitem")

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the exchange question is real
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = Layout.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and it still computes the right thing
      val n = joined.count()
      val want = orders.join(lineitem, "o_orderkey").count()
      assert(n == want)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("dual-bucketed edge mart makes the wedge self-join shuffle-free") {
    // Iterative graph queries (q87/q112/q156/q172) re-join the edge
    // list every round; on a cluster the per-round exchange IS the
    // round cost. The graph-mart answer: persist the oriented edges
    // TWICE, bucketed by destination and by source — the wedge join
    // (left.t = right.s) then reads two bucket-aligned scans and
    // needs no exchange at all, any number of rounds.
    val dir = Files.createTempDirectory("graft-graph-mart").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("o"),
        org.apache.spark.sql.functions.col("l_partkey").as("p"))
    val edges = graft.operators.GraphOps.coOccurrencePairs(li, "o", "p")
      .withColumnRenamed("u", "s").withColumnRenamed("v", "t")

    Layout.writeBucketed(edges, "e_by_t", "t", 4, s"$dir/e_by_t")
    Layout.writeBucketed(edges, "e_by_s", "s", 4, s"$dir/e_by_s")

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val left = spark.table("e_by_t")
        .select(org.apache.spark.sql.functions.col("s").as("a"),
          org.apache.spark.sql.functions.col("t").as("m"))
      val right = spark.table("e_by_s")
        .select(org.apache.spark.sql.functions.col("s").as("m"),
          org.apache.spark.sql.functions.col("t").as("c"))
      val wedges = left.join(right, "m")
      val plan = wedges.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"dual-bucketed wedge join must not shuffle:\n$plan")

      // and it enumerates exactly the unbucketed wedge set
      val want = edges.select(org.apache.spark.sql.functions.col("s").as("a"),
          org.apache.spark.sql.functions.col("t").as("m"))
        .join(edges.select(org.apache.spark.sql.functions.col("s").as("m"),
          org.apache.spark.sql.functions.col("t").as("c")), "m")
        .count()
      assert(wedges.count() == want && want > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS e_by_t")
      spark.sql("DROP TABLE IF EXISTS e_by_s")
    }
  }

  test("ensureBucketedTable revalidates a stale catalog bucket spec (ADVICE r9)") {
    // After an out-of-process rebuild changed the bucket count, a
    // long-lived serving session still holds the OLD spec — planning
    // with it over the new files makes bucket pruning select the wrong
    // buckets and silently return wrong rows. ensureBucketedTable must
    // compare the registered spec against the expected (meta-sidecar)
    // values and drop + recreate on mismatch, instead of trusting
    // whatever exists.
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-revalidate").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"))
    Layout.writeBucketed(orders, "b_reval", "o_orderkey", 8, s"$dir/t")
    try {
      // out-of-process rebuild: same path, 4 buckets, via a throwaway
      // catalog entry (this session's b_reval spec still says 8)
      Layout.writeBucketed(orders, "b_reval__other", "o_orderkey", 4, s"$dir/t")
      spark.sql("DROP TABLE IF EXISTS b_reval__other")
      def numBuckets = spark.sql("DESCRIBE FORMATTED b_reval").collect()
        .find(_.getString(0) == "Num Buckets").map(_.getString(1).trim)
      assert(numBuckets.contains("8"), "precondition: stale spec registered")
      // matching spec: validation is a no-op (entry kept)
      Layout.ensureBucketedTable(spark, "b_reval", "o_orderkey", 8, s"$dir/t")
      assert(numBuckets.contains("8"))
      // mismatched count: entry must be dropped and recreated at 4
      Layout.ensureBucketedTable(spark, "b_reval", "o_orderkey", 4, s"$dir/t")
      assert(numBuckets.contains("4"),
        "stale bucket spec must be replaced by the expected one")
      assert(spark.table("b_reval").count() == orders.count())
      // mismatched KEY likewise
      Layout.ensureBucketedTable(spark, "b_reval", "o_custkey", 4, s"$dir/t")
      val keyCols = spark.sql("DESCRIBE FORMATTED b_reval").collect()
        .find(_.getString(0) == "Bucket Columns").map(_.getString(1))
      assert(keyCols.exists(_.contains("o_custkey")))
    } finally spark.sql("DROP TABLE IF EXISTS b_reval")
  }

  test("compactionPlan bin-packs a file listing toward the target size") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val listing = Seq(
      ("f01", 60L), ("f02", 60L), ("f03", 60L),   // starts 0,60,120 -> bin 0
      ("f04", 200L),                               // oversized: spills past bin 1
      ("f05", 10L), ("f06", 10L), ("f07", 10L))    // tail bin
      .toDF("file", "bytes")
    val plan = Layout.compactionPlan(listing, "file", "bytes", targetBytes = 128L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // cumulative starts: f01@0,f02@60,f03@120,f04@180,f05@380,f06@390,f07@400
    assert(plan == Map(
      "f01" -> 0L, "f02" -> 0L, "f03" -> 0L,
      "f04" -> 1L, "f05" -> 2L, "f06" -> 3L, "f07" -> 3L))
    // invariants: bins are contiguous in file order and non-decreasing
    val bins = Layout.compactionPlan(listing, "file", "bytes", 128L)
      .orderBy(col("file")).collect().map(_.getLong(2)).toSeq
    assert(bins == bins.sorted)
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(listing, "file", "bytes", 0L)
    }
  }
}
