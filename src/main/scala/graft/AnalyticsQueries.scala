package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.operators.{GraphOps, Sampling, Selection}

/** Analytics tier (q116-q122): graph distances, sort-free exact
  * selection, reshape (pivot/unpivot), ntile segmentation, CDC snapshot
  * diff, and bounded-domain exact group quantiles — the operations a
  * warehouse user reaches for right after the q109-q112 structural tier.
  * All DuckDB-oracle-checked under the suite determinism contract
  * (integer-space money/distances, DATE outputs, total ORDER BY).
  */
object AnalyticsQueries {

  // --- q116: multi-hop shortest paths over the co-purchase graph --------
  // "How close is every part to the catalog's anchor part?" — the
  // supply-chain / recommendation reachability question. Edge weight is
  // CLOSENESS-inverted co-purchase multiplicity (maxm+1-m): strongly
  // co-purchased pairs are short hops. Spark runs GraphOps.ssspInt
  // (synchronous integer Bellman-Ford, one join+agg shuffle per round);
  // the oracle unrolls the same FIXED-R rounds as generated CTEs and
  // both report the converged flag, so an undersized R is observable,
  // not silent (the q76/q112 discipline). Output is the hop-distance
  // histogram — small and stable — plus a hops=-1 row for unreached
  // nodes (none when the graph is connected, but stated, not assumed).
  private val SsspRounds = 12

  private def ssspOracle: String = {
    val hp = GraphOps.HopPack
    val rounds = (0 until SsspRounds).map { i =>
      s"""r${i + 1} AS MATERIALIZED (
            SELECT node, min(key) AS key FROM (
              SELECT node, key FROM r$i
              UNION ALL
              SELECT e.t AS node, r.key + e.step AS key
              FROM r$i r JOIN e ON e.s = r.node)
            GROUP BY 1)"""
    }.mkString(",\n          ")
    val R = SsspRounds
    s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      und AS MATERIALIZED (
        SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS m
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
      mx AS (SELECT max(m) AS maxm FROM und),
      e AS MATERIALIZED (
        SELECT u AS s, v AS t, (maxm + 1 - m) * $hp + 1 AS step FROM und, mx
        UNION ALL
        SELECT v AS s, u AS t, (maxm + 1 - m) * $hp + 1 AS step FROM und, mx),
      r0 AS (SELECT min(u) AS node, CAST(0 AS BIGINT) AS key FROM und),
      $rounds,
      conv AS (SELECT
        (SELECT count(*) FROM r${R - 1}) = (SELECT count(*) FROM r$R) AND
        (SELECT COALESCE(sum(key), 0) FROM r${R - 1}) =
        (SELECT COALESCE(sum(key), 0) FROM r$R) AS converged),
      lab AS (SELECT node, key // $hp AS dist, key % $hp AS hops FROM r$R),
      hist AS (
        SELECT hops, CAST(count(*) AS BIGINT) AS n_nodes,
               min(dist) AS min_dist, max(dist) AS max_dist,
               CAST(sum(dist) AS BIGINT) AS sum_dist
        FROM lab GROUP BY 1),
      nodes AS (SELECT count(*) AS tot FROM
        (SELECT u AS nn FROM und UNION SELECT v AS nn FROM und) t),
      unreached AS (
        SELECT CAST(-1 AS BIGINT) AS hops,
               (SELECT tot FROM nodes) - (SELECT count(*) FROM lab) AS n_nodes,
               CAST(0 AS BIGINT) AS min_dist, CAST(0 AS BIGINT) AS max_dist,
               CAST(0 AS BIGINT) AS sum_dist)
      SELECT h.hops, h.n_nodes, h.min_dist, h.max_dist, h.sum_dist,
             conv.converged
      FROM (SELECT * FROM hist UNION ALL SELECT * FROM unreached) h, conv
      ORDER BY hops ASC"""
  }

  private val q116 = Q(
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      // per-order set aggregate + map-side pair explode, no self-join
      val und = GraphOps.coOccurrenceCounts(li, "o", "p")
        .localCheckpoint() // eager: read for weights, source, and node set
      val mx = und.agg(max(col("m")).as("maxm"))
      val wEdges = und.crossJoin(broadcast(mx)) // single-row broadcast
        .select(col("u"), col("v"), (col("maxm") + 1L - col("m")).as("w"))
      val edges = wEdges.unionByName(
        wEdges.select(col("v").as("u"), col("u").as("v"), col("w")))
      val sources = und.agg(min(col("u")).as("node")) // u < v ⇒ global min
      val (lab, conv) = GraphOps.ssspInt(edges, "u", "v", "w", sources,
        maxIter = SsspRounds)
      val hist = lab.groupBy(col("hops"))
        .agg(count(lit(1)).as("n_nodes"), min(col("dist")).as("min_dist"),
          max(col("dist")).as("max_dist"), sum(col("dist")).as("sum_dist"))
      val tot = und.select(explode(array(col("u"), col("v"))).as("nn"))
        .agg(countDistinct(col("nn")).as("tot"))
      val reached = lab.agg(count(lit(1)).as("r"))
      val unreachedRow = tot.crossJoin(reached)
        .select(lit(-1L).as("hops"), (col("tot") - col("r")).as("n_nodes"),
          lit(0L).as("min_dist"), lit(0L).as("max_dist"),
          lit(0L).as("sum_dist"))
      hist.unionByName(unreachedRow)
        .withColumn("converged", lit(conv))
        .orderBy(col("hops").asc)
    },
    Some(ssspOracle))

  // --- q117: exact global quantiles WITHOUT a global sort ---------------
  // The third point in the percentile design space (q36 buffers whole
  // groups, q66 sketches): EXACT selection by value-domain bisection —
  // O(log |domain|) cached-column COUNT passes, O(1) driver state, no
  // shuffle at all (operators/Selection.scala). This is the only shape
  // that answers "the exact 100 TB median" without sorting 100 TB.
  // Ranks use the lower-discrete convention ceil(p*n), mirrored
  // literally in the oracle's row_number arithmetic.
  private val q117 = Q(
    (spark, dir) => {
      val v = Tables.lineitem(spark, dir)
        .select(Exact.quantize(col("l_extendedprice")).as("cents"))
        .persist()
      try {
        val n = v.count()
        val ranks = Seq((1L, 4L), (1L, 2L), (3L, 4L), (99L, 100L))
          .map { case (pn, pd) => Selection.discreteRank(n, pn, pd) }
        // ONE multi-probe selection: all four ranks share every scan
        val got = Selection.kthSmallestMulti(v, col("cents"), ranks.distinct)
        val Seq(p25, p50, p75, p99) = ranks.map(got)
        val s = spark
        import s.implicits._
        Seq((n, p25, p50, p75, p99))
          .toDF("n", "p25_cents", "p50_cents", "p75_cents", "p99_cents")
      } finally v.unpersist()
    },
    Some("""
      WITH v AS (SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents
                 FROM lineitem),
      r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
                   count(*) OVER () AS n
            FROM v)
      SELECT max(n) AS n,
             max(CASE WHEN rn = GREATEST(1, (1 * n + 3) // 4) THEN cents END) AS p25_cents,
             max(CASE WHEN rn = GREATEST(1, (1 * n + 1) // 2) THEN cents END) AS p50_cents,
             max(CASE WHEN rn = GREATEST(1, (3 * n + 3) // 4) THEN cents END) AS p75_cents,
             max(CASE WHEN rn = GREATEST(1, (99 * n + 99) // 100) THEN cents END) AS p99_cents
      FROM r"""))

  // --- q118: PIVOT — monthly revenue by region as columns ---------------
  // The reporting reshape the reference's summary.md renders by hand.
  // Spark's groupBy().pivot() with an EXPLICIT value list — the list
  // keeps the plan a single hash aggregate (no extra distinct-values
  // job, a real scan at 100 TB) with one conditional-sum column per
  // region, exactly what the oracle states as CASE sums. Money stays in
  // integer cents (conditional Exact split-long sums).
  private val Regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  private def regionCol(r: String): String =
    r.toLowerCase.replace(' ', '_') + "_cents"

  /** Orders enriched with region name: one fact shuffle join to
    * customer, then broadcast nation/region (25 + 5 rows). */
  private def ordersWithRegion(spark: org.apache.spark.sql.SparkSession,
                               dir: String) = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("r_name"), Exact.quantize(col("o_totalprice")).as("cents"))
  }

  private def pivotOracleBase: String = s"""
      WITH base AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               r_name, CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey)"""

  private val q118 = Q(
    (spark, dir) => {
      val wide = ordersWithRegion(spark, dir)
        .groupBy(col("month"))
        .pivot("r_name", Regions)
        .agg(Exact.exactIntSum(col("cents")).cast("long"))
      wide.select(col("month") +:
          Regions.map(r => coalesce(col(s"`$r`"), lit(0L)).as(regionCol(r))): _*)
        .orderBy(col("month").asc)
    },
    Some(s"""$pivotOracleBase
      SELECT month, ${Regions.map(r =>
        s"COALESCE(CAST(sum(CASE WHEN r_name = '$r' THEN cents END) AS BIGINT), 0) AS ${regionCol(r)}")
        .mkString(",\n             ")}
      FROM base GROUP BY month
      ORDER BY month ASC"""))

  // --- q119: UNPIVOT — the wide frame melted back to long form ----------
  // Round-trips q118's wide result through `stack` (Spark's unpivot):
  // the output grain is the FULL month x region grid — a month with no
  // revenue in a region yields an explicit 0 row (what reshape
  // produces), which the oracle states as a grid cross join, NOT a
  // plain GROUP BY (which would omit the row). stack is a map-side
  // generator: no shuffle beyond q118's aggregate.
  private val q119 = Q(
    (spark, dir) => {
      val wide = ordersWithRegion(spark, dir)
        .groupBy(col("month"))
        .pivot("r_name", Regions)
        .agg(Exact.exactIntSum(col("cents")).cast("long"))
      val stackArgs = Regions.map(r =>
        s"'${r.replace("'", "''")}', coalesce(`$r`, CAST(0 AS BIGINT))")
        .mkString(", ")
      wide.select(col("month"),
          expr(s"stack(${Regions.size}, $stackArgs) AS (r_name, revenue_cents)"))
        .orderBy(col("month").asc, col("r_name").asc)
    },
    Some(s"""$pivotOracleBase,
      agg AS (SELECT month, r_name, CAST(sum(cents) AS BIGINT) AS cents
              FROM base GROUP BY 1, 2),
      months AS (SELECT DISTINCT month FROM base),
      grid AS (SELECT month, r AS r_name FROM months
               CROSS JOIN (VALUES ${Regions.map(r => s"('$r')").mkString(", ")}) t(r))
      SELECT g.month, g.r_name, COALESCE(a.cents, 0) AS revenue_cents
      FROM grid g LEFT JOIN agg a ON g.month = a.month AND g.r_name = a.r_name
      ORDER BY g.month ASC, g.r_name ASC"""))

  // --- q120: RFM customer segmentation via ntile ------------------------
  // Recency/frequency/monetary quartiles — the classic CRM cut. ntile
  // needs a TOTAL order (ties broken by custkey) to be deterministic;
  // with one, its floor/remainder bucket arithmetic is SQL-standard and
  // identical in both engines. The Spark side does NOT use a global
  // ntile window (one partition holding every customer — the q63
  // anti-pattern): each dimension's quartile comes from the two-pass
  // distributed exact rank (operators/Ranking) + ntileFromRank's
  // integer bucket arithmetic, so the largest sort is a range
  // partition, never the whole customer grain. DESC dimensions rank
  // ascending on the negated column (the q92 discipline).
  private val q120 = Q(
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val mx = o.agg(max(col("o_orderdate")).as("maxd"))
      val perCust = o.crossJoin(broadcast(mx))
        .groupBy(col("o_custkey"))
        .agg(datediff(max(col("maxd")), max(col("o_orderdate")))
            .cast("long").as("recency_days"),
          count(lit(1)).as("freq"),
          Exact.exactIntSum(Exact.quantize(col("o_totalprice")))
            .cast("long").as("mon_cents"))
        .withColumn("g", lit(0L))
        .withColumn("neg_freq", -col("freq"))
        .withColumn("neg_mon", -col("mon_cents"))
      val ranked = Seq(
        (Seq("recency_days", "o_custkey"), "rk_r", "n_tot"),
        (Seq("neg_freq", "o_custkey"), "rk_f", "n_f"),
        (Seq("neg_mon", "o_custkey"), "rk_m", "n_m"))
        .foldLeft(perCust) { case (df, (ord, rk, sz)) =>
          operators.Ranking.rankInGroup(df, "g", ord,
            rankName = rk, sizeName = sz)
        }
      val seg = ranked.select(col("o_custkey"), col("recency_days"),
        col("freq"), col("mon_cents"),
        operators.Ranking.ntileFromRank(col("rk_r"), col("n_tot"), 4)
          .cast("long").as("r_tile"),
        operators.Ranking.ntileFromRank(col("rk_f"), col("n_tot"), 4)
          .cast("long").as("f_tile"),
        operators.Ranking.ntileFromRank(col("rk_m"), col("n_tot"), 4)
          .cast("long").as("m_tile"))
      seg.groupBy((col("r_tile") * 100 + col("f_tile") * 10 + col("m_tile"))
          .as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          Exact.exactIntSum(col("mon_cents")).cast("long").as("sum_cents"),
          min(col("recency_days")).as("min_recency"),
          max(col("freq")).as("max_freq"))
        .orderBy(col("segment").asc)
    },
    Some("""
      WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
      per_cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', max(o_orderdate), max(maxd)) AS BIGINT)
                 AS recency_days,
               count(*) AS freq,
               CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                 AS mon_cents
        FROM orders, mx GROUP BY o_custkey),
      seg AS (
        SELECT o_custkey, recency_days, freq, mon_cents,
               CAST(ntile(4) OVER (ORDER BY recency_days ASC, o_custkey ASC)
                 AS BIGINT) AS r_tile,
               CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey ASC)
                 AS BIGINT) AS f_tile,
               CAST(ntile(4) OVER (ORDER BY mon_cents DESC, o_custkey ASC)
                 AS BIGINT) AS m_tile
        FROM per_cust)
      SELECT r_tile * 100 + f_tile * 10 + m_tile AS segment,
             count(*) AS n_customers,
             CAST(sum(mon_cents) AS BIGINT) AS sum_cents,
             min(recency_days) AS min_recency, max(freq) AS max_freq
      FROM seg GROUP BY 1 ORDER BY segment ASC"""))

  // --- q121: CDC snapshot diff ------------------------------------------
  // "What changed between the 1998 close and the 2000 close?" — the diff
  // a swap-write gold table (reference load.py) cannot answer and an
  // SCD2 table (q109) answers only per-attribute. Keyed full-outer join
  // of two as-of aggregate snapshots, classified added / changed /
  // unchanged (removed cannot occur in an append-only feed — the shape
  // still states it). Both snapshots shuffle on the SAME key, so AQE
  // plans one co-partitioned exchange each — at 100 TB this is the
  // standard CDC reconciliation join, linear in the key grain.
  private val q121 = Q(
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      def snap(cut: String) = o
        .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.exactIntSum(Exact.quantize(col("o_totalprice")))
            .cast("long").as("cents"))
      val old = snap("1999-01-01")
        .select(col("o_custkey"), col("n_orders").as("old_n"),
          col("cents").as("old_cents"))
      val neu = snap("2001-01-01")
        .select(col("o_custkey"), col("n_orders").as("new_n"),
          col("cents").as("new_cents"))
      val kind = when(col("old_n").isNull, "added")
        .when(col("new_n").isNull, "removed")
        .when(col("old_n") =!= col("new_n")
          || col("old_cents") =!= col("new_cents"), "changed")
        .otherwise("unchanged")
      old.join(neu, Seq("o_custkey"), "full_outer")
        .select(kind.as("kind"),
          (coalesce(col("new_n"), lit(0L))
            - coalesce(col("old_n"), lit(0L))).as("d_orders"),
          (coalesce(col("new_cents"), lit(0L))
            - coalesce(col("old_cents"), lit(0L))).as("d_cents"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_keys"),
          Exact.exactIntSum(col("d_orders")).cast("long").as("delta_orders"),
          Exact.exactIntSum(col("d_cents")).cast("long").as("delta_cents"))
        .orderBy(col("kind").asc)
    },
    Some("""
      WITH old AS (
        SELECT o_custkey, count(*) AS old_n,
               sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS old_cents
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1),
      neu AS (
        SELECT o_custkey, count(*) AS new_n,
               sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS new_cents
        FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY 1),
      d AS (
        SELECT CASE WHEN old_n IS NULL THEN 'added'
                    WHEN new_n IS NULL THEN 'removed'
                    WHEN old_n <> new_n OR old_cents <> new_cents THEN 'changed'
                    ELSE 'unchanged' END AS kind,
               COALESCE(new_n, 0) - COALESCE(old_n, 0) AS d_orders,
               COALESCE(new_cents, 0) - COALESCE(old_cents, 0) AS d_cents
        FROM old FULL OUTER JOIN neu USING (o_custkey))
      SELECT kind, count(*) AS n_keys,
             CAST(sum(d_orders) AS BIGINT) AS delta_orders,
             CAST(sum(d_cents) AS BIGINT) AS delta_cents
      FROM d GROUP BY 1 ORDER BY kind ASC"""))

  // --- q122: exact per-group quantiles over a BOUNDED domain ------------
  // Completes the percentile triptych's group dimension: when the value
  // domain is bounded (l_quantity ∈ 1..50 — flags, scores, star
  // ratings), the exact group quantile needs NO per-group buffer and NO
  // bisection loop: ONE (group, value) histogram aggregate, a window
  // cumsum over ≤ |domain| rows per group, and a conditional min. The
  // shuffle is bounded by |groups| x |domain| — independent of row
  // count, the 100 TB argument. Ranks use the same lower-discrete
  // convention as q117, stated identically in the oracle.
  private val q122 = Q(
    (spark, dir) => {
      val h = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("g")).orderBy(col("q").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
      cum.groupBy(col("g"), col("n"))
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("q")))
            .as("p50_qty"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("q")))
            .as("p90_qty"))
        .select(col("g"), col("n"), col("p50_qty"), col("p90_qty"))
        .orderBy(col("g").asc)
    },
    Some("""
      WITH h AS (
        SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q,
               count(*) AS c
        FROM lineitem GROUP BY 1, 2),
      cum AS (
        SELECT g, q, c,
               sum(c) OVER (PARTITION BY g ORDER BY q ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY g) AS n
        FROM h)
      SELECT g, CAST(n AS BIGINT) AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN q END) AS p50_qty,
             min(CASE WHEN cum >= (9 * n + 9) // 10 THEN q END) AS p90_qty
      FROM cum GROUP BY g, n ORDER BY g ASC"""))

  // --- q125: top-k per group via the bounded native aggregate -----------
  // "Top 3 orders per priority" — the report every warehouse serves.
  // The standard row_number window + filter sorts every group's full
  // slice (and a 5-value partition key funnels the corpus through 5
  // tasks); plans/TopKPairsLong instead carries k 16-byte pairs per
  // group per task, combines MAP-SIDE, and merges as a bounded ordered
  // union — the shuffle moves |groups| x k pairs, not the table. The
  // oracle IS the window form, so the driver hash-checks the native
  // aggregate against the semantics it replaces.
  private val q125 = Q(
    (spark, dir) => {
      val o = Tables.orders(spark, dir).select(
        col("o_orderpriority").as("priority"),
        Exact.quantize(col("o_totalprice")).as("cents"),
        col("o_orderkey"))
      o.groupBy(col("priority"))
        .agg(operators.TopK.topKPairs(col("cents"), col("o_orderkey"), 3)
          .as("top"))
        .select(col("priority"), posexplode(col("top")))
        .select(col("priority"), (col("pos") + 1).cast("long").as("rank"),
          col("col.v").as("cents"), col("col.id").as("o_orderkey"))
        .orderBy(col("priority").asc, col("rank").asc)
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority AS priority,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents,
               o_orderkey,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(round(o_totalprice * 100.0)
                                            AS BIGINT) DESC,
                                           o_orderkey ASC) AS rank
        FROM orders)
      SELECT priority, CAST(rank AS BIGINT) AS rank, cents, o_orderkey
      FROM o WHERE rank <= 3
      ORDER BY priority ASC, rank ASC"""))

  // --- q128: referential-integrity audit --------------------------------
  // The warehouse health check a medallion pipeline runs before
  // promoting silver→gold: for every FK relationship, orphaned child
  // keys (anti-join child→parent) and unreferenced parent keys
  // (anti-join parent→child). Both sides reduce to DISTINCT key sets
  // first, so every join is key-only — the shuffle carries keys, never
  // rows; at 100 TB this is |keys| work regardless of fact width.
  // Orphans are 0 on consistent TPC-H data (the audit PROVES it);
  // unreferenced counts are the non-trivial side (parts never ordered,
  // customers without orders).
  private val q128 = Q(
    (spark, dir) => {
      def keys(df: org.apache.spark.sql.DataFrame, c: String) =
        df.select(col(c).as("k")).distinct()
      val rels = Seq(
        ("lineitem.l_orderkey->orders.o_orderkey",
          keys(Tables.lineitem(spark, dir), "l_orderkey"),
          keys(Tables.orders(spark, dir), "o_orderkey")),
        ("lineitem.l_partkey->part.p_partkey",
          keys(Tables.lineitem(spark, dir), "l_partkey"),
          keys(Tables.part(spark, dir), "p_partkey")),
        ("lineitem.l_suppkey->supplier.s_suppkey",
          keys(Tables.lineitem(spark, dir), "l_suppkey"),
          keys(Tables.supplier(spark, dir), "s_suppkey")),
        ("orders.o_custkey->customer.c_custkey",
          keys(Tables.orders(spark, dir), "o_custkey"),
          keys(Tables.customer(spark, dir), "c_custkey")),
        ("customer.c_nationkey->nation.n_nationkey",
          keys(Tables.customer(spark, dir), "c_nationkey"),
          keys(Tables.nation(spark, dir), "n_nationkey")))
      rels.map { case (name, child, parent) =>
        val orphans = child.join(parent, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphan_keys"))
        val unreferenced = parent.join(child, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_unreferenced_parents"))
        val sizes = child.agg(count(lit(1)).as("n_child_keys"))
          .crossJoin(parent.agg(count(lit(1)).as("n_parent_keys")))
        sizes.crossJoin(orphans).crossJoin(unreferenced)
          .select(lit(name).as("relationship"), col("n_child_keys"),
            col("n_parent_keys"), col("n_orphan_keys"),
            col("n_unreferenced_parents"))
      }.reduce(_ unionByName _).orderBy(col("relationship").asc)
    },
    Some {
      val rels = Seq(
        ("lineitem.l_orderkey->orders.o_orderkey",
          "SELECT DISTINCT l_orderkey AS k FROM lineitem",
          "SELECT DISTINCT o_orderkey AS k FROM orders"),
        ("lineitem.l_partkey->part.p_partkey",
          "SELECT DISTINCT l_partkey AS k FROM lineitem",
          "SELECT DISTINCT p_partkey AS k FROM part"),
        ("lineitem.l_suppkey->supplier.s_suppkey",
          "SELECT DISTINCT l_suppkey AS k FROM lineitem",
          "SELECT DISTINCT s_suppkey AS k FROM supplier"),
        ("orders.o_custkey->customer.c_custkey",
          "SELECT DISTINCT o_custkey AS k FROM orders",
          "SELECT DISTINCT c_custkey AS k FROM customer"),
        ("customer.c_nationkey->nation.n_nationkey",
          "SELECT DISTINCT c_nationkey AS k FROM customer",
          "SELECT DISTINCT n_nationkey AS k FROM nation"))
      rels.map { case (name, child, parent) =>
        s"""SELECT '$name' AS relationship,
              (SELECT count(*) FROM ($child) c) AS n_child_keys,
              (SELECT count(*) FROM ($parent) p) AS n_parent_keys,
              (SELECT count(*) FROM ($child) c
               WHERE k NOT IN (SELECT k FROM ($parent) p)) AS n_orphan_keys,
              (SELECT count(*) FROM ($parent) p
               WHERE k NOT IN (SELECT k FROM ($child) c))
                AS n_unreferenced_parents"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY relationship ASC")
    })

  // --- q130: equi-depth bucketing from sort-free exact cut points -------
  // Feature binning / histogram-equalization over a continuous column:
  // 8 buckets holding (as nearly as duplicates allow) n/8 rows each.
  // The cut points are q117's multi-probe Selection (7 ranks answered
  // in ~10 cached scans — NO global sort, NO ntile window over the
  // corpus), and bucket assignment is a broadcast-free literal CASE
  // chain (7 comparisons, whole-stage codegen). The deterministic rule
  // "bucket b ⇔ x ≤ cut_b, last bucket open-ended" is stated
  // identically in the oracle, which derives the same cuts by
  // row_number selection. The shuffle story at 100 TB: one narrow
  // column cached, ~10 aggregate passes, one final 8-group aggregate.
  private val EqdB = 8

  private val q130 = Q(
    (spark, dir) => {
      val v = Tables.lineitem(spark, dir)
        .select(Exact.quantize(col("l_extendedprice")).as("cents"))
        .persist()
      try {
        val n = v.count()
        val ranks = (1 until EqdB).map(i =>
          Selection.discreteRank(n, i.toLong, EqdB.toLong))
        val got = Selection.kthSmallestMulti(v, col("cents"), ranks.distinct)
        val cuts = ranks.map(got) // ascending by construction
        val bucket = cuts.zipWithIndex.foldRight(lit(EqdB.toLong)) {
          case ((c, i), acc) =>
            when(col("cents") <= c, lit((i + 1).toLong)).otherwise(acc)
        }
        v.groupBy(bucket.as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("cents")).as("lo_cents"),
            max(col("cents")).as("hi_cents"),
            Exact.exactIntSum(col("cents")).cast("long").as("sum_cents"))
          .orderBy(col("bucket").asc)
      } finally v.unpersist()
    },
    Some {
      val cutDefs = (1 until EqdB).map(i =>
        s"max(CASE WHEN rn = GREATEST(1, ($i * n + ${EqdB - 1}) // $EqdB) " +
          s"THEN cents END) AS c$i").mkString(",\n               ")
      val chain = (1 until EqdB).map(i =>
        s"WHEN v.cents <= cuts.c$i THEN $i").mkString(" ")
      s"""
      WITH v AS (SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents
                 FROM lineitem),
      r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
                   count(*) OVER () AS n
            FROM v),
      cuts AS (SELECT $cutDefs FROM r)
      SELECT CAST(CASE $chain ELSE $EqdB END AS BIGINT) AS bucket,
             count(*) AS n_rows, min(v.cents) AS lo_cents,
             max(v.cents) AS hi_cents,
             CAST(sum(v.cents) AS BIGINT) AS sum_cents
      FROM v CROSS JOIN cuts
      GROUP BY 1 ORDER BY bucket ASC"""
    })

  // --- q133: association rules over co-purchase baskets -----------------
  // Market-basket mining (Agrawal-Srikant): for every directed rule
  // ante → cons emit support m (baskets containing both), confidence
  // m/n_ante, and lift m·N/(n_ante·n_cons). All ratios are FLOOR-SCALED
  // integers (ppm) so Spark and the oracle agree bit-for-bit: conf_ppm
  // = (m·1e6) div n_ante, and lift_ppm = (conf_ppm·N) div n_cons — the
  // two-step floor keeps every intermediate ≤ 1e6·N, overflow-safe to
  // ~9e12 baskets (vs m·N·1e6 in one step which overflows at ~1e7).
  // Floor-of-floor differs from floor-of-product by at most 1 ppm, and
  // BOTH sides compute the identical expression, so the comparison is
  // exact, not approximately-close.
  //
  // Scale shape: the basket-pair stream comes from
  // GraphOps.coOccurrenceCounts (one set aggregate + map-side i<j
  // explode — no self-join); item supports are one groupBy over the
  // distinct (basket, item) pairs; the rule table is 2·|pairs| rows
  // joined against the |items|-sized support table (AQE broadcasts it
  // when small, falls back to a key shuffle when the catalog is huge).
  // The min-support filter prunes BEFORE the join. Top-k serves via
  // one bounded sort.
  private val RuleMinSupport = 3
  private val q133 = Q(
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val items = li.distinct().groupBy(col("p")).agg(count(lit(1)).as("n"))
      val nBaskets = li.select(col("o")).distinct()
        .agg(count(lit(1)).as("nb"))
      val pairs = GraphOps.coOccurrenceCounts(li, "o", "p")
        .filter(col("m") >= RuleMinSupport)
      val rules = pairs.select(col("u").as("ante"), col("v").as("cons"), col("m"))
        .unionByName(pairs.select(col("v").as("ante"), col("u").as("cons"), col("m")))
      rules
        .join(items.select(col("p").as("ante"), col("n").as("n_ante")), Seq("ante"))
        .join(items.select(col("p").as("cons"), col("n").as("n_cons")), Seq("cons"))
        .crossJoin(broadcast(nBaskets)) // single-row broadcast
        .withColumn("conf_ppm",
          Sampling.ldiv(col("m") * lit(1000000L), col("n_ante")))
        .withColumn("lift_ppm",
          Sampling.ldiv(col("conf_ppm") * col("nb"), col("n_cons")))
        .select(col("ante"), col("cons"), col("m"), col("n_ante"),
          col("n_cons"), col("conf_ppm"), col("lift_ppm"))
        .orderBy(col("conf_ppm").desc, col("lift_ppm").desc,
          col("ante").asc, col("cons").asc)
        .limit(15)
    },
    Some(s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      items AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY 1),
      nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nb FROM li),
      pairs AS (
        SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS m
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= $RuleMinSupport),
      rules AS (
        SELECT u AS ante, v AS cons, m FROM pairs
        UNION ALL
        SELECT v AS ante, u AS cons, m FROM pairs),
      scored AS (
        SELECT r.ante, r.cons, r.m, ia.n AS n_ante, ic.n AS n_cons,
               (r.m * 1000000) // ia.n AS conf_ppm
        FROM rules r
        JOIN items ia ON r.ante = ia.p
        JOIN items ic ON r.cons = ic.p)
      SELECT ante, cons, m, n_ante, n_cons, conf_ppm,
             (conf_ppm * (SELECT nb FROM nb)) // n_cons AS lift_ppm
      FROM scored
      ORDER BY conf_ppm DESC NULLS LAST, lift_ppm DESC NULLS LAST,
               ante ASC NULLS FIRST, cons ASC NULLS FIRST
      LIMIT 15"""))

  // --- q137: label-propagation communities over the co-purchase graph ---
  // Community detection (Raghavan et al. 2007) — the "what sells
  // together as a THEME" question that k-core (density) and components
  // (reachability) don't answer. GraphOps.labelPropagate runs R=4
  // synchronous majority-vote rounds, ties to the smallest label
  // (deterministic, layout-independent); the oracle unrolls the same
  // rounds as generated CTEs (round 1 is the folded min-neighbor init —
  // distinct neighbors hold distinct id-labels, so majority-with-min-tie
  // degenerates to min). Edges are SPARSIFIED to multiplicity >= 2
  // (co-purchased in at least two orders): the raw co-occurrence graph
  // is a near-clique where LPA collapses to 2 blobs; repeat-signal
  // edges carry the actual affinity (349 communities vs 2 at sf0.01) —
  // the same backbone-extraction step a production pipeline applies
  // before any community pass. Output: the 20 largest communities.
  //
  // 100 TB posture: per round one edges⋈labels shuffle join + two hash
  // aggs (vote counts, packed-struct argmax) — the Pregel superstep
  // shape with a constant round count; no window, no per-node sort, no
  // driver loop beyond R=4. The multiplicity filter also shrinks every
  // round's join input by ~30x before the loop starts.
  private val LpRounds = 4
  private val LpK = 20
  private val LpMinM = 2

  private def labelPropOracle: String = {
    val rounds = (2 to LpRounds).map { i =>
      s"""v$i AS MATERIALIZED (
            SELECT e.t AS node, l.lbl, count(*) AS c
            FROM e JOIN l${i - 1} l ON e.s = l.node GROUP BY 1, 2),
          l$i AS MATERIALIZED (
            SELECT node, lbl FROM v$i
            QUALIFY row_number() OVER (
              PARTITION BY node ORDER BY c DESC, lbl ASC) = 1)"""
    }.mkString(",\n          ")
    s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      p AS MATERIALIZED (SELECT a.p AS u, b.p AS v
           FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
           GROUP BY 1, 2 HAVING count(*) >= $LpMinM),
      e AS MATERIALIZED (SELECT u AS s, v AS t FROM p
           UNION ALL SELECT v AS s, u AS t FROM p),
      l1 AS MATERIALIZED (SELECT t AS node, min(s) AS lbl FROM e GROUP BY 1),
      $rounds
      SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size
      FROM l$LpRounds
      GROUP BY 1
      ORDER BY size DESC NULLS LAST, community ASC
      LIMIT $LpK"""
  }

  private val q137 = Q(
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = GraphOps.coOccurrenceCounts(li, "o", "p")
        .filter(col("m") >= LpMinM)
      GraphOps.labelPropagate(pairs, "u", "v", iters = LpRounds)
        .groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc_nulls_last, col("community").asc)
        .limit(LpK)
    },
    Some(labelPropOracle))

  // --- q145: link prediction by resource allocation ---------------------
  // "Which parts are NOT yet co-purchased but should be?" — the
  // recommendation question communities (q137) and rules (q133, which
  // only rank EXISTING edges) don't answer. Score for a non-edge (x,y)
  // is the Zhou-Lü-Zhang resource-allocation index Σ_c 1/deg(c) over
  // common neighbors c, FLOOR-SCALED to picos (1e12 div deg) so Spark
  // and the oracle agree bit-for-bit — the 1/deg weighting also means
  // hub centers contribute the least, which is exactly why capping or
  // dropping super-hubs at 100 TB loses almost no score mass.
  //
  // Scale shape: wedges explode from each center's adjacency SET
  // (one set aggregate, then a map-side i<j explode — Σ deg²/2 rows,
  // never a 3-way join); deg(c) = size of the same set, so no separate
  // degree table or join; existing edges leave via one left_anti
  // shuffle on (x,y); the candidate rollup is one groupBy. Hub blowup
  // is governed by the same multiplicity sparsification as q137
  // (m >= 2), the knob a 100 TB run would tighten first.
  private val RaK = 15
  private val q145 = Q(
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = GraphOps.coOccurrenceCounts(li, "o", "p")
        .filter(col("m") >= LpMinM)
        .select(col("u"), col("v"))
      val e = pairs.select(col("u").as("s"), col("v").as("t"))
        .unionByName(pairs.select(col("v").as("s"), col("u").as("t")))
      val adj = e.groupBy(col("s"))
        .agg(sort_array(collect_set(col("t"))).as("ts"))
      val wedges = adj
        .select(Sampling.ldiv(lit(1000000000000L),
          size(col("ts")).cast("long")).as("w"), col("ts"))
        .select(col("w"), posexplode(col("ts")).as(Seq("i", "x")), col("ts"))
        .select(col("w"), col("x"),
          explode(slice(col("ts"), col("i") + 2,
            greatest(size(col("ts")) - col("i") - 1, lit(0)))).as("y"))
      wedges
        .join(pairs.withColumnRenamed("u", "x").withColumnRenamed("v", "y"),
          Seq("x", "y"), "left_anti")
        .groupBy(col("x").as("p1"), col("y").as("p2"))
        .agg(count(lit(1)).as("cn"), sum(col("w")).as("ra_score"))
        .orderBy(col("ra_score").desc_nulls_last, col("cn").desc_nulls_last,
          col("p1").asc, col("p2").asc)
        .limit(RaK)
    },
    Some(s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      pairs AS (
        SELECT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= $LpMinM),
      e AS (SELECT u AS s, v AS t FROM pairs
            UNION ALL SELECT v AS s, u AS t FROM pairs),
      deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
      wedges AS (
        SELECT e1.s AS c, e1.t AS x, e2.t AS y
        FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.t < e2.t),
      cand AS (
        SELECT w.x, w.y, CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(1000000000000 // d.d) AS BIGINT) AS ra_score
        FROM wedges w
        JOIN deg d ON w.c = d.s
        LEFT JOIN pairs p ON p.u = w.x AND p.v = w.y
        WHERE p.u IS NULL
        GROUP BY 1, 2)
      SELECT x AS p1, y AS p2, cn, ra_score
      FROM cand
      ORDER BY ra_score DESC NULLS LAST, cn DESC NULLS LAST,
               p1 ASC NULLS FIRST, p2 ASC NULLS FIRST
      LIMIT $RaK"""))

  // --- q147: higher moments (skewness / kurtosis) from exact power sums -
  // Distribution-shape profiling per segment: beyond q36/q66's
  // quantiles, the moment statistics a feature-store computes per
  // column. The distributed discipline: accumulate RAW POWER SUMS
  // Σx..Σx⁴ exactly in integer space (decimal(38,0) — x⁴ overflows
  // BIGINT, and float power sums are catastrophically
  // cancellation-prone), one map-side-combinable aggregate; then form
  // the CENTRAL-moment numerators STILL IN INTEGERS:
  //   T2 = nΣx² − (Σx)²          ( = n²·M2 )
  //   T3 = n²Σx³ − 3nΣx²Σx + 2(Σx)³      ( = n³·M3 )
  //   T4 = n³Σx⁴ − 4n²Σx³Σx + 6nΣx²(Σx)² − 3(Σx)⁴   ( = n⁴·M4 )
  // The n-powers cancel in the scale-free statistics, so
  //   g1 = √n·T3/(T2·√T2),  g2 = n·T4/T2² − 3
  // touch floats only through cast, *, /, and sqrt — every one
  // IEEE-correctly-rounded, hence bit-identical across engines (the
  // naive μ-expansion in doubles drifts in the last ulps, observed
  // against DuckDB; pow(x,1.5) is spelled x·√x for the same reason).
  // Values are quantized at whole-dollar scale: (Σx)⁴ must stay inside
  // decimal(38)/int128, which holds to ~300k rows/group at |x|≤1e4 —
  // cent scale would overflow at ~1e3 rows. The oracle mirrors in
  // HUGEINT.
  private val q147 = Q(
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
      val d = cust.select(col("c_mktsegment").as("segment"),
          Exact.quantize(col("c_acctbal").cast("double"), scale = 0)
            .cast("decimal(38,0)").as("x"))
      val sums = d.groupBy(col("segment")).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      val (n, s1, s2, s3, s4) =
        (col("n"), col("s1"), col("s2"), col("s3"), col("s4"))
      val t2 = n * s2 - s1 * s1
      val t3 = n * n * s3 - lit(3) * n * s2 * s1 + lit(2) * s1 * s1 * s1
      val t4 = n * n * n * s4 - lit(4) * n * n * s3 * s1 +
        lit(6) * n * s2 * (s1 * s1) - lit(3) * (s1 * s1) * (s1 * s1)
      val nd = n.cast("double")
      val t2d = t2.cast("double")
      sums.select(col("segment"), col("n").cast("long").as("n_cust"),
          (s1.cast("double") / nd).as("mean_bal"),
          (sqrt(nd) * t3.cast("double") / (t2d * sqrt(t2d))).as("skewness"),
          (nd * t4.cast("double") / (t2d * t2d) - lit(3.0)).as("kurtosis"))
        .orderBy(col("segment").asc)
    },
    Some("""
      WITH d AS (
        SELECT c_mktsegment AS segment,
               CAST(CAST(round(c_acctbal) AS BIGINT) AS HUGEINT) AS x
        FROM customer),
      sums AS (
        SELECT segment, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS s1, sum(x * x) AS s2,
               sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
        FROM d GROUP BY 1),
      t AS (
        SELECT segment, n, s1,
               n * s2 - s1 * s1 AS t2,
               n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1 AS t3,
               n * n * n * s4 - 4 * n * n * s3 * s1
                 + 6 * n * s2 * (s1 * s1) - 3 * (s1 * s1) * (s1 * s1) AS t4
        FROM sums),
      f AS (
        SELECT segment, CAST(n AS BIGINT) AS n_cust,
               CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
               CAST(t2 AS DOUBLE) AS t2d, CAST(t3 AS DOUBLE) AS t3d,
               CAST(t4 AS DOUBLE) AS t4d
        FROM t)
      SELECT segment, n_cust,
             s1d / nd AS mean_bal,
             sqrt(nd) * t3d / (t2d * sqrt(t2d)) AS skewness,
             nd * t4d / (t2d * t2d) - 3.0 AS kurtosis
      FROM f
      ORDER BY segment ASC NULLS FIRST"""))

  // --- q152: degree assortativity of the co-purchase graph --------------
  // Newman's r: Pearson correlation of (deg(u), deg(v)) over the
  // directed edge list (each undirected edge counted both ways — the
  // standard convention, and what makes the two marginals equal).
  // Answers "do popular parts co-sell with popular parts" — the
  // structural summary none of q87 (closure), q112 (coreness) or q137
  // (communities) gives. Exact-integer Pearson: the q99/q147/q151
  // discipline — BIGINT moment sums over integer degrees, one double
  // cast, multiply/sqrt/divide order pinned on both sides.
  //
  // 100 TB posture: degrees are one groupBy over the edge list; the
  // two degree attachments are equi-joins that AQE broadcasts while
  // the degree table is small and shuffles on the node key once it
  // isn't; moments fold map-side to a single row. Degree sums stay
  // in int64 to ~1e18 (Σd² over the edge list = Σd³ ≤ n·dmax³);
  // past that, widen via Exact.exactIntSum as everywhere else.
  private val q152 = Q(
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = GraphOps.coOccurrenceCounts(li, "o", "p")
        .filter(col("m") >= LpMinM)
        .select(col("u"), col("v"))
      val e = pairs.select(col("u").as("s"), col("v").as("t"))
        .unionByName(pairs.select(col("v").as("s"), col("u").as("t")))
      val deg = e.groupBy(col("s").as("node"))
        .agg(count(lit(1)).as("d"))
      val m = e
        .join(deg.select(col("node").as("s"), col("d").as("du")), Seq("s"))
        .join(deg.select(col("node").as("t"), col("d").as("dv")), Seq("t"))
        .agg(count(lit(1)).as("m"),
          sum(col("du")).as("sa"), sum(col("dv")).as("sb"),
          sum(col("du") * col("dv")).as("sab"),
          sum(col("du") * col("du")).as("saa"),
          sum(col("dv") * col("dv")).as("sbb"))
      val num = col("m") * col("sab") - col("sa") * col("sb")
      val da = col("m") * col("saa") - col("sa") * col("sa")
      val db = col("m") * col("sbb") - col("sb") * col("sb")
      m.select(expr("m div 2").as("n_edges"),
          when(da > 0 && db > 0,
            num.cast("double") /
              (sqrt(da.cast("double")) * sqrt(db.cast("double")))).as("r"))
    },
    Some(s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      pairs AS (
        SELECT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= $LpMinM),
      e AS (SELECT u AS s, v AS t FROM pairs
            UNION ALL SELECT v AS s, u AS t FROM pairs),
      deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS d
              FROM e GROUP BY 1),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(du.d) AS BIGINT) AS sa,
               CAST(sum(dv.d) AS BIGINT) AS sb,
               CAST(sum(du.d * dv.d) AS BIGINT) AS sab,
               CAST(sum(du.d * du.d) AS BIGINT) AS saa,
               CAST(sum(dv.d * dv.d) AS BIGINT) AS sbb
        FROM e
        JOIN deg du ON e.s = du.node
        JOIN deg dv ON e.t = dv.node)
      SELECT m // 2 AS n_edges,
             CASE WHEN m * saa - sa * sa > 0 AND m * sbb - sb * sb > 0
                  THEN CAST(m * sab - sa * sb AS DOUBLE) /
                       (sqrt(CAST(m * saa - sa * sa AS DOUBLE)) *
                        sqrt(CAST(m * sbb - sb * sb AS DOUBLE)))
             END AS r
      FROM m"""))

  // --- q156: HITS hubs/authorities on the bipartite basket graph --------
  // Kleinberg's HITS over orders × parts WITHOUT projecting to a
  // co-purchase graph first: authority(part) = Σ hub(order),
  // hub(order) = Σ authority(part), three synchronous rounds, each
  // side max-normalized to 1e6 by floor division (GraphOps.hitsInt —
  // the pageRankInt integer discipline, so Spark and the oracle agree
  // bit-for-bit with no float mass anywhere). Answers "which parts
  // anchor the biggest baskets" — a different centrality than q76's
  // random-walk mass (PageRank rewards being reachable; HITS rewards
  // mutual reinforcement with strong baskets).
  //
  // The oracle unrolls the same fixed rounds as generated CTEs (the
  // q76/q116/q137 discipline); normalization max's are scalar
  // subqueries (single-row broadcasts in the Spark plan).
  private val HitsRounds = 3
  private val HitsK = 15

  private def hitsOracle: String = {
    val rounds = (1 to HitsRounds).map { i =>
      s"""a${i}r AS MATERIALIZED (
            SELECT p, sum(h) AS ar FROM e JOIN h${i - 1} USING (o)
            GROUP BY 1),
          a$i AS MATERIALIZED (
            SELECT p, (ar * 1000000) // (SELECT max(ar) FROM a${i}r) AS a
            FROM a${i}r),
          h${i}r AS MATERIALIZED (
            SELECT o, sum(a) AS hr FROM e JOIN a$i USING (p)
            GROUP BY 1),
          h$i AS MATERIALIZED (
            SELECT o, (hr * 1000000) // (SELECT max(hr) FROM h${i}r) AS h
            FROM h${i}r)"""
    }.mkString(",\n")
    s"""
      WITH e AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      h0 AS MATERIALIZED (
        SELECT DISTINCT o, CAST(1000000 AS BIGINT) AS h FROM e),
      $rounds,
      deg AS (SELECT p, CAST(count(*) AS BIGINT) AS n_baskets
              FROM e GROUP BY 1)
      SELECT a.p AS p_partkey, CAST(a.a AS BIGINT) AS authority,
             deg.n_baskets
      FROM a$HitsRounds a JOIN deg ON a.p = deg.p
      ORDER BY authority DESC NULLS LAST, p_partkey ASC
      LIMIT $HitsK"""
  }

  private val q156 = Q(
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val auth = GraphOps.hitsInt(li, "o", "p", iters = HitsRounds)
      val deg = li.distinct().groupBy(col("p"))
        .agg(count(lit(1)).as("n_baskets"))
      auth.join(deg, Seq("p"))
        .select(col("p").as("p_partkey"), col("a").as("authority"),
          col("n_baskets"))
        .orderBy(col("authority").desc_nulls_last, col("p_partkey").asc)
        .limit(HitsK)
    },
    Some(hitsOracle))

  // --- q158: frequent triples (3-itemsets) with a-priori pruning --------
  // One level past q133's pair rules: which part TRIPLES co-occur in
  // ≥ s baskets. The distributed a-priori discipline keeps the 3-way
  // blowup bounded: (1) baskets first semi-join to s-frequent ITEMS
  // (downward closure — an infrequent item can't be in a frequent
  // triple); (2) the ordered 3-way self-join on the basket key
  // (u<v<w) generates candidates; (3) each candidate must contain a
  // frequent PAIR on its (u,v) leg — the leg that prunes BEFORE the
  // third join row multiplies, which is where a naive triple join
  // explodes. Counts are exact; the final HAVING applies the same s.
  //
  // 100 TB posture: per-basket work is deg³ ONLY within pruned
  // baskets — the two semi-joins are the knobs (raise s) a real
  // basket-mining run turns first; joins are all equi-key on the
  // basket id, AQE-broadcastable while the frequent sets are small.
  private val TripleMinSupport = 2
  private val q158 = Q(
    (spark, dir) => {
      val s = TripleMinSupport
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val freqItems = li.groupBy(col("p")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= s).select(col("p"))
      val b = li.join(freqItems, Seq("p"), "left_semi")
      val freqPairs = b.as("a").join(b.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= s)
        .select(col("u"), col("v"))
      val cand = b.as("x").join(b.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.o").as("oo"), col("x.p").as("u"), col("y.p").as("v"))
        .join(freqPairs, Seq("u", "v"), "left_semi") // prune BEFORE leg 3
        .join(b.as("z"), col("oo") === col("z.o") && col("v") < col("z.p"))
        .select(col("u"), col("v"), col("z.p").as("w"))
      cand.groupBy(col("u"), col("v"), col("w"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= s)
        .orderBy(col("m").desc_nulls_last, col("u").asc, col("v").asc,
          col("w").asc)
        .limit(20)
    },
    Some(s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      fi AS (SELECT p FROM li GROUP BY 1
             HAVING count(*) >= $TripleMinSupport),
      b AS MATERIALIZED (SELECT o, p FROM li WHERE p IN (SELECT p FROM fi)),
      fp AS (
        SELECT a.p AS u, b2.p AS v
        FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
        GROUP BY 1, 2 HAVING count(*) >= $TripleMinSupport),
      cand AS (
        SELECT x.o, x.p AS u, y.p AS v
        FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
        WHERE EXISTS (SELECT 1 FROM fp
                      WHERE fp.u = x.p AND fp.v = y.p)),
      tri AS (
        SELECT c.u, c.v, z.p AS w
        FROM cand c JOIN b z ON c.o = z.o AND c.v < z.p)
      SELECT u, v, w, CAST(count(*) AS BIGINT) AS m
      FROM tri GROUP BY 1, 2, 3
      HAVING count(*) >= $TripleMinSupport
      ORDER BY m DESC NULLS LAST, u ASC, v ASC, w ASC
      LIMIT 20"""))

  // --- q162: purchase-cadence quantiles (inter-order gaps) --------------
  // "How often do customers in each segment come back" — the retention
  // cadence behind q95's cohort view. Consecutive-order gaps come from
  // ONE lag window per customer (key-partitioned, no global sort);
  // gap days are a BOUNDED domain (≤ calendar span), so the per-segment
  // p50/p90 use q122's exact histogram discipline — the shuffle is
  // |segments| × |distinct gaps|, independent of order count. The mean
  // is the exact rational Σ(gap·c)/n cast once.
  private val q162 = Q(
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("d").asc, col("o_orderkey").asc)
      val gaps = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
          col("o_orderkey"))
        .withColumn("prev", lag(col("d"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_custkey"), datediff(col("d"), col("prev")).as("gap"))
      val seg = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val h = gaps.join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy(col("segment"), col("gap").cast("long").as("gap"))
        .agg(count(lit(1)).as("c"))
      val wc = Window.partitionBy(col("segment")).orderBy(col("gap").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.withColumn("cum", sum(col("c")).over(wc))
        .withColumn("n",
          sum(col("c")).over(Window.partitionBy(col("segment"))))
        .withColumn("sg",
          sum(col("gap") * col("c"))
            .over(Window.partitionBy(col("segment"))))
      cum.groupBy(col("segment"), col("n"), col("sg"))
        .agg(
          min(when(col("cum") >= expr("(n + 1) div 2"), col("gap")))
            .as("p50_gap"),
          min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("gap")))
            .as("p90_gap"))
        .select(col("segment"), col("n").as("n_gaps"), col("p50_gap"),
          col("p90_gap"),
          (col("sg").cast("double") / col("n")).as("mean_gap"))
        .orderBy(col("segment").asc)
    },
    Some("""
      WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
        FROM orders),
      g0 AS (
        SELECT o_custkey,
               d - lag(d) OVER (PARTITION BY o_custkey
                                ORDER BY d ASC, o_orderkey ASC) AS gap
        FROM o),
      gaps AS (
        SELECT c.c_mktsegment AS segment, CAST(g0.gap AS BIGINT) AS gap
        FROM g0 JOIN customer c ON g0.o_custkey = c.c_custkey
        WHERE g0.gap IS NOT NULL),
      h AS (SELECT segment, gap, count(*) AS c FROM gaps GROUP BY 1, 2),
      cum AS (
        SELECT segment, gap, c,
               sum(c) OVER (PARTITION BY segment ORDER BY gap ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY segment) AS n,
               sum(gap * c) OVER (PARTITION BY segment) AS sg
        FROM h)
      SELECT segment, CAST(n AS BIGINT) AS n_gaps,
             min(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS p50_gap,
             min(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap END) AS p90_gap,
             CAST(sg AS DOUBLE) / n AS mean_gap
      FROM cum
      GROUP BY segment, n, sg
      ORDER BY segment ASC NULLS FIRST"""))

  val all: Seq[(String, Q)] = Seq(
    "q116_sssp" -> q116,
    "q117_exact_select" -> q117,
    "q118_pivot" -> q118,
    "q119_unpivot" -> q119,
    "q120_rfm" -> q120,
    "q121_snapshot_diff" -> q121,
    "q122_group_quantiles" -> q122,
    "q125_topk_group" -> q125,
    "q128_fk_audit" -> q128,
    "q130_equidepth" -> q130,
    "q133_assoc_rules" -> q133,
    "q137_label_prop" -> q137,
    "q145_link_predict" -> q145,
    "q147_group_moments" -> q147,
    "q152_assortativity" -> q152,
    "q156_hits" -> q156,
    "q158_freq_triples" -> q158,
    "q162_order_gaps" -> q162)
}
