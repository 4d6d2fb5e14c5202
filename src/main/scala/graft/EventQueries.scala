package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.Exact
import graft.operators.Sampling

/** Event-stream operators over the `events` table (north-star E5/E6):
  * JSON property extraction, event-time tumbling windows, and
  * gap-based sessionization — the batch forms; the Structured Streaming
  * variants share the same `window`/`session_window` expressions (see
  * graft.streaming).
  *
  * `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which
  * Spark's vectorized reader only accepts via
  * `spark.sql.legacy.parquet.nanosAsLong`, surfacing a LONG) and as
  * plain TIMESTAMP(MICROS) (surfacing TIMESTAMP/TIMESTAMP_NTZ), so the
  * normalization inspects the scanned dtype. For the nanos-long layout
  * the queries FLOOR-divide to microseconds: Spark's `div` truncates
  * toward zero, which differs from the oracle's floor `//` for pre-1970
  * timestamps, so the conversion subtracts a non-negative `pmod` first —
  * `(ts - pmod(ts, 1000)) div 1000` is an exact floor for any sign (a
  * double division would additionally lose precision above 2^53). For
  * the micros layout the value is already exact; NTZ casts to session
  * TIMESTAMP (identity wall-clock under the pinned UTC session).
  */
object EventQueries {

  /** events with ts as a proper microsecond timestamp column `tus`. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.events(spark, dir)
    val tus = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)")
      case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    df.withColumn("tus", tus)
  }

  private val eventsSqlCte =
    "ev AS (SELECT *, make_timestamp(epoch_ns(ts) // 1000) AS tus FROM events)"

  // --- E5: JSON props extraction + aggregation ---------------------------
  private val q28 = Q(
    (spark, dir) => {
      events(spark, dir)
        .withColumn("k", from_json(col("props"), StructType.fromDDL("k BIGINT")).getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
             min(CAST(props->>'k' AS BIGINT)) AS min_k,
             max(CAST(props->>'k' AS BIGINT)) AS max_k
      FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""))

  // --- E6: event-time tumbling 1-hour windows ----------------------------
  private val q29 = Q(
    (spark, dir) => {
      events(spark, dir)
        .groupBy(window(col("tus"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.exactSum(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some(s"""
      WITH $eventsSqlCte
      SELECT date_trunc('hour', tus) AS window_start, event_type,
             count(*) AS n,
             ${Exact.sumSql("value")} AS sum_value
      FROM ev GROUP BY 1, 2
      ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST"""))

  // --- E6b: gap-based sessionization (30-minute inactivity gap) ----------
  // Spark session_window keeps an event arriving EXACTLY gap after the
  // previous one in the same session (verified by the EventStreamsSpec
  // boundary test), so the oracle's island detection must use the STRICT
  // `> INTERVAL 30 MINUTE`.
  private val q30 = Q(
    (spark, dir) => {
      events(spark, dir)
        .groupBy(session_window(col("tus"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("tus")).as("session_end"),
          Exact.exactSum(col("value")).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      g AS (
        SELECT user_id, tus, value,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus ASC NULLS FIRST)),
      s AS (
        SELECT user_id, tus, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY tus ASC NULLS FIRST
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM g)
      SELECT user_id, min(tus) AS session_start, max(tus) AS session_end,
             count(*) AS n_events,
             ${Exact.sumSql("value")} AS sum_value
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST"""))

  // --- skew-safe aggregation: salted two-phase count/sum -----------------
  // events has 5 event_type values over 100k rows at sf0.1 — the natural
  // hot-key shape. The salted form shares each hot key across `buckets`
  // reducers, then merges exact integer partials; results are identical
  // to the direct groupBy (the oracle runs the plain form).
  private val q33 = Q(
    (spark, dir) => {
      graft.operators.Relational.saltedSumCount(
        events(spark, dir), keys = Seq("event_type"), value = "value")
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n, ${Exact.sumSql("value")} AS sum_value
      FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""))

  // --- as-of join: each click enriched with the user's latest prior
  // purchase value. Oracle is DuckDB's native ASOF LEFT JOIN; the Spark
  // side is the union + running-last window composition (one shuffle).
  private val q35 = Q(
    (spark, dir) => {
      val ev = events(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("tus").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), col("value"))
      graft.operators.Relational.asofJoinLatest(
        clicks, purchases, keys = Seq("user_id"),
        leftTs = "click_ts", rightTs = "tus", valuePrefix = "last_purchase_")
        .select(col("event_id"), col("user_id"), col("click_ts"),
          col("last_purchase_value"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      cl AS (SELECT event_id, user_id, tus AS click_ts FROM ev WHERE event_type = 'click'),
      pu AS (SELECT user_id, tus, value FROM ev WHERE event_type = 'purchase')
      SELECT cl.event_id, cl.user_id, cl.click_ts, pu.value AS last_purchase_value
      FROM cl ASOF LEFT JOIN pu ON cl.user_id = pu.user_id AND cl.click_ts >= pu.tus
      ORDER BY cl.event_id ASC NULLS FIRST"""))

  // --- E6c: interval (attribution) join — clicks to the purchases the
  // same user makes in the following 30 minutes. The batch twin of the
  // STREAM-STREAM time-bounded join (streaming/EventStreams
  // .attributionJoin shares the exact predicate, so stream and batch
  // cannot drift). Scale shape: equi-join on user_id with a range
  // predicate — hash-partitioned by user, each partition merge-scans
  // its time-sorted runs; nothing corpus-global. The time bound is
  // what makes the STREAMING form possible at all (it lets the engine
  // expire join state past the watermark + interval).
  private val q62 = Q(
    (spark, dir) => {
      val ev = events(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("tus").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("tus").as("p_ts"), col("value"))
      val pairs = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") > col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("p_ts"), col("value"))
      val agg = pairs.groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          Exact.exactSum(col("value")).as("attributed_value"))
      clicks.join(agg, Seq("click_id"), "left")
        .select(col("click_id"), col("user_id"), col("click_ts"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("attributed_value"), lit(0.0)).as("attributed_value"))
        .orderBy(col("click_id"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      cl AS (SELECT event_id AS click_id, user_id, tus AS click_ts
             FROM ev WHERE event_type = 'click'),
      pu AS (SELECT user_id, tus AS p_ts, value
             FROM ev WHERE event_type = 'purchase'),
      pr AS (
        SELECT cl.click_id, pu.p_ts, pu.value
        FROM cl JOIN pu ON cl.user_id = pu.user_id
         AND pu.p_ts > cl.click_ts
         AND pu.p_ts <= cl.click_ts + INTERVAL 30 MINUTE),
      ag AS (
        SELECT click_id, count(*) AS n_purchases,
               ${Exact.sumSql("value")} AS attributed_value
        FROM pr GROUP BY 1)
      SELECT cl.click_id, cl.user_id, cl.click_ts,
             COALESCE(ag.n_purchases, 0) AS n_purchases,
             COALESCE(ag.attributed_value, 0.0) AS attributed_value
      FROM cl LEFT JOIN ag ON ag.click_id = cl.click_id
      ORDER BY cl.click_id ASC NULLS FIRST"""))

  // --- E6d: PageRank over the user/event-type interaction graph ---------
  // Graph analytics for curation: nodes are users and event types, one
  // undirected edge per DISTINCT (user, type) interaction (both
  // directions, so no dangling nodes), 3 damped iterations ENTIRELY IN
  // INTEGER SPACE (operators/GraphOps.pageRankInt — micro-ranks, floor
  // divisions) so the oracle unrolls the identical iterations in SQL and
  // the result is layout-independent. Top-20 nodes by final rank.
  //
  // 100 TB posture: per iteration one shuffle join (edges x ranks on
  // src) + one hash agg on dst — the Pregel superstep shape with a
  // constant iteration count; degree is pre-joined once outside the
  // loop, lineage cut per iteration.
  private val q76 = Q(
    (spark, dir) => {
      val pairs = Tables.events(spark, dir)
        .select(concat(lit("u:"), col("user_id").cast("string")).as("u"),
          concat(lit("t:"), col("event_type")).as("t"))
        .distinct()
      val edges = pairs.select(col("u").as("s"), col("t").as("d"))
        .unionByName(pairs.select(col("t").as("s"), col("u").as("d")))
      operators.GraphOps.pageRankInt(edges, "s", "d", iters = 3)
        .orderBy(col("rank").desc_nulls_last, col("node"))
        .limit(20)
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
               't:' || event_type AS t
        FROM events),
      e AS (SELECT u AS s, t AS d FROM pairs
            UNION ALL
            SELECT t AS s, u AS d FROM pairs),
      deg AS (SELECT s, count(*) AS od FROM e GROUP BY 1),
      r0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
      c1 AS (SELECT e.d, sum(r.rank // g.od) AS m
             FROM e JOIN r0 r ON e.s = r.node JOIN deg g ON e.s = g.s
             GROUP BY 1),
      r1 AS (SELECT g.s AS node,
                    CAST(150000 + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS rank
             FROM deg g LEFT JOIN c1 c ON g.s = c.d),
      c2 AS (SELECT e.d, sum(r.rank // g.od) AS m
             FROM e JOIN r1 r ON e.s = r.node JOIN deg g ON e.s = g.s
             GROUP BY 1),
      r2 AS (SELECT g.s AS node,
                    CAST(150000 + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS rank
             FROM deg g LEFT JOIN c2 c ON g.s = c.d),
      c3 AS (SELECT e.d, sum(r.rank // g.od) AS m
             FROM e JOIN r2 r ON e.s = r.node JOIN deg g ON e.s = g.s
             GROUP BY 1),
      r3 AS (SELECT g.s AS node,
                    CAST(150000 + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS rank
             FROM deg g LEFT JOIN c3 c ON g.s = c.d)
      SELECT node, rank FROM r3
      ORDER BY rank DESC NULLS LAST, node ASC NULLS FIRST
      LIMIT 20"""))

  // --- E6e: rolling z-score anomaly detection ---------------------------
  // Per user, each event is scored against the mean/variance of its own
  // trailing window (the previous `ZFrame` events, ordered by event
  // time with event_id as total-order tiebreaker): anomaly iff
  // z^2 = (v - mean)^2 / var > ZThresh^2. ENTIRELY IN INTEGER SPACE:
  // values quantize to micros (Exact discipline), and the n^2 factors
  // cancel so the test is (n*v - s)^2 > ZThresh^2 * (n*ssq - s^2) — the
  // squares computed as DECIMAL(38,0) (HUGEINT in the oracle), so the
  // flag is layout- and engine-exact with no double variance drift.
  // Long-sum envelope: ssq sums ZFrame values of vq^2, exact while
  // frame * max(vq)^2 < 2^63 — |value| <= ~9.6e5 at micros here;
  // widen to decimal sums past that.
  //
  // 100 TB posture: the window partitions on user_id — a HIGH-cardinality
  // key (the q63 lesson inverted: millions of users = millions of
  // independent sort groups, no low-cardinality WindowExec funnel), and
  // the frame is O(1) rows. One shuffle on user_id, one per-user sort,
  // then a per-user summary agg that reuses the same partitioning
  // (no second exchange).
  // Shared with the streaming twin (streaming/AnomalyStream) so batch
  // and stream cannot drift on the window geometry or threshold.
  private val ZFrame = streaming.AnomalyStream.Frame
  private val ZMinN = streaming.AnomalyStream.MinN
  private val ZThresh = streaming.AnomalyStream.Thresh
  private val q79 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(-ZFrame, -1)
      val e = events(spark, dir).select(col("user_id"), col("tus"),
        col("event_id"), Exact.quantize(col("value"), 6).as("vq"))
      val scored = e
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("vq")).over(w))
        .withColumn("ssq", sum(col("vq") * col("vq")).over(w))
      val d = col("n") * col("vq") - col("s")
      val a = d.cast("decimal(38,0)") * d.cast("decimal(38,0)")
      val cv = col("n").cast("decimal(38,0)") * col("ssq").cast("decimal(38,0)") -
        col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)")
      scored
        .withColumn("anom",
          when(col("n") >= ZMinN && cv > lit(0) &&
            a > lit(ZThresh * ZThresh) * cv, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("anom")).as("n_anom"),
          sum(col("anom") * col("event_id")).as("anom_id_sum"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      q AS (SELECT user_id, event_id, tus,
              CAST(round(value * 1000000.0) AS BIGINT) AS vq FROM ev),
      w AS (SELECT user_id, event_id, vq,
              count(*) OVER win AS n,
              sum(vq) OVER win AS s,
              sum(vq * vq) OVER win AS ssq
            FROM q
            WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
                           ROWS BETWEEN $ZFrame PRECEDING AND 1 PRECEDING)),
      a AS (SELECT user_id, event_id,
              CASE WHEN n >= $ZMinN
                    AND CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s > 0
                    AND CAST(n * vq - s AS HUGEINT) * CAST(n * vq - s AS HUGEINT) >
                        ${ZThresh * ZThresh} *
                        (CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s)
                   THEN 1 ELSE 0 END AS anom
            FROM w)
      SELECT user_id, count(*) AS n_events,
             CAST(sum(anom) AS BIGINT) AS n_anom,
             CAST(sum(anom * event_id) AS BIGINT) AS anom_id_sum
      FROM a GROUP BY 1
      ORDER BY user_id ASC NULLS FIRST"""))

  // --- E6f: ordered conversion funnel -----------------------------------
  // The product-analytics staple: how many users complete
  // signup -> view -> click -> purchase IN ORDER (each stage strictly
  // after the user's earliest completion of the previous stage).
  // Sequential dependence means stage k's timestamp is defined off
  // stage k-1's min — expressed as a CHAIN of per-user conditional min
  // aggregates (filter -> join on user_id -> min), not a per-user
  // sorted buffer: each link is a codegen'd hash agg + hash join keyed
  // on user_id, and by construction stage k's user set shrinks, so the
  // join's build side only gets smaller down the chain.
  //
  // 100 TB posture: every exchange in the chain hashes on user_id
  // (high cardinality), and AQE reuses the partitioning between the
  // agg and the next join — no corpus-global sort, no whole-group
  // collection. The final 4-row stage table uses a window for the
  // prev-stage conversion ratio, over EXACTLY 4 rows (constant, not
  // data-scaled). Ratios guard the 0-denominator corner (CASE, not
  // engine-specific inf/NaN).
  private val FunnelStages = Seq("signup", "view", "click", "purchase")
  private val q94 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(spark, dir)
        .select(col("user_id"), col("event_type"), col("tus"))
      // stage 1: earliest signup per user; stage k: earliest type-k
      // event STRICTLY after the user's stage k-1 time.
      val stage1 = ev.filter(col("event_type") === FunnelStages.head)
        .groupBy(col("user_id")).agg(min(col("tus")).as("t"))
      val stages = FunnelStages.tail.scanLeft(stage1) { (prev, st) =>
        ev.filter(col("event_type") === st)
          .join(prev.select(col("user_id"), col("t").as("tp")), Seq("user_id"))
          .filter(col("tus") > col("tp"))
          .groupBy(col("user_id")).agg(min(col("tus")).as("t"))
      }
      val counts = stages.zip(FunnelStages).zipWithIndex.map {
        case ((df, st), i) =>
          df.agg(count(lit(1)).cast("long").as("n_users"))
            .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"),
              col("n_users"))
      }.reduce(_.unionByName(_))
      val w = Window.orderBy(col("stage_idx")) // 4 rows — constant size
      counts
        .withColumn("n_prev", lag(col("n_users"), 1).over(w))
        .withColumn("n_first", first(col("n_users")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("stage_idx"), col("stage"), col("n_users"),
          when(col("n_prev") > 0,
            col("n_users").cast("double") / col("n_prev").cast("double"))
            .as("conv_vs_prev"),
          when(col("n_first") > 0,
            col("n_users").cast("double") / col("n_first").cast("double"))
            .as("conv_vs_first"))
        .orderBy(col("stage_idx"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      s1 AS (SELECT user_id, min(tus) AS t FROM ev
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT ev.user_id, min(ev.tus) AS t
             FROM ev JOIN s1 ON ev.user_id = s1.user_id
             WHERE ev.event_type = 'view' AND ev.tus > s1.t GROUP BY 1),
      s3 AS (SELECT ev.user_id, min(ev.tus) AS t
             FROM ev JOIN s2 ON ev.user_id = s2.user_id
             WHERE ev.event_type = 'click' AND ev.tus > s2.t GROUP BY 1),
      s4 AS (SELECT ev.user_id, min(ev.tus) AS t
             FROM ev JOIN s3 ON ev.user_id = s3.user_id
             WHERE ev.event_type = 'purchase' AND ev.tus > s3.t GROUP BY 1),
      c AS (SELECT 1 AS stage_idx, 'signup' AS stage, count(*) AS n_users FROM s1
            UNION ALL SELECT 2, 'view', count(*) FROM s2
            UNION ALL SELECT 3, 'click', count(*) FROM s3
            UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
      SELECT stage_idx, stage, n_users,
             CASE WHEN lag(n_users) OVER w > 0
                  THEN CAST(n_users AS DOUBLE) / CAST(lag(n_users) OVER w AS DOUBLE)
             END AS conv_vs_prev,
             CASE WHEN first_value(n_users) OVER w > 0
                  THEN CAST(n_users AS DOUBLE)
                       / CAST(first_value(n_users) OVER w AS DOUBLE)
             END AS conv_vs_first
      FROM c
      WINDOW w AS (ORDER BY stage_idx ASC NULLS FIRST
                   ROWS UNBOUNDED PRECEDING)
      ORDER BY stage_idx ASC NULLS FIRST"""))

  // --- E6g: weekly cohort retention -------------------------------------
  // Users are cohorted by the ISO week of their FIRST event; retention
  // is the share of each cohort active again k weeks later. The other
  // product-analytics staple, and a pure two-hash-agg shape: first-seen
  // per user, join activity back on user_id, distinct
  // (cohort, offset, user), then count — every exchange keyed on
  // user_id or the tiny (cohort, offset) pair. Cohort sizes (one row
  // per week) broadcast back for the ratio.
  //
  // Week truncation is Monday-based in both engines (date_trunc
  // 'week'); the offset divides an exact multiple of 7 days, so it is
  // integer-exact, never a double.
  private val q95 = Q(
    (spark, dir) => {
      val ev = events(spark, dir)
        .select(col("user_id"), to_date(date_trunc("week", col("tus"))).as("wk"))
      val firstWk = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_week"))
      val active = ev.join(firstWk, Seq("user_id"))
        .select(col("user_id"), col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
            .as("week_offset"))
        .distinct()
      val ret = active.groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = firstWk.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("cohort_size"))
      ret.join(broadcast(sizes), Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
          col("n_active"),
          (col("n_active").cast("double") / col("cohort_size").cast("double"))
            .as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      a AS (SELECT user_id, CAST(date_trunc('week', tus) AS DATE) AS wk FROM ev),
      f AS (SELECT user_id, min(wk) AS cohort_week FROM a GROUP BY 1),
      act AS (SELECT DISTINCT a.user_id, f.cohort_week,
                     CAST((a.wk - f.cohort_week) // 7 AS INTEGER) AS week_offset
              FROM a JOIN f ON a.user_id = f.user_id),
      r AS (SELECT cohort_week, week_offset, count(*) AS n_active
            FROM act GROUP BY 1, 2),
      s AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1)
      SELECT r.cohort_week, r.week_offset, s.cohort_size, r.n_active,
             CAST(r.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
               AS retention
      FROM r JOIN s ON r.cohort_week = s.cohort_week
      ORDER BY r.cohort_week ASC NULLS FIRST, week_offset ASC NULLS FIRST"""))

  // --- E6h: event-type transition matrix (first-order Markov) -----------
  // P(next event type | current type) from each user's time-ordered
  // event sequence — the behavioral fingerprint behind bot filtering
  // and session modeling (the event-stream sibling of q89's text
  // bigram LM). lead() over (user_id, time, event_id): a
  // HIGH-cardinality window partition (one user = one tiny group), so
  // the sort is embarrassingly parallel — then a 25-row transition
  // count table; row totals BROADCAST back for the conditional
  // probability (no low-cardinality window over data-scaled rows).
  private val q96 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val pairs = events(spark, dir)
        .select(col("user_id"), col("event_id"), col("tus"),
          col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
      val counts = pairs.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      counts.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          col("n_from"),
          (col("n").cast("double") / col("n_from").cast("double")).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      p AS (SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY tus ASC NULLS FIRST, event_id ASC NULLS FIRST)
                     AS to_type
            FROM ev),
      c AS (SELECT from_type, to_type, count(*) AS n FROM p
            WHERE to_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n, t.n_from,
             CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
      FROM c JOIN t ON c.from_type = t.from_type
      ORDER BY c.from_type ASC NULLS FIRST, to_type ASC NULLS FIRST"""))

  // --- TS1: calendar gap-fill + forward-fill ----------------------------
  // The macro-series staple the reference's monthly pipeline implies but
  // never materializes: regularize an irregular series onto a dense
  // calendar and carry the last observation forward across gaps
  // (LOCF — what a CPI/Selic join does with late months). Per event
  // type: daily value sums (quantized cents, so the series itself is
  // integer-exact), joined onto the full min..max day calendar; gap
  // days take last_value IGNORE NULLS. Output stays BIGINT-only
  // (per-type day/gap accounting + carried-total checksum) so the
  // ffill path is hash-checked without a single double.
  //
  // 100 TB posture: the raw scan folds to (type, day) rows FIRST — the
  // window then runs over calendar-bounded rows (days x types), not
  // corpus-scaled data; partition count equals the series count (at
  // real scale: millions of series ids, one tiny sorted group each).
  // The one-row calendar agg broadcasts into the sequence explode.
  private val q97 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("cents"))
      val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val cal = span.select(explode(expr(
        "sequence(d0, d1, interval 1 day)")).as("day"))
        .crossJoin(daily.select(col("event_type")).distinct())
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(daily, Seq("event_type", "day"), "left")
        .withColumn("ffill", last(col("cents"), ignoreNulls = true).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          count(col("cents")).as("n_obs_days"),
          sum(when(col("cents").isNull, 1L).otherwise(0L)).as("n_gap_days"),
          sum(col("cents")).as("observed_cents"),
          coalesce(sum(when(col("cents").isNull, col("ffill"))), lit(0L))
            .as("carried_cents"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
        FROM ev GROUP BY 1, 2),
      span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      cal AS (
        SELECT t.event_type, CAST(g.day AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                    FROM span) g),
      f AS (
        SELECT cal.event_type, cal.day, daily.cents,
               last_value(daily.cents IGNORE NULLS) OVER (
                 PARTITION BY cal.event_type ORDER BY cal.day ASC NULLS FIRST
                 ROWS UNBOUNDED PRECEDING) AS ffill
        FROM cal LEFT JOIN daily
          ON daily.event_type = cal.event_type AND daily.day = cal.day)
      SELECT event_type, count(*) AS n_days,
             count(cents) AS n_obs_days,
             CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gap_days,
             CAST(sum(cents) AS BIGINT) AS observed_cents,
             COALESCE(CAST(sum(CASE WHEN cents IS NULL THEN ffill END) AS BIGINT),
                      CAST(0 AS BIGINT)) AS carried_cents
      FROM f GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""))

  // --- TS3: cross-series Pearson correlation matrix ---------------------
  // Which daily series move together — the macro-analyst's co-movement
  // matrix (Selic vs IPCA in the reference's domain), over the five
  // event-type daily cents series. ALL moments accumulate as exact
  // BIGINT sums over the quantized series (order-free); r's numerator
  // and denominators are computed in int64 and cast to double ONCE,
  // with the multiply/sqrt/divide order pinned identically in both
  // engines. Days where either side has no observation are excluded by
  // the inner join (pairwise-complete, the standard rule).
  //
  // Envelope: |cents| <= ~2.5e6/day here, so n*sab <= ~1e18 fits int64
  // with 9x headroom at sf0.1; at real scale widen the moment sums to
  // DECIMAL(38,0) (exactIntSum discipline) before the double cast.
  //
  // 100 TB posture: corpus folds to (series, day) once; the pair join
  // is calendar x series^2 — sketch-sized relative to the scan. Zero
  // variance (constant series) yields NULL r via the guard, not a
  // division blowup.
  private val q99 = Q(
    (spark, dir) => {
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("cents"))
      val a = daily.select(col("event_type").as("type_a"), col("day"),
        col("cents").as("ya"))
      val b = daily.select(col("event_type").as("type_b"), col("day"),
        col("cents").as("yb"))
      val m = a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n"),
          sum(col("ya")).as("sa"), sum(col("yb")).as("sb"),
          sum(col("ya") * col("yb")).as("sab"),
          sum(col("ya") * col("ya")).as("saa"),
          sum(col("yb") * col("yb")).as("sbb"))
      val num = col("n") * col("sab") - col("sa") * col("sb")
      val da = col("n") * col("saa") - col("sa") * col("sa")
      val db = col("n") * col("sbb") - col("sb") * col("sb")
      m.select(col("type_a"), col("type_b"), col("n").as("n_days"),
        when(da > 0 && db > 0,
          num.cast("double") /
            (sqrt(da.cast("double")) * sqrt(db.cast("double")))).as("r"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
        FROM ev GROUP BY 1, 2),
      m AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a.cents) AS BIGINT) AS sa,
               CAST(sum(b.cents) AS BIGINT) AS sb,
               CAST(sum(a.cents * b.cents) AS BIGINT) AS sab,
               CAST(sum(a.cents * a.cents) AS BIGINT) AS saa,
               CAST(sum(b.cents * b.cents) AS BIGINT) AS sbb
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n AS n_days,
             CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
                  THEN CAST(n * sab - sa * sb AS DOUBLE)
                       / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                          * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
             END AS r
      FROM m ORDER BY type_a ASC NULLS FIRST, type_b ASC NULLS FIRST"""))

  // --- TS4: fixed-grid equi-width histogram -----------------------------
  // The distribution-shape profiler beside q60's moments and q66's
  // quantiles: value counts per event type over a FIXED [0, 1000) grid
  // of 20 bins (50.00-wide, cents-integer edges). Fixed, data-
  // independent edges are the scale-honest choice: the bin index is a
  // pure map-side floor division (one hash agg total, no pre-pass for
  // min/max), results merge across corpus slices by simple addition,
  // and the same grid stays comparable across days/sources — the
  // monitoring property data-derived edges lose. Out-of-range values
  // clamp to the edge bins (underflow -> 0, overflow -> 19), counted
  // there like every production histogram does.
  private val HistBins = 20
  private val HistWidthCents = 5000L // 50.00 per bin over [0, 1000)
  private val q100 = Q(
    (spark, dir) => {
      val cents = Exact.quantize(col("value"))
      val bin = least(lit(HistBins - 1L),
        greatest(lit(0L), floor(cents / lit(HistWidthCents).cast("double"))
          .cast("long"))).as("bin")
      val counts = events(spark, dir)
        .select(col("event_type"), bin)
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_type"))
      counts.join(broadcast(totals), Seq("event_type"))
        .select(col("event_type"), col("bin"),
          (col("bin") * lit(HistWidthCents)).as("lo_cents"),
          col("n"),
          (col("n").cast("double") / col("n_type").cast("double")).as("share"))
        .orderBy(col("event_type"), col("bin"))
    },
    Some(s"""
      WITH b AS (
        SELECT event_type,
               least(${HistBins - 1}, greatest(0, CAST(floor(
                 CAST(round(value * 100.0) AS BIGINT)
                   / CAST($HistWidthCents AS DOUBLE)) AS BIGINT))) AS bin
        FROM events),
      c AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
            FROM c GROUP BY 1)
      SELECT c.event_type, c.bin, CAST(c.bin * $HistWidthCents AS BIGINT)
               AS lo_cents, c.n,
             CAST(c.n AS DOUBLE) / CAST(t.n_type AS DOUBLE) AS share
      FROM c JOIN t ON c.event_type = t.event_type
      ORDER BY c.event_type ASC NULLS FIRST, c.bin ASC NULLS FIRST"""))

  // --- TS5: monthly seasonality index ------------------------------------
  // The ratio every macro release is deflated by: per series, each
  // calendar month's mean value relative to the series' overall mean.
  // Both means are ratios of exact integer sums, so the index is ONE
  // double division of two exact int64 products per output row:
  // idx = (s_m · n_t) / (n_m · s_t) — identical association in both
  // engines, no accumulated float drift. Two hash aggs + a
  // series-cardinality broadcast join; nothing after the first fold
  // scales with the data.
  private val q101 = Q(
    (spark, dir) => {
      val base = events(spark, dir).select(col("event_type"),
        month(col("tus")).as("moy"), Exact.quantize(col("value")).as("cents"))
      val m = base.groupBy(col("event_type"), col("moy"))
        .agg(count(lit(1)).as("n_m"), sum(col("cents")).as("s_m"))
      val t = base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_t"), sum(col("cents")).as("s_t"))
      m.join(broadcast(t), Seq("event_type"))
        .select(col("event_type"), col("moy"), col("n_m").as("n_events"),
          col("s_m").as("sum_cents"),
          when(col("n_m") * col("s_t") =!= 0L,
            (col("s_m") * col("n_t")).cast("double") /
              (col("n_m") * col("s_t")).cast("double")).as("seasonal_idx"))
        .orderBy(col("event_type"), col("moy"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      b AS (SELECT event_type, month(tus) AS moy,
                   CAST(round(value * 100.0) AS BIGINT) AS cents FROM ev),
      m AS (SELECT event_type, moy, CAST(count(*) AS BIGINT) AS n_m,
                   CAST(sum(cents) AS BIGINT) AS s_m
            FROM b GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
                   CAST(sum(cents) AS BIGINT) AS s_t
            FROM b GROUP BY 1)
      SELECT m.event_type, m.moy, m.n_m AS n_events, m.s_m AS sum_cents,
             CASE WHEN m.n_m * t.s_t <> 0
                  THEN CAST(m.s_m * t.n_t AS DOUBLE)
                       / CAST(m.n_m * t.s_t AS DOUBLE)
             END AS seasonal_idx
      FROM m JOIN t ON m.event_type = t.event_type
      ORDER BY m.event_type ASC NULLS FIRST, moy ASC NULLS FIRST"""))

  // --- TS6: CUSUM level-shift detection ----------------------------------
  // Where did the series break? The classic one-sided CUSUM against
  // the series' own mean, made integer-exact by SCALING instead of
  // dividing: dev_t = x_t·n − Σx (so Σ dev = 0 exactly and no mean
  // division ever happens); S_t = prefix sum of dev; the upward CUSUM
  // is C_t = S_t − min_{i≤t} S_i. The changepoint is the day of the
  // maximal C_t (earliest day on ties). Every quantity is int64
  // (|S_t| ≤ n·max|dev| — ~4e11 here, 2^63 headroom ~10^7x); the one
  // double in the output unscales max C by n once, in pinned order.
  //
  // 100 TB posture: the scan folds to (series, day) rows first; the
  // three windows (prefix sum, running min, group max) all partition
  // per series over CALENDAR-bounded rows — at real scale millions of
  // independent tiny sort groups (the q79 posture), never the raw
  // corpus through a low-cardinality funnel.
  private val q102 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("x"))
      val byType = Window.partitionBy(col("event_type"))
      val stats = daily.withColumn("n", count(lit(1)).over(byType))
        .withColumn("sx", sum(col("x")).over(byType))
      val ordered = byType.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cusum = stats
        .withColumn("s", sum(col("x") * col("n") - col("sx")).over(ordered))
        .withColumn("c", col("s") - min(col("s")).over(ordered))
      cusum.withColumn("cmax", max(col("c")).over(byType))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_days"),
          max(col("cmax")).as("max_cusum_scaled"),
          min(when(col("c") === col("cmax"), col("day"))).as("cp_day"))
        .select(col("event_type"), col("n_days"), col("max_cusum_scaled"),
          (col("max_cusum_scaled").cast("double") /
            col("n_days").cast("double") / lit(100.0)).as("max_cusum"),
          col("cp_day"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
        FROM ev GROUP BY 1, 2),
      st AS (
        SELECT event_type, day, x,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx
        FROM daily),
      cs AS (
        SELECT event_type, day, n,
               CAST(sum(x * n - sx) OVER w AS BIGINT) AS s
        FROM st
        WINDOW w AS (PARTITION BY event_type ORDER BY day ASC NULLS FIRST
                     ROWS UNBOUNDED PRECEDING)),
      cm AS (
        SELECT event_type, day, n,
               s - CAST(min(s) OVER w AS BIGINT) AS c
        FROM cs
        WINDOW w AS (PARTITION BY event_type ORDER BY day ASC NULLS FIRST
                     ROWS UNBOUNDED PRECEDING)),
      fin AS (
        SELECT event_type, day, n, c,
               CAST(max(c) OVER (PARTITION BY event_type) AS BIGINT) AS cmax
        FROM cm)
      SELECT event_type, max(n) AS n_days,
             max(cmax) AS max_cusum_scaled,
             CAST(max(cmax) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 100.0
               AS max_cusum,
             min(CASE WHEN c = cmax THEN day END) AS cp_day
      FROM fin GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""))

  // --- TS7: rolling 7-day window by RANGE frame --------------------------
  // The trailing-calendar-week aggregate q79's ROWS frame cannot
  // express: RANGE BETWEEN 6 PRECEDING AND CURRENT ROW over the
  // integer epoch-day orders by VALUE, so calendar gaps shrink the
  // window's row count instead of silently reaching further back —
  // the correct semantics for irregular daily series. Output is the
  // peak trailing week per series (max rolling sum + its end day,
  // earliest on ties), BIGINT-only.
  //
  // 100 TB posture: the scan folds to (series, day) first; the range
  // window partitions per series over calendar-bounded rows (the
  // q97/q102 posture) — one shuffle on series.
  private val q105 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("x"))
        .withColumn("d", datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("long"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rangeBetween(-6, Window.currentRow)
      val byType = Window.partitionBy(col("event_type"))
      val rolled = daily
        .withColumn("roll7", sum(col("x")).over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
      rolled.withColumn("mx", max(col("roll7")).over(byType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          max(col("mx")).as("peak_week_cents"),
          min(when(col("roll7") === col("mx"), col("day")))
            .as("peak_week_end"),
          max(col("n7")).as("max_days_in_window"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
               CAST(CAST(tus AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        FROM ev GROUP BY 1, 2),
      r AS (
        SELECT event_type, day,
               CAST(sum(x) OVER w7 AS BIGINT) AS roll7,
               CAST(count(*) OVER w7 AS BIGINT) AS n7
        FROM daily
        WINDOW w7 AS (PARTITION BY event_type ORDER BY d ASC NULLS FIRST
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
      m AS (
        SELECT event_type, day, roll7, n7,
               CAST(max(roll7) OVER (PARTITION BY event_type) AS BIGINT) AS mx
        FROM r)
      SELECT event_type, count(*) AS n_days,
             max(mx) AS peak_week_cents,
             min(CASE WHEN roll7 = mx THEN day END) AS peak_week_end,
             max(n7) AS max_days_in_window
      FROM m GROUP BY 1 ORDER BY event_type ASC NULLS FIRST"""))

  // --- q123: exact trailing-7-day distinct users (rolling DAU/WAU) ------
  // The engagement metric every product dashboard carries. Exact
  // sliding-window COUNT DISTINCT cannot use a plain window frame (the
  // distinct set is not decomposable); the scale-correct exact form is
  // CONTRIBUTION FANOUT: dedup to (user, day) — the grain the metric is
  // defined on — then each user-day contributes to its next 7 report
  // days (a map-side explode, x7 = window width, never x rows), and a
  // two-phase distinct aggregate folds per report day. Work is
  // O(window x |user-days|), shuffles on (day, user) — no corpus-sized
  // window partition, no quadratic day-pair join. (The sketched
  // alternative — mergeable per-day KMV unioned over the window, q58's
  // operator — trades exactness for O(k) state; this is the exact
  // baseline it would be judged against.)
  private val q123 = Q(
    (spark, dir) => {
      val ud = events(spark, dir)
        .select(col("user_id"), to_date(col("tus")).as("day")).distinct()
      val days = ud.select(col("day")).distinct()
      val contrib = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("j"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("j")).as("day"))
      val wau = contrib.join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau7"))
      val dau = ud.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau7"))
        .orderBy(col("day").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      ud AS (SELECT DISTINCT user_id, CAST(tus AS DATE) AS day FROM ev),
      days AS (SELECT DISTINCT day FROM ud),
      contrib AS (SELECT user_id, day + CAST(j AS INTEGER) AS day
                  FROM ud CROSS JOIN (SELECT unnest(range(7)) AS j) j),
      wau AS (SELECT c.day, count(DISTINCT c.user_id) AS wau7
              FROM contrib c WHERE c.day IN (SELECT day FROM days)
              GROUP BY 1),
      dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
      SELECT dau.day, dau.dau, wau.wau7
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY dau.day ASC"""))

  // --- q124: multi-touch attribution (linear, integer-exact) ------------
  // Each purchase's cents split equally across the user's touch events
  // (view/click) since their previous purchase; floor-division
  // remainder goes to the EARLIEST touch (stated rule, so the split is
  // exact and deterministic); conversions with no touches attribute to
  // 'direct'. The conversion grouping is ONE reverse-cumulative window
  // per user (conv_seq = purchases at-or-after the row) — the event
  // stream shuffles once on user_id, sort groups are per-user event
  // counts, and everything downstream is (user, conv_seq)-keyed
  // aggregates + one broadcast-sized stats join. Conservation holds by
  // construction: Σ attributed = Σ converted cents (smoke-asserted).
  private val q124 = Q(
    (spark, dir) => {
      // kernel lives in operators/Attribution so the streaming twin
      // (AttributionStream) shares one definition by construction
      operators.Attribution.linearTotals(
          events(spark, dir).select(col("user_id"), col("tus"),
            col("event_id"), col("event_type"),
            Exact.quantize(col("value")).as("cents")))
        .orderBy(col("channel").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      e AS (SELECT user_id, tus, event_id, event_type,
                   CAST(round(value * 100.0) AS BIGINT) AS cents
            FROM ev WHERE event_type IN ('view', 'click', 'purchase')
              AND CAST(round(value * 100.0) AS BIGINT) >= 0),
      g AS (SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id
                              ORDER BY tus DESC, event_id DESC
                              ROWS UNBOUNDED PRECEDING) AS conv_seq
            FROM e),
      gg AS (SELECT * FROM g WHERE conv_seq >= 1),
      convs AS (SELECT user_id, conv_seq, cents FROM gg
                WHERE event_type = 'purchase'),
      touches AS (SELECT user_id, conv_seq, tus, event_id, event_type,
                         row_number() OVER (PARTITION BY user_id, conv_seq
                                            ORDER BY tus ASC, event_id ASC)
                           AS trk
                  FROM gg WHERE event_type <> 'purchase'),
      tstats AS (SELECT user_id, conv_seq, count(*) AS n_touch
                 FROM touches GROUP BY 1, 2),
      joined AS (SELECT c.user_id, c.conv_seq, c.cents, t.n_touch
                 FROM convs c LEFT JOIN tstats t
                   ON c.user_id = t.user_id AND c.conv_seq = t.conv_seq),
      direct AS (SELECT 'direct' AS channel, count(*) AS n_attr,
                        CAST(sum(cents) AS BIGINT) AS attr_cents
                 FROM joined WHERE n_touch IS NULL),
      attributed AS (
        SELECT t.event_type AS channel, count(*) AS n_attr,
               CAST(sum(j.cents // j.n_touch +
                 CASE WHEN t.trk = 1
                      THEN j.cents - (j.cents // j.n_touch) * j.n_touch
                      ELSE 0 END) AS BIGINT) AS attr_cents
        FROM touches t JOIN joined j
          ON t.user_id = j.user_id AND t.conv_seq = j.conv_seq
          AND j.n_touch IS NOT NULL
        GROUP BY 1)
      SELECT channel, n_attr, attr_cents FROM attributed
      UNION ALL
      SELECT channel, n_attr, attr_cents FROM direct WHERE n_attr > 0
      ORDER BY channel ASC"""))

  // --- q126: top converting paths (ordered event-type sequences) --------
  // "Which journeys do users actually take?" — the path report behind
  // q94's fixed funnel: per (user, day), the time-ordered event-type
  // sequence as a '>'-joined string, then the 10 most common paths.
  // collect_list buffers ONE user-day's events (bounded by per-user
  // daily activity, never corpus-sized); array_sort on (tus, event_id)
  // structs makes the order total, so the path string is deterministic
  // and the oracle states it as string_agg(... ORDER BY tus, event_id).
  // Top-10 compiles to TakeOrderedAndProject over the path counts —
  // |distinct paths| rows, no global sort.
  private val q126 = Q(
    (spark, dir) => {
      val s = events(spark, dir).select(col("user_id"),
        to_date(col("tus")).as("day"), col("tus"), col("event_id"),
        col("event_type"))
      val paths = s.groupBy(col("user_id"), col("day"))
        .agg(expr("array_join(transform(array_sort(collect_list(" +
          "struct(tus, event_id, event_type))), x -> x.event_type), '>')")
          .as("path"))
      paths.groupBy(col("path"))
        .agg(count(lit(1)).as("n_user_days"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_user_days").desc, col("path").asc)
        .limit(10)
    },
    Some(s"""
      WITH $eventsSqlCte,
      paths AS (
        SELECT user_id, CAST(tus AS DATE) AS day,
               string_agg(event_type, '>' ORDER BY tus ASC, event_id ASC)
                 AS path
        FROM ev GROUP BY 1, 2)
      SELECT path, count(*) AS n_user_days,
             count(DISTINCT user_id) AS n_users
      FROM paths GROUP BY 1
      ORDER BY n_user_days DESC NULLS LAST, path ASC
      LIMIT 10"""))

  // --- q127: event debounce (keep-first within burst sessions) ----------
  // Telemetry dedup: repeated (user, type) events chaining closer than
  // 60 s are one burst; only the burst's first event is kept. Bursts
  // ARE session windows per (user_id, event_type) — the chain rule
  // (each event extends the window) is exactly debounce semantics, so
  // the kept event is min(tus, event_id) per session and the oracle
  // replays it with the q30 lag+cumsum island form. Scale: one shuffle
  // on the high-cardinality (user, type) key; session state is
  // per-group and time-bounded (this is also the streaming-ready
  // shape — session_window works under watermarks unchanged).
  private val q127 = Q(
    (spark, dir) => {
      events(spark, dir)
        .groupBy(session_window(col("tus"), "60 seconds"), col("user_id"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          Exact.exactIntSum(col("n")).cast("long").as("n_events"))
        .select(col("event_type"), col("n_events"), col("n_kept"),
          (col("n_events") - col("n_kept")).as("n_dropped"))
        .orderBy(col("event_type").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      g AS (
        SELECT user_id, event_type, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > INTERVAL 60 SECOND
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY tus ASC NULLS FIRST)),
      s AS (
        SELECT user_id, event_type,
               sum(is_new) OVER (PARTITION BY user_id, event_type
                                 ORDER BY tus ASC NULLS FIRST
                                 ROWS UNBOUNDED PRECEDING) AS burst
        FROM g),
      b AS (SELECT event_type, count(*) AS n
            FROM s GROUP BY event_type, user_id, burst)
      SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
             count(*) AS n_kept,
             CAST(sum(n) AS BIGINT) - count(*) AS n_dropped
      FROM b GROUP BY 1 ORDER BY event_type ASC"""))

  // --- q129: sliding-window distinct via MERGEABLE KMV sketches ---------
  // The scale path q123's exact fanout is judged against: exact
  // trailing-window COUNT DISTINCT pays O(window x user-days) and a
  // distinct aggregate per day; the sketch form carries ONE bottom-k
  // array per day (k longs), and the window union is a bottom-k merge
  // of ≤ 7 sketches — valid because bottom-k of a union equals
  // bottom-k of the per-day bottom-k's union (every one of the k
  // smallest of the union is in its own day's bottom-k). At 100 TB the
  // per-day state is k longs regardless of users; only the one
  // (user, day) dedup scan grows. Both the exact count and the
  // estimate ship in the output, so the error is observable row by
  // row. k = 16 keeps the estimator branch (not just the exact-below-k
  // branch) exercised at the sf0.01 oracle scale. Shares the q58/q61
  // Kmv algebra by construction (operators/Kmv — single-sketch
  // discipline), and the oracle replays hash/rank/estimate verbatim.
  private val WkmvK = 16

  private val q129 = Q(
    (spark, dir) => {
      import graft.operators.Kmv
      val ud = events(spark, dir)
        .select(col("user_id"), to_date(col("tus")).as("day")).distinct()
        .localCheckpoint() // feeds the sketch side AND the exact side
      val days = ud.select(col("day")).distinct()
      val perDay = ud
        .select(col("day"),
          Kmv.hash60(col("user_id").cast("string")).as("hv"))
        .groupBy(col("day")).agg(Kmv.sketch(col("hv"), WkmvK).as("kmv"))
      val winSketch = perDay
        .select(explode(sequence(lit(0), lit(6))).as("j"), col("day"), col("kmv"))
        .select(date_add(col("day"), col("j")).as("day"), col("kmv"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        // ≤ 7 arrays of ≤ k longs per group: bounded collect, then the
        // bottom-k-of-union trim (the Kmv.mergeArrays law, n-ary)
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, WkmvK).as("kmv"))
      val exact = ud
        .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("j"),
          col("day"))
        .select(col("user_id"), date_add(col("day"), col("j")).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau7"))
      exact.join(winSketch, Seq("day"))
        .select(col("day"), col("wau7"),
          size(col("kmv")).cast("long").as("kmv_n"),
          element_at(col("kmv"), -1).as("kmv_kth"),
          Kmv.estimate(col("kmv"), WkmvK).as("est_wau7"))
        .orderBy(col("day").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      ud AS (SELECT DISTINCT user_id, CAST(tus AS DATE) AS day FROM ev),
      days AS (SELECT DISTINCT day FROM ud),
      win AS (SELECT d.day AS rday, u.user_id
              FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day),
      exact AS (SELECT rday, count(DISTINCT user_id) AS wau7
                FROM win GROUP BY 1),
      h AS (SELECT DISTINCT rday,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                     AS BIGINT) AS hv
            FROM win),
      r AS (SELECT rday, hv,
                   row_number() OVER (PARTITION BY rday ORDER BY hv ASC) AS rn
            FROM h),
      kv AS (SELECT rday, count(*) AS kmv_n, max(hv) AS kmv_kth
             FROM r WHERE rn <= $WkmvK GROUP BY 1)
      SELECT e.rday AS day, e.wau7, kv.kmv_n, kv.kmv_kth,
             CASE WHEN kv.kmv_n < $WkmvK THEN CAST(kv.kmv_n AS DOUBLE)
                  ELSE ${WkmvK - 1}.0 * 1152921504606846976.0
                       / CAST(kv.kmv_kth AS DOUBLE) END AS est_wau7
      FROM exact e JOIN kv ON e.rday = kv.rday
      ORDER BY day ASC"""))

  // --- q131: PERSONALIZED PageRank (seed-teleport affinity) -------------
  // "Which users are closest to purchasing?" — q76's integer PageRank
  // with initial mass and teleport restricted to a seed (the
  // 't:purchase' node of the user/event-type bipartite graph), so
  // ranks become seed AFFINITY instead of global centrality (the
  // recommendation/expansion primitive). Same fixed-iteration integer
  // replay discipline: the oracle unrolls the three iterations with
  // the seed CASE in the init and teleport terms; plan shape is
  // unchanged from q76 (one edges⋈ranks shuffle + one agg per
  // iteration).
  private val PprSeed = "t:purchase"

  private val q131 = Q(
    (spark, dir) => {
      val s = spark
      import s.implicits._
      val pairs = Tables.events(spark, dir)
        .select(concat(lit("u:"), col("user_id").cast("string")).as("u"),
          concat(lit("t:"), col("event_type")).as("t"))
        .distinct()
      val edges = pairs.select(col("u").as("s"), col("t").as("d"))
        .unionByName(pairs.select(col("t").as("s"), col("u").as("d")))
      operators.GraphOps.pageRankInt(edges, "s", "d", iters = 3,
          seeds = Some(Seq(PprSeed).toDF("node")))
        .filter(col("node").startsWith("u:"))
        .orderBy(col("rank").desc_nulls_last, col("node"))
        .limit(20)
    },
    Some(s"""
      WITH pairs AS (
        SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
               't:' || event_type AS t
        FROM events),
      e AS (SELECT u AS s, t AS d FROM pairs
            UNION ALL
            SELECT t AS s, u AS d FROM pairs),
      deg AS (SELECT s, count(*) AS od FROM e GROUP BY 1),
      r0 AS (SELECT s AS node,
                    CAST(CASE WHEN s = '$PprSeed' THEN 1000000 ELSE 0 END
                      AS BIGINT) AS rank
             FROM deg),
      c1 AS (SELECT e.d, sum(r.rank // g.od) AS m
             FROM e JOIN r0 r ON e.s = r.node JOIN deg g ON e.s = g.s
             GROUP BY 1),
      r1 AS (SELECT g.s AS node,
                    CAST(CASE WHEN g.s = '$PprSeed' THEN 150000 ELSE 0 END
                         + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS rank
             FROM deg g LEFT JOIN c1 c ON g.s = c.d),
      c2 AS (SELECT e.d, sum(r.rank // g.od) AS m
             FROM e JOIN r1 r ON e.s = r.node JOIN deg g ON e.s = g.s
             GROUP BY 1),
      r2 AS (SELECT g.s AS node,
                    CAST(CASE WHEN g.s = '$PprSeed' THEN 150000 ELSE 0 END
                         + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS rank
             FROM deg g LEFT JOIN c2 c ON g.s = c.d),
      c3 AS (SELECT e.d, sum(r.rank // g.od) AS m
             FROM e JOIN r2 r ON e.s = r.node JOIN deg g ON e.s = g.s
             GROUP BY 1),
      r3 AS (SELECT g.s AS node,
                    CAST(CASE WHEN g.s = '$PprSeed' THEN 150000 ELSE 0 END
                         + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS rank
             FROM deg g LEFT JOIN c3 c ON g.s = c.d)
      SELECT node, rank FROM r3
      WHERE node LIKE 'u:%'
      ORDER BY rank DESC NULLS LAST, node ASC NULLS FIRST
      LIMIT 20"""))

  // --- q140: exponential moving average, integer-exact ------------------
  // The smoothing every metrics dashboard ships; floats make it
  // layout-dependent, so this is the EXACT finite-window form: with
  // decay 1/2 over the last W=16 observations,
  //   ema_n = (sum_j x_{n-j} * 2^(W-1-j)) / (sum_j 2^(W-1-j))
  // — numerator and denominator are BIGINTs built from W row-based lags
  // over ONE window pass (missing lags at a series head contribute 0 to
  // both), and the single final division is the only double. Weights
  // beyond lag 15 are < 2^-16 of the total — the same tail the float
  // recurrence forgets. Long envelope: 2^15 * W * max|x_cents| < 2^63
  // for any realistic cents scale.
  //
  // 100 TB posture: the scan folds to (series, day) grain first, then
  // one shuffle on the series key and one per-series sort serve all 16
  // lag expressions (a single WindowExec — lags share the frame). No
  // self-join fan-out, no collect_list materialization. The streaming
  // twin (streaming/EmaStream) folds the same weights from a 16-slot
  // ring buffer per key.
  private val EmaW = streaming.EmaStream.Window
  private val q140 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val num = (0 until EmaW).map { j =>
        coalesce(lag(col("x"), j).over(w), lit(0L)) * lit(1L << (EmaW - 1 - j))
      }.reduce(_ + _)
      val den = (0 until EmaW).map { j =>
        when(lag(col("x"), j).over(w).isNotNull, lit(1L << (EmaW - 1 - j)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      daily
        .withColumn("ema_num", num)
        .withColumn("ema_den", den)
        .withColumn("ema_cents",
          col("ema_num").cast("double") / col("ema_den"))
        .select(col("event_type"), col("day"), col("x").as("x_cents"),
          col("ema_num"), col("ema_den"), col("ema_cents"))
        .orderBy(col("event_type"), col("day"))
    },
    Some {
      val num = (0 until EmaW).map { j =>
        s"COALESCE(lag(x, $j) OVER w, 0) * ${1L << (EmaW - 1 - j)}"
      }.mkString(" + ")
      val den = (0 until EmaW).map { j =>
        s"CASE WHEN lag(x, $j) OVER w IS NOT NULL THEN ${1L << (EmaW - 1 - j)} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
        FROM ev GROUP BY 1, 2),
      e AS (
        SELECT event_type, day, x,
               CAST($num AS BIGINT) AS ema_num,
               CAST($den AS BIGINT) AS ema_den
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day ASC NULLS FIRST))
      SELECT event_type, day, x AS x_cents, ema_num, ema_den,
             CAST(ema_num AS DOUBLE) / ema_den AS ema_cents
      FROM e
      ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST"""
    })

  // --- q151: autocorrelation function (ACF) of the daily series ---------
  // The lag-structure companion to q99 (cross-series), q101
  // (day-of-week seasonality) and q140 (EMA): for each series,
  // Pearson r between (x_t, x_{t+k}) at calendar lags k=1..7 — the
  // "is there weekly memory" diagnostic. Lagged pairs come from a
  // calendar self-join (b.day = a.day + k), which is the correct
  // semantics for gappy daily series (a missing day contributes no
  // pair, rather than silently pairing non-adjacent rows the way a
  // row-number lag would). The r algebra is q99's verbatim: exact
  // BIGINT moment sums, one double cast, multiply/sqrt/divide order
  // pinned on both sides; constant series → NULL r via the guard.
  //
  // 100 TB posture: the corpus folds to (series, day) cents once
  // map-side; the lag join runs over that sketch-sized table times a
  // 7-row broadcast lag spine — the raw event stream is scanned
  // exactly once. Same int64 envelope note as q99 (widen the moment
  // sums to decimal(38,0) via Exact.exactIntSum past ~1e18).
  private val AcfMaxLag = 7
  private val q151 = Q(
    (spark, dir) => {
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("cents"))
      val lags = spark.range(1, AcfMaxLag + 1)
        .select(col("id").cast("int").as("k"))
      val a = daily.crossJoin(broadcast(lags))
      val b = daily.select(col("event_type"), col("day").as("day_b"),
        col("cents").as("yb"))
      val m = a.join(b,
          a("event_type") === b("event_type") &&
            col("day_b") === date_add(col("day"), col("k")))
        .select(a("event_type").as("event_type"), col("k"),
          col("cents").as("ya"), col("yb"))
        .groupBy(col("event_type"), col("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("ya")).as("sa"), sum(col("yb")).as("sb"),
          sum(col("ya") * col("yb")).as("sab"),
          sum(col("ya") * col("ya")).as("saa"),
          sum(col("yb") * col("yb")).as("sbb"))
      val num = col("n") * col("sab") - col("sa") * col("sb")
      val da = col("n") * col("saa") - col("sa") * col("sa")
      val db = col("n") * col("sbb") - col("sb") * col("sb")
      m.select(col("event_type"), col("k").cast("long").as("lag"),
          col("n").as("n_pairs"),
          when(da > 0 && db > 0,
            num.cast("double") /
              (sqrt(da.cast("double")) * sqrt(db.cast("double")))).as("r"))
        .orderBy(col("event_type").asc, col("lag").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM ev GROUP BY 1, 2),
      lags AS (SELECT unnest(range(1, ${AcfMaxLag + 1})) AS k),
      m AS (
        SELECT a.event_type, l.k,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a.cents) AS BIGINT) AS sa,
               CAST(sum(b.cents) AS BIGINT) AS sb,
               CAST(sum(a.cents * b.cents) AS BIGINT) AS sab,
               CAST(sum(a.cents * a.cents) AS BIGINT) AS saa,
               CAST(sum(b.cents * b.cents) AS BIGINT) AS sbb
        FROM daily a CROSS JOIN lags l
        JOIN daily b ON b.event_type = a.event_type
                    AND b.day = a.day + CAST(l.k AS INT)
        GROUP BY 1, 2)
      SELECT event_type, CAST(k AS BIGINT) AS lag, n AS n_pairs,
             CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
                  THEN CAST(n * sab - sa * sb AS DOUBLE) /
                       (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) *
                        sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
             END AS r
      FROM m
      ORDER BY event_type ASC NULLS FIRST, lag ASC NULLS FIRST"""))

  // --- q157: peak concurrency by sweep-line ------------------------------
  // "How many users were active AT ONCE" — the load-profile question
  // q123's daily counts can't answer. Each user's daily activity span
  // [first event, last event] becomes two sweep events (+1 at start,
  // −1 at end); a running sum over the day's sweep order is the
  // concurrency curve and its max the daily peak. Ordering at equal
  // timestamps is PINNED (+1 before −1, then user id) so touching
  // spans count as concurrent deterministically — the tie rule is the
  // whole correctness of a sweep-line, stated once and mirrored in
  // the oracle's window ORDER BY.
  //
  // 100 TB posture: spans are one (user, day) aggregate off the scan;
  // the sweep is 2 rows per span, windowed PER DAY (the partition
  // key), so no global sort — each day's curve sorts independently,
  // and the peak folds map-side after the window. A day with a
  // hot-key-sized user population is the window's natural skew
  // bound; salting by hour-segment with a merge pass is the
  // escalation, not needed at these cardinalities.
  private val q157 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spans = events(spark, dir)
        .select(to_date(col("tus")).as("day"), col("user_id"), col("tus"))
        .groupBy(col("day"), col("user_id"))
        .agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
      val sweep = spans.select(col("day"), col("user_id"),
          col("t0").as("ts"), lit(1L).as("delta"))
        .unionByName(spans.select(col("day"), col("user_id"),
          col("t1").as("ts"), lit(-1L).as("delta")))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("ts").asc, col("delta").desc, col("user_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sweep.withColumn("conc", sum(col("delta")).over(w))
        .groupBy(col("day"))
        .agg((count(lit(1)) / 2).cast("long").as("n_spans"),
          max(col("conc")).as("peak_concurrency"))
        .orderBy(col("day").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      spans AS (
        SELECT CAST(tus AS DATE) AS day, user_id,
               min(tus) AS t0, max(tus) AS t1
        FROM ev GROUP BY 1, 2),
      sweep AS (
        SELECT day, user_id, t0 AS ts, CAST(1 AS BIGINT) AS delta FROM spans
        UNION ALL
        SELECT day, user_id, t1 AS ts, CAST(-1 AS BIGINT) AS delta FROM spans),
      c AS (
        SELECT day, sum(delta) OVER (PARTITION BY day
                 ORDER BY ts ASC NULLS FIRST, delta DESC NULLS LAST,
                          user_id ASC NULLS FIRST
                 ROWS UNBOUNDED PRECEDING) AS conc
        FROM sweep)
      SELECT day, CAST(count(*) / 2 AS BIGINT) AS n_spans,
             CAST(max(conc) AS BIGINT) AS peak_concurrency
      FROM c GROUP BY 1
      ORDER BY day ASC NULLS FIRST"""))

  // --- q159: STL-lite decomposition (trend + day-of-week + residual) ----
  // The decomposition q101 (seasonality means) and q142 (robust trend)
  // each give one piece of: x = trend + seasonal + residual. Classic
  // moving-average STL, integer-exact internally: trend is the
  // CENTERED 7-day sum held ×7 (never divided until output), valid
  // only where the window holds exactly 7 CALENDAR-dense days (count
  // AND date-span guards — a row-window over a gappy series would
  // silently average across gaps); detrended = 7x − trend7 stays
  // integral; the day-of-week seasonal index is the exact rational
  // (Σ detrended, n) per dow. Floats appear only in the output
  // columns, each ONE pinned expression over exact integers (the
  // q147 discipline), so the oracle hash-matches bit-for-bit.
  //
  // 100 TB posture: the corpus folds to (series, day) once; the
  // trend window partitions by series (no global sort); the seasonal
  // index is a 7-row-per-series aggregate joined back broadcast.
  private val q159 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(spark, dir)
        .groupBy(col("event_type"), to_date(col("tus")).as("day"))
        .agg(sum(Exact.quantize(col("value"))).as("x"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val t = daily
        .withColumn("t7",
          when(count(lit(1)).over(w7) === 7 &&
            datediff(max(col("day")).over(w7), min(col("day")).over(w7)) === 6,
            sum(col("x")).over(w7)))
        .withColumn("det", lit(7L) * col("x") - col("t7"))
        .withColumn("dow", dayofweek(col("day")) - 1)
      val seasonal = t.groupBy(col("event_type"), col("dow"))
        .agg(sum(col("det")).as("snum"), count(col("det")).as("sden"))
      t.join(seasonal, Seq("event_type", "dow"))
        .withColumn("trend", col("t7").cast("double") / lit(7.0))
        .withColumn("seasonal",
          col("snum").cast("double") / col("sden") / lit(7.0))
        .withColumn("resid",
          col("x").cast("double") - col("trend") - col("seasonal"))
        .select(col("event_type"), col("day"), col("x").as("x_cents"),
          col("trend"), col("seasonal"), col("resid"))
        .orderBy(col("event_type").asc, col("day").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      daily AS (
        SELECT event_type, CAST(tus AS DATE) AS day,
               CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
                 AS x
        FROM ev GROUP BY 1, 2),
      t AS (
        SELECT event_type, day, x,
               CASE WHEN count(*) OVER w7 = 7
                     AND max(day) OVER w7 - min(day) OVER w7 = 6
                    THEN CAST(sum(x) OVER w7 AS BIGINT) END AS t7,
               dayofweek(day) AS dow
        FROM daily
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day ASC NULLS FIRST
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      t2 AS (SELECT *, 7 * x - t7 AS det FROM t),
      seasonal AS (
        SELECT event_type, dow, CAST(sum(det) AS BIGINT) AS snum,
               CAST(count(det) AS BIGINT) AS sden
        FROM t2 GROUP BY 1, 2)
      SELECT t2.event_type, t2.day, t2.x AS x_cents,
             CAST(t2.t7 AS DOUBLE) / 7.0 AS trend,
             CAST(s.snum AS DOUBLE) / s.sden / 7.0 AS seasonal,
             CAST(t2.x AS DOUBLE) - CAST(t2.t7 AS DOUBLE) / 7.0
               - CAST(s.snum AS DOUBLE) / s.sden / 7.0 AS resid
      FROM t2 JOIN seasonal s
        ON t2.event_type = s.event_type AND t2.dow = s.dow
      ORDER BY t2.event_type ASC NULLS FIRST, t2.day ASC NULLS FIRST"""))

  // --- q153: two-proportion A/B test on view→purchase conversion --------
  // The experimentation readout: users split by id parity into A/B,
  // exposure = has a 'view', conversion = a 'purchase' STRICTLY AFTER
  // the first view (the causal ordering a naive any-purchase join gets
  // wrong). Counts are exact integers; conversion rates are floor-ppm
  // (Sampling.ldiv, engine-exact); the pooled two-proportion z-score
  // is the one float expression, built from the integer counts with
  // +,-,*,/,sqrt only, identical trees both sides (the q99/q147
  // determinism discipline).
  //
  // 100 TB posture: first-view is one (user) aggregate; the
  // conversion flag joins purchases on the user key only (purchases
  // per user are bounded, no window); variants fold to a 2-row table
  // before the single-row pivot. Nothing driver-side.
  /** Per-variant (user_id parity) exposure/conversion counts — the
    * q153/q161 shared core: exposure = has a 'view', conversion = a
    * 'purchase' strictly after the first view. */
  private def abVariantCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val v0 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("v0"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("pt"))
    val conv = v0.join(purch, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(max(when(col("pt") > col("v0"), 1).otherwise(0)).as("c"))
    conv.groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("c"))
  }

  /** The q153/q161 shared oracle CTEs producing (variant, n, c). */
  private val abVariantSqlCtes = """
      v0 AS (
        SELECT user_id, min(tus) AS v0 FROM ev
        WHERE event_type = 'view' GROUP BY 1),
      conv AS (
        SELECT f.user_id,
               max(CASE WHEN p.tus > f.v0 THEN 1 ELSE 0 END) AS c
        FROM v0 f LEFT JOIN ev p
          ON p.user_id = f.user_id AND p.event_type = 'purchase'
        GROUP BY 1),
      per AS (
        SELECT user_id % 2 AS variant, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS c
        FROM conv GROUP BY 1)"""

  private val q153 = Q(
    (spark, dir) => {
      val per = abVariantCounts(spark, dir)
      val one = per.agg(
        sum(when(col("variant") === 0, col("n"))).as("n_a"),
        sum(when(col("variant") === 0, col("c"))).as("c_a"),
        sum(when(col("variant") === 1, col("n"))).as("n_b"),
        sum(when(col("variant") === 1, col("c"))).as("c_b"))
      val (na, ca, nb, cb) = (col("n_a").cast("double"),
        col("c_a").cast("double"), col("n_b").cast("double"),
        col("c_b").cast("double"))
      val pp = (ca + cb) / (na + nb)
      val z = (ca / na - cb / nb) /
        sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
      one.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        Sampling.ldiv(col("c_a") * lit(1000000L), col("n_a")).as("conv_a_ppm"),
        Sampling.ldiv(col("c_b") * lit(1000000L), col("n_b")).as("conv_b_ppm"),
        z.as("z_score"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      $abVariantSqlCtes,
      one AS (
        SELECT CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c_a,
               CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c_b
        FROM per),
      f AS (
        SELECT n_a, c_a, n_b, c_b,
               CAST(n_a AS DOUBLE) AS nad, CAST(c_a AS DOUBLE) AS cad,
               CAST(n_b AS DOUBLE) AS nbd, CAST(c_b AS DOUBLE) AS cbd,
               (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE)) /
               (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
        FROM one)
      SELECT n_a, c_a, n_b, c_b,
             (c_a * 1000000) // n_a AS conv_a_ppm,
             (c_b * 1000000) // n_b AS conv_b_ppm,
             (cad / nad - cbd / nbd) /
               sqrt(pp * (1.0 - pp) * (1.0 / nad + 1.0 / nbd)) AS z_score
      FROM f"""))

  // --- q161: Wilson score intervals for conversion rates ----------------
  // q153 answers "are A and B different"; this answers "how sure are
  // we about EACH rate" — the Wilson interval (the right one near 0/1
  // and at small n, unlike the Wald ±z√(pq/n)). Same exposure/
  // conversion core as q153 (abVariantCounts); the interval is one
  // pinned double expression per variant over the exact integer
  // counts, with z and z² interpolated as the SAME Scala-computed
  // literals into both engines (the HllAlphaC discipline — never let
  // two engines each evaluate 1.96²).
  private val WilsonZ = 1.96
  private val WilsonZ2 = WilsonZ * WilsonZ
  private val q161 = Q(
    (spark, dir) => {
      val per = abVariantCounts(spark, dir)
      val nd = col("n").cast("double")
      val pd = col("c").cast("double") / nd
      val denom = lit(1.0) + lit(WilsonZ2) / nd
      val center = pd + lit(WilsonZ2) / (lit(2.0) * nd)
      val margin = lit(WilsonZ) *
        sqrt(pd * (lit(1.0) - pd) / nd + lit(WilsonZ2) / (lit(4.0) * nd * nd))
      per.select(col("variant"), col("n"), col("c"),
          Sampling.ldiv(col("c") * lit(1000000L), col("n")).as("conv_ppm"),
          ((center - margin) / denom).as("wilson_lo"),
          ((center + margin) / denom).as("wilson_hi"))
        .orderBy(col("variant").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      $abVariantSqlCtes,
      f AS (
        SELECT variant, n, c,
               CAST(n AS DOUBLE) AS nd, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pd
        FROM per)
      SELECT variant, n, c,
             (c * 1000000) // n AS conv_ppm,
             (pd + $WilsonZ2 / (2.0 * nd) - $WilsonZ *
                sqrt(pd * (1.0 - pd) / nd + $WilsonZ2 / (4.0 * nd * nd)))
               / (1.0 + $WilsonZ2 / nd) AS wilson_lo,
             (pd + $WilsonZ2 / (2.0 * nd) + $WilsonZ *
                sqrt(pd * (1.0 - pd) / nd + $WilsonZ2 / (4.0 * nd * nd)))
               / (1.0 + $WilsonZ2 / nd) AS wilson_hi
      FROM f
      ORDER BY variant ASC NULLS FIRST"""))

  // --- q154: new vs returning users per day -----------------------------
  // The growth-accounting counterpart of q123/q149: each day's DAU
  // split into first-ever-seen (new) and returning, plus the
  // cumulative user count — all exact integers. first_day is one
  // (user) aggregate; "new" is a first-day equality, never a scan-back
  // window; the cumulative count is a running sum over the DAYS table
  // (365 rows), not over users.
  private val q154 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(spark, dir)
        .select(to_date(col("tus")).as("day"), col("user_id"))
      val first = e.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      val daily = e.distinct()
        .join(first, Seq("user_id"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("dau"),
          sum(when(col("d0") === col("day"), 1L).otherwise(0L)).as("new_users"))
        .withColumn("returning", col("dau") - col("new_users"))
        .withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      daily.select(col("day"), col("dau"), col("new_users"),
          col("returning"), col("cum_users"))
        .orderBy(col("day").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      e AS (SELECT DISTINCT CAST(tus AS DATE) AS day, user_id FROM ev),
      first AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY 1),
      daily AS (
        SELECT e.day, CAST(count(*) AS BIGINT) AS dau,
               CAST(sum(CASE WHEN f.d0 = e.day THEN 1 ELSE 0 END) AS BIGINT)
                 AS new_users
        FROM e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1)
      SELECT day, dau, new_users, dau - new_users AS returning,
             CAST(sum(new_users) OVER (ORDER BY day ASC NULLS FIRST
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM daily
      ORDER BY day ASC NULLS FIRST"""))

  // --- q149: exact distinct rollup via bitmap OR (Druid-style) ----------
  // q123's rolling DAU re-scans events per window and q148/q58
  // estimate; this is the third discipline: EXACT distinct that still
  // ROLLS UP. Users fold into fixed 32-bit words (bucket = id>>5,
  // bit = id&31) with the codegen'd `bit_or` aggregate — daily
  // bitmaps are built once from raw events, and the weekly count
  // derives by OR-merging the DAILY bitmaps, never touching raw data
  // again (the Druid/materialized-rollup pattern; OR is the exact
  // set-union homomorphism, the property count(DISTINCT) lacks). The
  // oracle computes both grains with straight COUNT(DISTINCT), so the
  // hash match PROVES the bitmap path exact, not approximately close.
  //
  // Scale shape: everything is (key, long-word) hash aggregates with
  // map-side combine — no distinct shuffle of the raw event stream at
  // the weekly grain. The contract is a DENSE integer id domain
  // (rows-per-day ≤ max_id/32): at 100 TB you first dictionary-encode
  // ids against the user dim (one broadcast/bucketed join), or chunk
  // words into roaring-style containers; sparse 64-bit ids without a
  // dictionary belong to q148's HLL instead.
  private val q149 = Q(
    (spark, dir) => {
      val e = events(spark, dir)
        .select(col("tus").cast("date").as("d"), col("user_id"))
      val daily = e
        .groupBy(date_trunc("week", col("d")).cast("date").as("wk"),
          col("d"), shiftright(col("user_id"), 5).as("bucket"))
        .agg(expr(
          "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id & 31 AS INT)))")
          .as("w"))
      val dau = daily.groupBy(col("wk"), col("d"))
        .agg(sum(bit_count(col("w"))).as("dau"))
      val byWeek = dau.groupBy(col("wk"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("dau_sum"))
      val wau = daily.groupBy(col("wk"), col("bucket"))
        .agg(expr("bit_or(w)").as("ww"))
        .groupBy(col("wk"))
        .agg(sum(bit_count(col("ww"))).as("wau"))
      byWeek.join(wau, Seq("wk"))
        .select(col("wk"), col("n_days"), col("dau_sum"), col("wau"))
        .orderBy(col("wk").asc)
    },
    Some(s"""
      WITH $eventsSqlCte,
      e AS (SELECT CAST(tus AS DATE) AS d, user_id FROM ev),
      dau AS (
        SELECT date_trunc('week', d) AS wk, d,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM e GROUP BY 1, 2),
      byweek AS (
        SELECT wk, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(dau) AS BIGINT) AS dau_sum
        FROM dau GROUP BY 1),
      wau AS (
        SELECT date_trunc('week', d) AS wk,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM e GROUP BY 1)
      SELECT b.wk, n_days, dau_sum, wau
      FROM byweek b JOIN wau ON b.wk = wau.wk
      ORDER BY b.wk ASC NULLS FIRST"""))

  // --- q176: time-boxed funnel (conversion windows per step) -------------
  // q94's funnel counts a conversion whenever the next stage EVER
  // happens; product analytics almost always bounds each step ("viewed
  // within 7 days of signup"). Same greedy conditional-min chain —
  // stage k is the earliest type-k event strictly after stage k−1 AND
  // within the step window — with the documented greedy caveat: the
  // chain anchors on each user's EARLIEST stage-k time, so a user who
  // misses the window from the earliest anchor but would convert from a
  // later one counts as not converted (the standard funnel-engine
  // semantics; a maximal-match variant is a per-user DP, not a join
  // chain). Per-step work is one equi-join on user_id + one min
  // aggregate — the q94 scale shape, unchanged; the window predicate is
  // exact microsecond timestamp arithmetic on both engines.
  private val FunnelWindow = "INTERVAL 7 DAY"
  private val q176 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(spark, dir)
        .select(col("user_id"), col("event_type"), col("tus"))
      val stage1 = ev.filter(col("event_type") === FunnelStages.head)
        .groupBy(col("user_id")).agg(min(col("tus")).as("t"))
      val stages = FunnelStages.tail.scanLeft(stage1) { (prev, st) =>
        ev.filter(col("event_type") === st)
          .join(prev.select(col("user_id"), col("t").as("tp")), Seq("user_id"))
          .filter(col("tus") > col("tp") &&
            col("tus") <= col("tp") + expr(FunnelWindow))
          .groupBy(col("user_id")).agg(min(col("tus")).as("t"))
      }
      val counts = stages.zip(FunnelStages).zipWithIndex.map {
        case ((df, st), i) =>
          df.agg(count(lit(1)).cast("long").as("n_users"))
            .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"),
              col("n_users"))
      }.reduce(_.unionByName(_))
      val w = Window.orderBy(col("stage_idx")) // 4 rows — constant size
      counts
        .withColumn("n_prev", lag(col("n_users"), 1).over(w))
        .select(col("stage_idx"), col("stage"), col("n_users"),
          when(col("n_prev") > 0, expr("(1000 * n_users) div n_prev"))
            .as("conv_permille"))
        .orderBy(col("stage_idx"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      s1 AS (SELECT user_id, min(tus) AS t FROM ev
             WHERE event_type = '${FunnelStages.head}' GROUP BY 1),
      s2 AS (SELECT ev.user_id, min(ev.tus) AS t
             FROM ev JOIN s1 ON ev.user_id = s1.user_id
             WHERE ev.event_type = '${FunnelStages(1)}' AND ev.tus > s1.t
               AND ev.tus <= s1.t + $FunnelWindow GROUP BY 1),
      s3 AS (SELECT ev.user_id, min(ev.tus) AS t
             FROM ev JOIN s2 ON ev.user_id = s2.user_id
             WHERE ev.event_type = '${FunnelStages(2)}' AND ev.tus > s2.t
               AND ev.tus <= s2.t + $FunnelWindow GROUP BY 1),
      s4 AS (SELECT ev.user_id, min(ev.tus) AS t
             FROM ev JOIN s3 ON ev.user_id = s3.user_id
             WHERE ev.event_type = '${FunnelStages(3)}' AND ev.tus > s3.t
               AND ev.tus <= s3.t + $FunnelWindow GROUP BY 1),
      c AS (SELECT 1 AS stage_idx, '${FunnelStages.head}' AS stage,
                   CAST(count(*) AS BIGINT) AS n_users FROM s1
            UNION ALL SELECT 2, '${FunnelStages(1)}', count(*) FROM s2
            UNION ALL SELECT 3, '${FunnelStages(2)}', count(*) FROM s3
            UNION ALL SELECT 4, '${FunnelStages(3)}', count(*) FROM s4)
      SELECT stage_idx, stage, n_users,
             CASE WHEN lag(n_users) OVER (ORDER BY stage_idx) > 0
                  THEN (1000 * n_users) // lag(n_users) OVER (ORDER BY stage_idx)
             END AS conv_permille
      FROM c
      ORDER BY stage_idx ASC"""))

  val all: Seq[(String, Q)] = Seq(
    "q28_json_props" -> q28,
    "q29_tumbling_window" -> q29,
    "q30_sessionization" -> q30,
    "q33_salted_agg" -> q33,
    "q35_asof_join" -> q35,
    "q62_interval_join" -> q62,
    "q76_pagerank" -> q76,
    "q79_rolling_zscore" -> q79,
    "q85_asof_native" -> q85,
    "q94_funnel" -> q94,
    "q95_cohort_retention" -> q95,
    "q96_transition_matrix" -> q96,
    "q97_gap_fill" -> q97,
    "q99_series_corr" -> q99,
    "q100_histogram" -> q100,
    "q101_seasonality" -> q101,
    "q102_cusum" -> q102,
    "q105_rolling_week" -> q105,
    "q123_rolling_dau" -> q123,
    "q124_attribution" -> q124,
    "q126_top_paths" -> q126,
    "q127_debounce" -> q127,
    "q129_window_kmv" -> q129,
    "q131_ppr" -> q131,
    "q140_ema" -> q140,
    "q149_bitmap_distinct" -> q149,
    "q151_acf" -> q151,
    "q153_ab_test" -> q153,
    "q154_new_returning" -> q154,
    "q157_concurrency" -> q157,
    "q159_stl_decompose" -> q159,
    "q161_wilson_ci" -> q161,
    "q176_bounded_funnel" -> q176)

  // --- As-of join, NATIVE custom-plan path --------------------------------
  // q35's exact scenario through plans/AsofJoin (logical node ->
  // planner Strategy -> sorted-merge exec) instead of the composed
  // union+window: same DuckDB ASOF oracle, so the driver hash-checks
  // the custom physical operator end-to-end. AsofNativeSpec separately
  // proves native == composed row-for-row on randomized inputs.
  //
  // 100 TB posture: one hash exchange + sort per side (SortMergeJoin
  // cost), then an O(1)-state per-partition merge — no union schema,
  // no running-last window buffer; bucketed inputs plan with NO
  // exchange (the distribution is declared, EnsureRequirements
  // decides).
  private lazy val q85 = Q(
    (spark, dir) => {
      val ev = events(spark, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("tus").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus"), col("value"))
      graft.operators.Relational.asofJoinNative(
        clicks, purchases, keys = Seq("user_id"),
        leftTs = "click_ts", rightTs = "tus", valuePrefix = "last_purchase_")
        .select(col("event_id"), col("user_id"), col("click_ts"),
          col("last_purchase_value"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH $eventsSqlCte,
      cl AS (SELECT event_id, user_id, tus AS click_ts FROM ev WHERE event_type = 'click'),
      pu AS (SELECT user_id, tus, value FROM ev WHERE event_type = 'purchase')
      SELECT cl.event_id, cl.user_id, cl.click_ts, pu.value AS last_purchase_value
      FROM cl ASOF LEFT JOIN pu ON cl.user_id = pu.user_id AND cl.click_ts >= pu.tus
      ORDER BY cl.event_id ASC NULLS FIRST"""))
}
