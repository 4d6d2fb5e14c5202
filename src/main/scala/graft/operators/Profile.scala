package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-dynamic table profiler: one row per column with null count,
  * numeric min/max, and a KMV distinct-count estimate — the
  * "what is in this table" pass a pipeline runs on every new drop
  * before trusting it (the Deequ/summary() role, made deterministic
  * and oracle-checkable).
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's statistics simultaneously — 4 aggregate expressions per
  * column in a single map-side-combinable agg, never a per-column
  * scan. Distinct counts come from the bounded KMV sketch
  * (plans/KmvSketchLong, ≤ k longs of state per column), so profiling
  * a 100 TB table shuffles kilobytes per column instead of the
  * columns' distinct sets. The single aggregated row then unpivots
  * in-plan (array-of-struct explode) — nothing is collected.
  *
  * Determinism contract (per dtype, mirrored by the q60 oracle):
  *  - doubles/floats hash on their 1e6-quantized integer form (the
  *    embedding discipline — float→string formatting is NOT stable
  *    across engines, a quantized BIGINT's string form is);
  *  - timestamps/dates hash on their DATE string (BASELINE.md's
  *    emit-DATE rule);
  *  - everything else hashes on its plain string cast.
  */
object Profile {

  val DefaultK = 256

  // Non-ANSI double→long casts saturate: every |v·1e6| past Long range
  // collapses to Long.MaxValue, NaN becomes 0 (colliding with 0.0) —
  // distinct extreme/non-finite values would silently merge in the
  // sketch. Route those through explicit sentinels (-prefixed so
  // they can never collide with a plain quantized integer's string)
  // before the quantized fast path; the q60 oracle mirrors the CASE.
  private def hashInput(c: Column, t: DataType): Column = t match {
    case DoubleType | FloatType =>
      val d = c.cast("double")
      val q = round(d * 1e6)
      when(isnan(d), lit("nan"))
        .when(d === lit(Double.PositiveInfinity), lit("inf"))
        .when(d === lit(Double.NegativeInfinity), lit("-inf"))
        .when(abs(q) >= lit(9.223372036854775e18), concat(lit(""),
          coalesce(d.cast("decimal(38,6)").cast("string"), lit("huge"))))
        .otherwise(q.cast("long").cast("string"))
    case TimestampType | TimestampNTZType | DateType => c.cast("date").cast("string")
    case _ => c.cast("string")
  }

  /** Deterministic whole-row key for the quantile sample: md5-derived
    * 60-bit hash of every column's normalized string, NUL-separated,
    * nulls pinned to an explicit sentinel (concat_ws would silently
    * skip them and DuckDB must replay byte-identically). Full-duplicate
    * rows share a key and collapse in the sample's set semantics — the
    * saltedJoin caveat, documented in the oracle contract. */
  private def rowHash(fields: Seq[StructField]): Column =
    Kmv.hash60(concat_ws("",
      fields.map(f => coalesce(hashInput(col(f.name), f.dataType), lit(""))): _*))

  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  /** The MERGEABLE profile: one row per column with the raw sketch
    * (`kmv ARRAY<BIGINT>`) instead of the derived estimate. Every
    * statistic here merges associatively — counts add, min/max
    * combine, KMV unions-and-trims — which is what makes the profile
    * streamable ([[graft.streaming.ProfileStream]]) and partition-
    * independent. [[profile]] is this plus the estimate derivation. */
  def sketchProfile(df: DataFrame, k: Int = DefaultK): DataFrame = {
    val fields = df.schema.fields.toSeq
    // Internal alias names must not collide with the input schema (the
    // operator advertises works-on-any-table) — uniquify against it.
    val taken = scala.collection.mutable.Set[String](fields.map(_.name): _*)
    def fresh(base: String): String = {
      var n = base
      while (taken(n)) n += "_"
      taken += n
      n
    }
    val rowsCol = fresh("__n_rows")
    val rowHv = fresh("__row_hv")
    val hv = fields.map(f => f.name -> fresh(s"${f.name}__hv")).toMap
    val nu = fields.map(f => f.name -> fresh(s"${f.name}__nulls")).toMap
    val kv = fields.map(f => f.name -> fresh(s"${f.name}__kmv")).toMap
    val qs = fields.map(f => f.name -> fresh(s"${f.name}__qsk")).toMap
    val mn = fields.map(f => f.name -> fresh(s"${f.name}__min")).toMap
    val mx = fields.map(f => f.name -> fresh(s"${f.name}__max")).toMap
    // Spread a narrow scan before the CPU-heavy per-column hashing
    // (11 md5/conv chains per row) — one small input file would
    // otherwise serialize the whole pass on one core. GATED off when
    // the input is already core-wide (the 100 TB layout), where the
    // extra exchange would be pure waste (the TextQueries.docs rule).
    val spread =
      if (df.rdd.getNumPartitions >= df.sparkSession.sparkContext.defaultParallelism) df
      else df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    // Pre-project the hash columns in a codegen'd select:
    // TypedImperativeAggregate.update evaluates its child INTERPRETED
    // per row, so feeding it the md5/conv chain directly costs ~4x the
    // whole query (measured: q60 8.3 s -> 2.4 s at sf0.1). With the
    // projection below the aggregate, update() reads a plain long.
    val pre = spread.select(fields.map(f => col(f.name)) ++ fields.map { f =>
      Kmv.hash60(hashInput(col(f.name), f.dataType)).as(hv(f.name))
    } ++ Seq(rowHash(fields).as(rowHv)) ++ fields.collect {
      // quantile sample values pre-cast outside the aggregate too
      case f if isNumeric(f.dataType) =>
        col(f.name).cast("double").as(qs(f.name) + "_v")
    }: _*)
    val emptyPairs = lit(null).cast("array<struct<hv:bigint,v:double>>")
    val aggs: Seq[Column] = count(lit(1)).as(rowsCol) +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(nu(f.name)),
        Kmv.sketch(col(hv(f.name)), k).as(kv(f.name)),
        // ONE shared bottom-k row sample keyed on the whole-row hash,
        // read per numeric column (nulls drop out per column)
        (if (isNumeric(f.dataType))
           QSketch.pairSketch(col(rowHv), col(qs(f.name) + "_v"), k)
         else emptyPairs).as(qs(f.name)),
        (if (isNumeric(f.dataType)) min(c).cast("double")
         else lit(null).cast("double")).as(mn(f.name)),
        (if (isNumeric(f.dataType)) max(c).cast("double")
         else lit(null).cast("double")).as(mx(f.name)))
    }
    val one = pre.agg(aggs.head, aggs.tail: _*)
    val structs = fields.map { f =>
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col(rowsCol).as("n_rows"),
        col(nu(f.name)).as("n_nulls"),
        col(kv(f.name)).as("kmv"),
        col(qs(f.name)).as("qsk"),
        col(mn(f.name)).as("min_num"),
        col(mx(f.name)).as("max_num"))
    }
    one.select(explode(array(structs: _*)).as("s"))
      .select(col("s.column_name").as("column_name"), col("s.dtype").as("dtype"),
        col("s.n_rows").as("n_rows"), col("s.n_nulls").as("n_nulls"),
        col("s.kmv").as("kmv"), col("s.qsk").as("qsk"),
        col("s.min_num").as("min_num"), col("s.max_num").as("max_num"))
  }

  /** Derive the reader-facing estimate columns from a (possibly merged)
    * sketch profile — the q58 bottom-k formula. */
  def withEstimate(sketched: DataFrame, k: Int = DefaultK): DataFrame =
    sketched.select(col("column_name"), col("dtype"),
      col("n_rows"), col("n_nulls"),
      size(col("kmv")).cast("long").as("kmv_n"),
      Kmv.estimate(col("kmv"), k).as("est_distinct"),
      col("min_num"), col("max_num"),
      QSketch.quantile(col("qsk"), 0.5).as("p50_num"),
      QSketch.quantile(col("qsk"), 0.9).as("p90_num"))
      .orderBy(col("column_name"))

  def profile(df: DataFrame, k: Int = DefaultK): DataFrame =
    withEstimate(sketchProfile(df, k), k)
}
