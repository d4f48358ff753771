package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt's linear (double exponential) smoothing over the daily
  * log-price panel — the trend-aware complement to the local-level
  * Kalman filter (m49): per underlying, level lₜ and trend bₜ evolve
  * in the ERROR-CORRECTION form (Hyndman & Athanasopoulos §7.2)
  *   e  = y − (l + b)            (one-step-ahead forecast error)
  *   l ← (l + b) + α·e
  *   b ← b + α·β·e
  * with α = 1/4, β = 1/2 spelled as exact binary rationals. The state
  * is carried as t1 = l + b (the one-step forecast) plus b, which
  * makes the update dependency TRIANGULAR — the reason this fold can
  * be bit-identical across engines (see below).
  *
  * Execution shape: like every recurrence here, Holt smoothing is
  * inherently sequential in time, so it runs as a higher-order
  * `aggregate` fold over the per-underlying day array (calendar-
  * bounded: ~30 elements regardless of tape size), one codegen'd
  * expression per key — no shuffle beyond the day roll-up.
  *
  * Cross-engine exactness: DuckDB's `list_reduce` assigns the result
  * struct's fields IN ORDER, mutating the accumulator as it goes,
  * while Spark's `aggregate` snapshots the old accumulator (verify
  * skill, round-13 find). Field order (s, b, t1, n) exploits that:
  * `s` and `b` read only pre-update state in both engines; `t1`'s
  * DuckDB spelling reads the ALREADY-UPDATED `b` (new b = b+αβe),
  * while the Spark spelling expands the same value from old state as
  * `(b + αβe)` — different texts, the exact same IEEE op sequence
  * (X = t1+αe, Y = b+αβe, X+Y), hence the same bits. Inputs are the
  * 6-dp-quantized ln(close) grid shared with m48/m49. */
object HoltLinear {

  /** α = 1/4, αβ = 1/8 — exact binary rationals via int→double casts
    * (a bare decimal literal parses as DECIMAL in both engines). */
  val AText = "(CAST(1 AS DOUBLE) / CAST(4 AS DOUBLE))"
  val ABText = "(CAST(1 AS DOUBLE) / CAST(8 AS DOUBLE))"

  /** Fit per underlying over (underlying, day_start, y) rows.
    * Returns (underlying, n_days, level, trend, fc5, sse). */
  def fit(daily: DataFrame): DataFrame = {
    val e = "(x0 - a.t1)"
    daily
      .groupBy(col("underlying"))
      .agg(
        count(lit(1)).as("n_days"),
        expr(s"""aggregate(
          transform(sort_array(collect_list(struct(day_start, y))),
            p -> p.y),
          named_struct('s', 0.0D, 'b', 0.0D, 't1', 0.0D, 'n', 0.0D),
          (a, x0) -> named_struct(
            's', CASE WHEN a.n < 0.5D THEN 0.0D
                 ELSE a.s + $e * $e END,
            'b', CASE WHEN a.n < 0.5D THEN 0.0D
                 ELSE a.b + $ABText * $e END,
            't1', CASE WHEN a.n < 0.5D THEN x0
                  ELSE (a.t1 + $AText * $e) + (a.b + $ABText * $e) END,
            'n', a.n + 1.0D))""").as("_st"))
      .select(col("underlying"), col("n_days"),
        (col("_st.t1") - col("_st.b")).as("level"),
        col("_st.b").as("trend"),
        ((col("_st.t1") - col("_st.b")) + lit(5.0) * col("_st.b"))
          .as("fc5"),
        col("_st.s").as("sse"))
  }

  /** DuckDB tail: from a CTE `hdy(underlying, day_start, y)`, the
    * identical fold via list_reduce over the init-prepended struct
    * list. Field `t1` deliberately reads the already-updated `b`
    * (DuckDB's in-order mutation) — the value Spark's snapshot
    * spelling expands from old state. */
  def duckTail: String = {
    val e = "(el.y - acc.t1)"
    s"""harr AS (
       |  SELECT underlying, count(*) AS n_days,
       |    list({'s': 0.0::DOUBLE, 'b': 0.0::DOUBLE, 't1': 0.0::DOUBLE,
       |          'n': 0.0::DOUBLE, 'y': y} ORDER BY day_start) AS arr
       |  FROM hdy GROUP BY 1
       |),
       |hfold AS (
       |  SELECT underlying, n_days,
       |    list_reduce(
       |      list_prepend({'s': 0.0::DOUBLE, 'b': 0.0::DOUBLE,
       |        't1': 0.0::DOUBLE, 'n': 0.0::DOUBLE, 'y': 0.0::DOUBLE}, arr),
       |      (acc, el) -> {
       |        's': CASE WHEN acc.n < 0.5 THEN 0.0
       |             ELSE acc.s + $e * $e END,
       |        'b': CASE WHEN acc.n < 0.5 THEN 0.0
       |             ELSE acc.b + $ABText * $e END,
       |        't1': CASE WHEN acc.n < 0.5 THEN el.y
       |              ELSE (acc.t1 + $AText * $e) + acc.b END,
       |        'n': acc.n + 1.0,
       |        'y': 0.0::DOUBLE}) AS st
       |  FROM harr
       |)
       |SELECT underlying, n_days,
       |  st.t1 - st.b AS level, st.b AS trend,
       |  (st.t1 - st.b) + 5.0 * st.b AS fc5,
       |  st.s AS sse
       |FROM hfold""".stripMargin
  }
}
