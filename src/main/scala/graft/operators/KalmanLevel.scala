package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local-level Kalman filter over the daily log-price panel — the
  * state-space smoother (Durbin & Koopman ch. 2) that anchors the
  * trend/noise split EWMA (m8) and HAR (m48) only approximate: per
  * underlying, level mₜ and variance pₜ evolve by
  *   k = (p + q) / (p + q + r);  m ← m + k·(y − m);
  *   p ← (1 − k)·(p + q);        ssi ← ssi + (y − m_prior)²
  * with q/r the state/observation noise (spelled as exact binary
  * rationals 1/8192 and 1/1024 — no decimal-literal parse ambiguity
  * in either engine).
  *
  * Execution shape: a Kalman recurrence is inherently SEQUENTIAL in
  * time, so it does NOT belong in a row-at-a-time window — it runs as
  * a higher-order fold (`aggregate`) over the per-underlying day
  * array. The panel is day-grained (calendar-bounded: ~30 rows per
  * underlying regardless of tape size), so `collect_list` per key is
  * bounded state, the same contract as the EGARCH per-symbol series.
  * The fold is one codegen'd expression per key — no shuffle beyond
  * the day roll-up.
  *
  * Cross-engine exactness: y = ln(close) is 6-dp-quantized (the
  * Parity grid absorbing 1-ulp libm ln differences); every fold step
  * is +,−,*,/ on doubles — correctly-rounded IEEE ops in an identical
  * sequence on both engines (Spark `aggregate` HOF; DuckDB
  * `list_reduce` over the init-prepended list), so the final state is
  * bit-identical with NO quantization inside the loop. */
object KalmanLevel {

  /** Exact binary noise constants. Spelled as CAST(int AS DOUBLE)
    * divisions: a bare `1.0` literal is DECIMAL in Spark SQL (and may
    * be in DuckDB), and decimal division rounds under engine-specific
    * scale rules — the int→double casts and the power-of-two ratios
    * are exact in both. */
  val QText = "(CAST(1 AS DOUBLE) / CAST(8192 AS DOUBLE))"
  val RText = "(CAST(1 AS DOUBLE) / CAST(1024 AS DOUBLE))"

  /** Initial state: diffuse prior (level 0, huge variance) — the
    * first update then lands the level on y₁ up to 1e-6. */
  val P0Text = "CAST(1048576 AS DOUBLE)"

  private def stepSql(acc: String, y: String): (String, String, String) = {
    val k = s"(($acc.p + $QText) / ($acc.p + $QText + $RText))"
    val m = s"$acc.m + $k * ($y - $acc.m)"
    val p = s"(1.0 - $k) * ($acc.p + $QText)"
    val s = s"$acc.s + ($y - $acc.m) * ($y - $acc.m)"
    (m, p, s)
  }

  /** Filter per underlying over (underlying, day_start, y) rows.
    * Returns (underlying, n_days, level, p_var, ssi). */
  def fit(daily: DataFrame): DataFrame = {
    val (m, p, s) = stepSql("a", "x.y")
    daily
      .groupBy(col("underlying"))
      .agg(
        count(lit(1)).as("n_days"),
        // field order s, m, p is LOAD-BEARING: DuckDB's list_reduce
        // assigns struct fields into the accumulator IN ORDER, so a
        // later field reading an earlier one sees the UPDATED value —
        // with ssi first, every field reads only pre-update state and
        // the mutation model coincides with Spark's snapshot model
        expr(s"""aggregate(
          transform(sort_array(collect_list(struct(day_start, y))),
            e -> e.y),
          named_struct('s', 0.0D, 'm', 0.0D,
            'p', CAST($P0Text AS DOUBLE)),
          (a, x0) -> named_struct(
            's', ${stepY(s)}, 'm', ${stepY(m)}, 'p', ${stepY(p)}))""")
          .as("_st"))
      .select(col("underlying"), col("n_days"),
        col("_st.m").as("level"), col("_st.p").as("p_var"),
        col("_st.s").as("ssi"))
  }

  /** The fold body references the element as `x.y`; Spark's lambda
    * var is the raw double `x0` — rewrite. */
  private def stepY(t: String): String = t.replace("x.y", "x0")

  /** DuckDB tail: from a CTE `kdy(underlying, day_start, y)`, the
    * identical fold via list_reduce over the init-prepended struct
    * list (list_reduce has no init parameter; prepending makes it
    * foldLeft). Field `y` rides in the struct so accumulator and
    * element share one type. */
  def duckTail: String = {
    val (m, p, s) = stepSql("a", "b.y")
    s"""karr AS (
       |  SELECT underlying, count(*) AS n_days,
       |    list({'s': 0.0::DOUBLE, 'm': 0.0::DOUBLE, 'p': 0.0::DOUBLE,
       |          'y': y} ORDER BY day_start) AS arr
       |  FROM kdy GROUP BY 1
       |),
       |kfold AS (
       |  SELECT underlying, n_days,
       |    list_reduce(
       |      list_prepend({'s': 0.0::DOUBLE, 'm': 0.0::DOUBLE,
       |        'p': CAST($P0Text AS DOUBLE), 'y': 0.0::DOUBLE}, arr),
       |      (a, b) -> {'s': $s, 'm': $m, 'p': $p, 'y': 0.0::DOUBLE})
       |      AS st
       |  FROM karr
       |)
       |SELECT underlying, n_days,
       |  st.m AS level, st.p AS p_var, st.s AS ssi
       |FROM kfold""".stripMargin
  }
}
