package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid gap fill over an irregular bar series — ClickHouse's
  * `ORDER BY ... WITH FILL STEP` + pandas `asfreq().ffill()/
  * interpolate()` in one pass: the per-key [min, max] bucket range is
  * densified with `explode(sequence(...))` (calendar-bounded per key,
  * never tape-proportional), observations left-join onto the grid,
  * and the filled values come from TWO window passes:
  *
  *   - forward fill WITHOUT `IGNORE NULLS` (not all engines agree on
  *     its window semantics): `grp = count(obs) over (key, asc)` tags
  *     every row with the id of the latest observation at-or-before
  *     it, and `max(obs) over (key, grp)` recovers that observation's
  *     value — each grp partition holds exactly one non-null.
  *   - linear interpolation: the mirrored descending pass recovers
  *     the NEXT observation (value, bucket); interior gaps get
  *     prev + (next − prev) · Δt/ΔT, leading/trailing gaps stay null
  *     (there is no second anchor to interpolate toward).
  *
  * Execution shape: one grid explode + one equi-join + four windows,
  * all partitioned by the series key — nothing global, nothing
  * driver-side; the same plan at 100 TB shuffles each key's calendar
  * span, not the tape. */
object GapFill {

  /** bars: (underlying, bucket_start: LONG epoch-s, iv_close). */
  def fill(bars: DataFrame, stepSec: Long): DataFrame = {
    val grid = bars.groupBy(col("underlying"))
      .agg(min(col("bucket_start")).as("mn"), max(col("bucket_start")).as("mx"))
      .select(col("underlying"),
        explode(sequence(col("mn"), col("mx"), lit(stepSec)))
          .as("bucket_start"))
    val j = grid.join(bars, Seq("underlying", "bucket_start"), "left")
    val asc = Window.partitionBy(col("underlying")).orderBy(col("bucket_start"))
    val desc = Window.partitionBy(col("underlying"))
      .orderBy(col("bucket_start").desc)
    val obsT = when(col("iv_close").isNotNull, col("bucket_start"))
    val g = j
      .withColumn("gp", count(col("iv_close")).over(asc))
      .withColumn("gn", count(col("iv_close")).over(desc))
    val byGp = Window.partitionBy(col("underlying"), col("gp"))
    val byGn = Window.partitionBy(col("underlying"), col("gn"))
    g.withColumn("prev_iv", max(col("iv_close")).over(byGp))
      .withColumn("prev_t", max(obsT).over(byGp))
      .withColumn("next_iv", max(col("iv_close")).over(byGn))
      .withColumn("next_t", max(obsT).over(byGn))
      .select(
        col("underlying"), col("bucket_start"),
        col("iv_close").isNotNull.as("observed"),
        coalesce(col("iv_close"), col("prev_iv")).as("iv_ffill"),
        when(col("iv_close").isNotNull, col("iv_close"))
          .when(col("prev_iv").isNotNull && col("next_iv").isNotNull &&
              col("next_t") > col("prev_t"),
            col("prev_iv") + (col("next_iv") - col("prev_iv")) *
              ((col("bucket_start") - col("prev_t")).cast("double") /
                (col("next_t") - col("prev_t")).cast("double")))
          .as("iv_interp"))
  }

  /** DuckDB spelling from a CTE `bars(underlying, bucket_start,
    * iv_close)` — the identical grid/group/window construction. */
  def duckTail(stepSec: Long): String =
    s"""bounds AS (
       |  SELECT underlying, min(bucket_start) AS mn, max(bucket_start) AS mx
       |  FROM bars GROUP BY underlying),
       |grid AS (
       |  SELECT underlying, unnest(generate_series(mn, mx, $stepSec))
       |    AS bucket_start
       |  FROM bounds),
       |j AS (
       |  SELECT g.underlying, g.bucket_start, b.iv_close
       |  FROM grid g LEFT JOIN bars b
       |    ON g.underlying = b.underlying
       |   AND g.bucket_start = b.bucket_start),
       |tagged AS (
       |  SELECT *,
       |    count(iv_close) OVER (PARTITION BY underlying
       |      ORDER BY bucket_start) AS gp,
       |    count(iv_close) OVER (PARTITION BY underlying
       |      ORDER BY bucket_start DESC) AS gn
       |  FROM j),
       |anch AS (
       |  SELECT *,
       |    max(iv_close) OVER (PARTITION BY underlying, gp) AS prev_iv,
       |    max(CASE WHEN iv_close IS NOT NULL THEN bucket_start END)
       |      OVER (PARTITION BY underlying, gp) AS prev_t,
       |    max(iv_close) OVER (PARTITION BY underlying, gn) AS next_iv,
       |    max(CASE WHEN iv_close IS NOT NULL THEN bucket_start END)
       |      OVER (PARTITION BY underlying, gn) AS next_t
       |  FROM tagged)
       |SELECT underlying, bucket_start,
       |  iv_close IS NOT NULL AS observed,
       |  coalesce(iv_close, prev_iv) AS iv_ffill,
       |  CASE WHEN iv_close IS NOT NULL THEN iv_close
       |       WHEN prev_iv IS NOT NULL AND next_iv IS NOT NULL
       |            AND next_t > prev_t
       |       THEN prev_iv + (next_iv - prev_iv) *
       |         (CAST(bucket_start - prev_t AS DOUBLE) /
       |          CAST(next_t - prev_t AS DOUBLE))
       |  END AS iv_interp
       |FROM anch""".stripMargin
}
