package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance over the snapshot
  * store's row-level changelog — the delta-view algebra (Blakeley et
  * al. 1986; Delta Live Tables / Materialize do exactly this) that
  * keeps a 100 TB table's aggregate fresh for the cost of the DELTA,
  * not a full re-scan: for additive aggregates,
  *   mv(v2) = mv(v1) ⊕ agg(added rows) ⊖ agg(removed rows)
  * where the changelog comes from [[graft.sources.SnapshotStore
  * .snapshotDiff]] — which itself never reads files carried between
  * the two versions, so the whole maintenance pass is
  * delta-proportional end to end.
  *
  * Exactness contract: the view's running sum is carried as
  * DECIMAL(28,6) (exact, order-free), so the incrementally
  * maintained view equals a from-scratch recompute BIT FOR BIT —
  * pinned by Round15cSpec. A double-typed running sum could not make
  * that promise (float addition is not associative); the view
  * renders to double only at the output edge. Groups whose row count
  * drops to zero leave the view (full-outer join + filter), and
  * brand-new groups enter it — both directions exercised in the
  * gated entry. */
object IncrementalMv {

  private val Dec = DecimalType(28, 6)

  /** Build the view from scratch: per-key exact count + decimal sum.
    * Shape contract: (keys..., n_rows BIGINT, sum_dec DECIMAL). */
  def build(df: DataFrame, keys: Seq[String], measure: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(measure).cast(Dec)).as("sum_dec"))

  /** Apply a snapshotDiff changelog (keys..., measure, change, n) to
    * a built view. One aggregate over the delta + one key-equi
    * full-outer join against the view — nothing proportional to the
    * table. */
  def maintain(mv: DataFrame, diff: DataFrame, keys: Seq[String],
      measure: String): DataFrame = {
    val sign = when(col("change") === "added", lit(1L)).otherwise(lit(-1L))
    val delta = diff
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(measure).cast(Dec) * col("n") * sign).as("d_sum"),
        sum(col("n") * sign).as("d_n"))
    mv.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_dec"), lit(0).cast(Dec)) +
          coalesce(col("d_sum"), lit(0).cast(Dec))).as("sum_dec")): _*)
      .where(col("n_rows") > 0)
  }

  /** Output edge: render the exact view to comparator-friendly
    * scalars. */
  def render(mv: DataFrame, keys: Seq[String]): DataFrame =
    mv.select(keys.map(col) ++ Seq(col("n_rows"),
      col("sum_dec").cast("double").as("amount_sum")): _*)
}
