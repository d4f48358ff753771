package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Parity

/** LSH parameter planner for the MinHash near-dup family: given k
  * signature slots and a target Jaccard threshold t, evaluate every
  * (bands b, rows r) decomposition b·r = k on the S-curve
  * P(collide | J=j) = 1 − (1 − j^r)^b over a j-grid, and score each
  * by the false-positive mass (Σ p below t) plus false-negative mass
  * (Σ (1−p) at/above t). The config minimizing that total is the one
  * [[TextDedup.minhashNearDups]] should run with — this is the
  * planning step the dedup literature does on a napkin, made a
  * first-class, verifiable operator.
  *
  * Everything is a few dozen rows of pure math — no table input —
  * but the discipline still matters: pow() outputs are 9-dp
  * grid-quantized (JVM vs libm 1-ulp), the threshold comparison is
  * pure integer arithmetic (j_i·thrDen vs thrNum·gridN — no float
  * threshold), and the winner flag rides a one-row broadcast min,
  * not a window. */
object LshPlanner {

  /** All (bands, rowsPerBand) decompositions of k, bands ascending. */
  def configs(k: Int): Seq[(Int, Int)] =
    (1 to k).filter(k % _ == 0).map(b => (b, k / b))

  /** One row per (bands, rows_per_band): fp_mass, fn_mass, total_err,
    * is_optimal (min total_err; ties keep every minimizer). */
  def bandPlan(spark: SparkSession, k: Int, thrNum: Int, thrDen: Int,
      gridN: Int = 20): DataFrame = {
    import spark.implicits._
    val cfg = configs(k).toDF("bands", "rows_per_band")
    val pts = cfg
      .withColumn("j_i", explode(sequence(lit(1), lit(gridN - 1))))
      .withColumn("j", col("j_i").cast("double") / lit(gridN.toDouble))
      .withColumn("p_band",
        Parity.roundTo(pow(col("j"), col("rows_per_band").cast("double")), 9))
      .withColumn("p_coll",
        lit(1.0) - Parity.roundTo(
          pow(lit(1.0) - col("p_band"), col("bands").cast("double")), 9))
      // integer-exact threshold test: j_i/gridN < thrNum/thrDen
      .withColumn("below", col("j_i") * thrDen < lit(thrNum * gridN))
    val scored = pts
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(
        count(lit(1)).as("n_grid"),
        Parity.dsum(when(col("below"), col("p_coll")).otherwise(lit(0.0)))
          .as("fp_mass"),
        Parity.dsum(when(!col("below"), lit(1.0) - col("p_coll"))
          .otherwise(lit(0.0))).as("fn_mass"))
      .withColumn("total_err", col("fp_mass") + col("fn_mass"))
    val best = scored.agg(min(col("total_err")).as("_best"))
    scored
      .crossJoin(broadcast(best))
      .withColumn("is_optimal", col("total_err") === col("_best"))
      .drop("_best")
  }
}
