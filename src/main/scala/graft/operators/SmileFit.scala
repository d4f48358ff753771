package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quadratic volatility-smile fit — the parametric summary of the
  * moneyness-bucket smile the reference reads off A9's pivot
  * (reference `features/moneyness.py`: bucketed avg-IV smile
  * metrics); here the continuous version: per (underlying,
  * option_type), ordinary least squares of
  *
  *   iv ≈ a + b·m + c·m²,   m = strike / index_price
  *
  * fitted via the 3×3 normal equations solved in closed form
  * (Cramer's rule). Distributed shape: ONE hash aggregate with
  * map-side partials produces the eight power/cross sums; the solve
  * is a per-group scalar expression — no iteration, no driver math,
  * no second pass. At 100 TB this is the same plan as any other
  * bar aggregate.
  *
  * Exactness: moneyness is a plain ratio (deliberately NOT
  * log-moneyness — no libm call anywhere, so both engines' doubles
  * are bit-identical). Only the two INPUTS (m, iv) are quantized to
  * a 6-dp DECIMAL grid; every power and cross term is then computed
  * in DECIMAL arithmetic with explicitly pinned (precision, scale)
  * at each step, so all sums are exact with ZERO further rounding.
  * (Quantizing the double products directly — the first cut — is not
  * portable: Spark converts double→decimal via the shortest string
  * repr, DuckDB via the exact binary value, and at a 12-dp grid the
  * two roundings disagree for ~2e-4 of product values; observed at
  * sf0.01.) The Cramer solve is spelled from the SAME expression
  * strings in the Spark plan and the DuckDB oracle — IEEE +,−,×,/
  * are exactly rounded, so identical spelling on identical inputs
  * gives identical doubles.
  */
object SmileFit {

  /** Cramer's-rule coefficient expressions over the sum columns
    * s0..s4 (powers of m), t0..t2 (iv cross-moments) — shared
    * verbatim between the Spark plan (`expr`) and the oracle SQL. */
  val detExpr: String =
    "(s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s2*s3) + s2*(s1*s3 - s2*s2))"
  val aExpr: String =
    s"(t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2))" +
      s" / nullif($detExpr, 0.0)"
  val bExpr: String =
    s"(s0*(t1*s4 - s3*t2) - t0*(s1*s4 - s2*s3) + s2*(s1*t2 - t1*s2))" +
      s" / nullif($detExpr, 0.0)"
  val cExpr: String =
    s"(s0*(s2*t2 - s3*t1) - s1*(s1*t2 - t1*s2) + t0*(s1*s3 - s2*s2))" +
      s" / nullif($detExpr, 0.0)"
  /** Smile vertex (minimum-vol moneyness) from the FITTED b and c —
    * computed from the output coefficients on both engines. */
  val vertexExpr: String = "-b_coef / (2.0*c_coef)"

  def quadraticSmile(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DataTypes.createDecimalType
    val d6 = createDecimalType(16, 6)
    val d12 = createDecimalType(16, 12)
    val d18 = createDecimalType(20, 18)
    // sums leave decimal through a pinned (22,8) gate: the 8-dp int
    // value fits 2^53, so BOTH engines render it as the exactly
    // rounded (long / 10^8) double — a raw deep-scale decimal→double
    // differs by 1 ulp between engines, which Cramer cancellation
    // amplifies ~1e5× (observed at sf0.01)
    def dbl(c: org.apache.spark.sql.Column) =
      sum(c).cast(createDecimalType(22, 8)).cast("double")
    val valid = trades
      .filter(col("iv").isNotNull && col("index_price").isNotNull &&
        col("strike") > 0 && col("index_price") > 0)
      // the ONLY double→decimal roundings; everything after is exact
      .withColumn("mq", (col("strike") / col("index_price")).cast(d6))
      .withColumn("ivq", col("iv").cast(d6))
      // exact decimal ladder, scales pinned: m2 @12, m3 @18, m4 @24
      .withColumn("m2", (col("mq") * col("mq")).cast(d12))
      .withColumn("m3", (col("m2") * col("mq")).cast(d18))
      .withColumn("m4", col("m3") * col("mq"))
      .withColumn("t1r", col("ivq") * col("mq"))
      .withColumn("t2r", col("ivq") * col("m2"))
    valid
      .groupBy(col("underlying"), col("option_type"))
      .agg(
        count(lit(1)).as("n_fit"),
        dbl(col("mq")).as("s1"),
        dbl(col("m2")).as("s2"),
        dbl(col("m3")).as("s3"),
        dbl(col("m4")).as("s4"),
        dbl(col("ivq")).as("t0"),
        dbl(col("t1r")).as("t1"),
        dbl(col("t2r")).as("t2"))
      .withColumn("s0", col("n_fit").cast("double"))
      .withColumn("a_coef", expr(aExpr))
      .withColumn("b_coef", expr(bExpr))
      .withColumn("c_coef", expr(cExpr))
      .withColumn("vertex_m", expr(vertexExpr))
      .select("underlying", "option_type", "n_fit",
        "a_coef", "b_coef", "c_coef", "vertex_m")
  }
}
