package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.util.Parity

/** Price-path dynamics beyond the reference's vol family: AR(1)/OU
  * mean-reversion speed and the Hill tail-index estimator — the two
  * panels a vol desk reads next to realized vol (how fast does vol
  * revert, how fat are the return tails).
  *
  * Scale shape (both): the only corpus-sized work is the tick→bar
  * hash aggregate; everything after runs on the bar table (bounded by
  * symbols × buckets, not by tape length). The Hill threshold uses
  * [[DistributedSelection]] — an exact order statistic with no
  * per-key global sort — so the operator keeps its exactness at any
  * key skew.
  *
  * Parity contract (the m29/SpotCorr discipline): returns are
  * quantized once to DECIMAL(12,8) / log-prices to DECIMAL(18,8);
  * every sum of products is pure decimal arithmetic gated through
  * DECIMAL(24,16) before the double algebra; each transcendental
  * (ln) output is grid-quantized via [[Parity.roundTo]] because JVM
  * and libm logs disagree by 1 ulp.
  */
object TailDynamics {

  private val LN2: Double = math.log(2.0)

  private val d8 = DataTypes.createDecimalType(12, 8)
  private val d14 = DataTypes.createDecimalType(14, 5)
  private val d24 = DataTypes.createDecimalType(24, 10)

  /** Centering constant for the OU log-price regression: rho is
    * shift-invariant, and centering keeps every decimal product sum's
    * unscaled integer below 2^53 so the decimal→double render is
    * exactly rounded on BOTH engines — uncentered ln(close) ≈ 9-14
    * at scale-16 products converts with 1-ulp engine differences
    * that the variance cancellation amplifies ~1e5× (the Cramer
    * lesson in [[graft.util.Parity]]). */
  val OuCenter: Double = 9.0

  /** M37: Ornstein–Uhlenbeck (AR(1)) mean-reversion fit on daily log
    * closes per symbol: regress x_t on x_{t-1} over consecutive
    * observations; rho is the AR(1) coefficient and the half-life is
    * −ln2/ln(rho) days (null unless 0 < rho < 1, i.e. the series
    * actually mean-reverts). Missing days are treated as consecutive
    * observations (calendar gaps don't break the pair chain) — the
    * estimator is over the OBSERVED grid, stated, not hidden.
    *
    * One tape-sized hash aggregate (tick→daily close), then a lag
    * window plus one grouped aggregate over the tiny daily table. */
  def ouHalfLife(ticks: DataFrame): DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val daily = ticks
      .withColumn("_ep", ep)
      .withColumn("day", expr("_ep div 86400L"))
      .groupBy(col("symbol"), col("day"))
      .agg(max_by(col("close"), col("timestamp")).as("close"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
    val pairs = daily
      // ln output centered then quantized to the 5-dp grid BEFORE the
      // decimal cast so both engines sum identical values, and the
      // scale-10 product sums stay exactly double-convertible
      .withColumn("xq",
        Parity.roundTo(log(col("close")) - lit(OuCenter), 5).cast(d14))
      .withColumn("xp", lag(col("xq"), 1).over(w))
      .filter(col("xp").isNotNull)
    val dbl = (c: org.apache.spark.sql.Column) => c.cast(d24).cast("double")
    pairs
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_pairs"),
        dbl(sum(col("xp"))).as("sx"),
        dbl(sum(col("xq"))).as("sy"),
        dbl(sum(col("xp") * col("xq"))).as("sxy"),
        dbl(sum(col("xp") * col("xp"))).as("sxx"))
      .withColumn("nd", col("n_pairs").cast("double"))
      .withColumn("rho",
        expr("(nd*sxy - sx*sy) / nullif(nd*sxx - sx*sx, 0.0)"))
      .withColumn("half_life_days",
        when(col("rho") > 0.0 && col("rho") < 1.0,
          Parity.roundTo(lit(-LN2) / log(col("rho")), 6)))
      .select(col("symbol"), col("n_pairs"), col("rho"),
        col("half_life_days"))
  }

  /** M38: Hill tail-index estimator on 15-min absolute bar returns
    * per symbol: threshold u = the exact element at rank
    * ceil(0.9·n) of |r| (the empirical 90th percentile via
    * distributed selection), exceedances are STRICTLY above u, and
    * alpha = k / Σ ln(x_i/u) over the k exceedances (alpha ≈ 2-4 for
    * fat-tailed returns; smaller = fatter). Output: symbol,
    * n_returns, k_tail, u_threshold, alpha. Symbols with zero strict
    * exceedances (e.g. a fully degenerate tail where every |r| equals
    * the threshold) are omitted from the output entirely — the
    * `aq > u` filter precedes the groupBy, so no null-alpha row is
    * ever produced. */
  def hillTail(ticks: DataFrame, intervalSec: Long = 900L,
      tailNum: Int = 9, tailDen: Int = 10): DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val bars = ticks
      .withColumn("_ep", ep)
      .withColumn("bucket", col("_ep") - col("_ep") % intervalSec)
      .groupBy(col("symbol"), col("bucket"))
      .agg(max_by(col("close"), col("timestamp")).as("close"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket"))
    val rets = bars
      .withColumn("_r", col("close") / lag(col("close"), 1).over(w) - 1.0)
      .withColumn("aq", abs(col("_r")).cast(d8))
      .filter(col("aq").isNotNull && col("aq") > 0)
      .select(col("symbol"), col("aq"))
    // exact per-symbol order statistic, no per-key global sort
    val th = DistributedSelection
      .quantiles(rets, "symbol", "aq", Seq((tailNum, tailDen, "u")))
      .withColumnRenamed("n_trades", "n_returns")
    rets
      .join(broadcast(th), Seq("symbol"))
      .filter(col("aq") > col("u"))
      .withColumn("t",
        Parity.roundTo(
          log(col("aq").cast("double") / col("u").cast("double")), 9))
      .groupBy(col("symbol"))
      .agg(
        max(col("n_returns")).as("n_returns"),
        count(lit(1)).as("k_tail"),
        max(col("u")).cast("double").as("u_threshold"),
        Parity.dsum(col("t")).as("_sum_ln"))
      .withColumn("alpha",
        col("k_tail").cast("double") / nullif(col("_sum_ln"), lit(0.0)))
      .select(col("symbol"), col("n_returns"), col("k_tail"),
        col("u_threshold"), col("alpha"))
  }
}
