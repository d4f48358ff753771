package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** HAR-RV (Corsi 2009, "A simple approximate long-memory model of
  * realized volatility"): tomorrow's realized variance regressed on
  * today's RV and its weekly/monthly accumulations — the benchmark
  * realized-vol forecaster the EGARCH family (m3-m6) is usually
  * judged against. Pooled OLS per underlying, solved in closed form
  * from the 4×4 normal equations.
  *
  * Fitted in VOL units (rq = sqrt(rv), the model's standard
  * volatility form — sqrt is a correctly-rounded IEEE op, and it
  * keeps magnitudes small enough for exact decimal algebra below).
  *
  * Cross-engine exactness (the Cramer-cancellation trap): the daily
  * vol series is quantized once into DECIMAL(16,4); the heterogeneous
  * regressors are rolling SUMS (not means — a decimal mean would
  * divide and re-round) over 5- and 10-day row windows, cast back to
  * DECIMAL(16,4) (exact: same scale, values in range — this keeps
  * Spark's product-precision arithmetic inside 38 digits where it is
  * exact, and DuckDB's inside int64), so d/w/m/y and every pairwise
  * product stay EXACT decimals whose sums are order-free; moments
  * convert to double losslessly (scale-8 integer values < 2^53); and
  * the determinant expansion that solves the system is generated ONCE
  * as expression text evaluated verbatim by Spark's `expr` and
  * DuckDB — identical IEEE sequences on identical inputs, so even the
  * 24-term alternating sums agree bit-for-bit. (VERIFY note:
  * deep-scale decimal→double gates diverge by 1 ulp and Cramer
  * amplifies ~1e5× — the scale-4 quantization is the load-bearing
  * choice.)
  *
  * Scale shape: the rv series is day-grained (data-volume
  * independent); the rolling windows partition by underlying; the
  * moment pass is one hash aggregate to a FEW-ROW frame, and the
  * solve is per-row column arithmetic — nothing here grows with the
  * tape. */
object HarRv {

  /** Weekly/monthly accumulation windows (trading days). 5/10 rather
    * than the classical 5/22 — the synthetic tape spans ~1 month. */
  val WeekDays = 5
  val MonthDays = 10

  /** Minimum regression rows per underlying (drop degenerate fits). */
  val MinObs = 12

  private def permSign(p: Seq[Int]): Int = {
    var inv = 0
    for (i <- p.indices; j <- i + 1 until p.length if p(i) > p(j)) inv += 1
    if (inv % 2 == 0) 1 else -1
  }

  /** 24-term Leibniz expansion of a 4×4 determinant over column-name
    * strings — fixed permutation order (lexicographic), fixed sign
    * placement, so the emitted text is deterministic and shared
    * verbatim by both engines.
    *
    * Factors are SORTED within each product: on a symmetric moment
    * matrix two permutations can hit the same factor multiset in
    * different orders, and Spark's subexpression elimination
    * canonicalizes commutative Multiply chains — it would compute ONE
    * of the spellings and reuse it for both terms, while DuckDB
    * evaluates each as written (1-ulp skew that Cramer amplifies
    * ~1e8×; found the hard way in round 13). With sorted factors the
    * colliding terms are the same text, so CSE reuse and
    * as-written evaluation agree bit-for-bit. */
  def det4(m: IndexedSeq[IndexedSeq[String]]): String = {
    val terms = (0 to 3).permutations.toList.map { p =>
      (permSign(p), (0 to 3).map(r => m(r)(p(r))).sorted.mkString(" * "))
    }
    terms.zipWithIndex.map { case ((s, prod), i) =>
      if (i == 0) (if (s > 0) prod else s"0.0 - $prod")
      else if (s > 0) s"+ $prod" else s"- $prod"
    }.mkString("(", " ", ")")
  }

  /** Moment-matrix column names: A = X'X over x = (1, d, w, m),
    * b = X'y — all as DOUBLE columns of the per-underlying moment
    * frame. */
  private val A: IndexedSeq[IndexedSeq[String]] = IndexedSeq(
    IndexedSeq("nd", "sd", "sw", "sm"),
    IndexedSeq("sd", "sdd", "sdw", "sdm"),
    IndexedSeq("sw", "sdw", "sww", "swm"),
    IndexedSeq("sm", "sdm", "swm", "smm"))
  private val bVec = IndexedSeq("sy", "sdy", "swy", "smy")

  private def withCol(i: Int): IndexedSeq[IndexedSeq[String]] =
    A.indices.map(r => A(r).updated(i, bVec(r)))

  /** Shared beta/r² expression texts over the moment columns. */
  val detA: String = det4(A)
  // Cramer denominator guarded with nullif: an exactly-collinear
  // series (detA = 0) must yield NULL in BOTH engines — Spark's
  // non-ANSI x/0 is NULL but DuckDB's IEEE division is Inf/NaN,
  // which would hash-mismatch on degenerate input.
  val betaSql: IndexedSeq[String] =
    (0 to 3).map(i => s"${det4(withCol(i))} / nullif($detA, 0.0)")
  val r2Sql: String = {
    val sse = s"syy - ((${betaSql(0)}) * sy + (${betaSql(1)}) * sdy " +
      s"+ (${betaSql(2)}) * swy + (${betaSql(3)}) * smy)"
    val sst = "syy - sy * sy / nd"
    s"1.0 - ($sse) / nullif($sst, 0.0)"
  }

  /** The regression frame: rq (DECIMAL(16,4) bp² daily rv), rolling
    * sums w/m, next-day target y; rows with a full month window and
    * a target only. */
  def regressionFrame(daily: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("underlying")).orderBy(col("day_start"))
    val w5 = ord.rowsBetween(-(WeekDays - 1), 0)
    val w10 = ord.rowsBetween(-(MonthDays - 1), 0)
    daily
      .select(col("underlying"), col("day_start"),
        round(sqrt(col("rv_cc")), 4).cast(DecimalType(16, 4)).as("rq"))
      .withColumn("d", col("rq"))
      .withColumn("w",
        sum(col("rq")).over(w5).cast(DecimalType(16, 4)))
      .withColumn("m",
        sum(col("rq")).over(w10).cast(DecimalType(16, 4)))
      .withColumn("c10", count(lit(1)).over(w10))
      .withColumn("y", lead(col("rq"), 1).over(ord))
      .where(col("c10") === MonthDays && col("y").isNotNull)
      .select(col("underlying"), col("day_start"),
        col("d"), col("w"), col("m"), col("y"))
  }

  /** HAR-RV fit per underlying from a daily frame (underlying,
    * day_start, rv_cc): n_obs, intercept + d/w/m betas (vol units,
    * sum-parameterized — the weekly/monthly betas absorb the 1/5 and
    * 1/10), in-sample r². */
  def fit(daily: DataFrame): DataFrame = {
    def mom(a: String, b: String) =
      sum(col(a) * col(b)).cast("double")
    val moments = regressionFrame(daily)
      .groupBy(col("underlying"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("d")).cast("double").as("sd"),
        sum(col("w")).cast("double").as("sw"),
        sum(col("m")).cast("double").as("sm"),
        sum(col("y")).cast("double").as("sy"),
        mom("d", "d").as("sdd"), mom("d", "w").as("sdw"),
        mom("d", "m").as("sdm"), mom("d", "y").as("sdy"),
        mom("w", "w").as("sww"), mom("w", "m").as("swm"),
        mom("w", "y").as("swy"), mom("m", "m").as("smm"),
        mom("m", "y").as("smy"), mom("y", "y").as("syy"))
      .where(col("n_obs") >= MinObs)
      .withColumn("nd", col("n_obs").cast("double"))
    moments.select(
      col("underlying"), col("n_obs"),
      expr(betaSql(0)).as("b0"),
      expr(betaSql(1)).as("b_d"),
      expr(betaSql(2)).as("b_w"),
      expr(betaSql(3)).as("b_m"),
      expr(r2Sql).as("r2"))
  }

  /** Shared 2-var Mincer–Zarnowitz texts over the same moment
    * columns: regress next-day vol y on the weekly accumulation w
    * (the sum-parameterized naive forecast; β absorbs the 1/5).
    * Closed-form slope/intercept/R² — evaluated verbatim by both
    * engines, like [[betaSql]]. */
  // Denominators guarded like betaSql's: a constant-w or constant-y
  // series must be NULL in both engines, not Inf/NaN in DuckDB.
  val mzBetaSql: String =
    "(nd * swy - sw * sy) / nullif(nd * sww - sw * sw, 0.0)"
  val mzAlphaSql: String = s"(sy - ($mzBetaSql) * sw) / nd"
  val mzR2Sql: String =
    "((nd * swy - sw * sy) * (nd * swy - sw * sy)) " +
      "/ nullif((nd * sww - sw * sw) * (nd * syy - sy * sy), 0.0)"

  /** MZ forecast evaluation per underlying (n_obs, mz_alpha, mz_beta,
    * mz_r2) from the same daily frame as [[fit]] — an unbiased
    * efficient forecast has α=0, β=1/5 in this sum parameterization;
    * R² is the forecast's explanatory share. */
  def mzEval(daily: DataFrame): DataFrame = {
    def mom(a: String, b: String) = sum(col(a) * col(b)).cast("double")
    regressionFrame(daily)
      .groupBy(col("underlying"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("w")).cast("double").as("sw"),
        sum(col("y")).cast("double").as("sy"),
        mom("w", "w").as("sww"), mom("w", "y").as("swy"),
        mom("y", "y").as("syy"))
      .where(col("n_obs") >= MinObs)
      .withColumn("nd", col("n_obs").cast("double"))
      .select(col("underlying"), col("n_obs"),
        expr(mzAlphaSql).as("mz_alpha"),
        expr(mzBetaSql).as("mz_beta"),
        expr(mzR2Sql).as("mz_r2"))
  }

  /** DuckDB MZ tail over the same `rvd` CTE contract as [[duckTail]]. */
  def duckMzTail: String =
    s"""hrq AS (
       |  SELECT underlying, day_start,
       |    CAST(round(sqrt(rv_cc), 4) AS DECIMAL(16,4)) AS rq
       |  FROM rvd
       |),
       |hwin AS (
       |  SELECT underlying, day_start, rq AS d,
       |    CAST(sum(rq) OVER (PARTITION BY underlying ORDER BY day_start
       |      ROWS BETWEEN ${WeekDays - 1} PRECEDING AND CURRENT ROW)
       |      AS DECIMAL(16,4)) AS w,
       |    count(*) OVER (PARTITION BY underlying ORDER BY day_start
       |      ROWS BETWEEN ${MonthDays - 1} PRECEDING AND CURRENT ROW)
       |      AS c10,
       |    lead(rq) OVER (PARTITION BY underlying ORDER BY day_start)
       |      AS y
       |  FROM hrq
       |),
       |hreg AS (
       |  SELECT underlying, w, y FROM hwin
       |  WHERE c10 = $MonthDays AND y IS NOT NULL
       |),
       |hmom AS (
       |  SELECT underlying, count(*) AS n_obs,
       |    CAST(sum(w) AS DOUBLE) AS sw, CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(w*w) AS DOUBLE) AS sww, CAST(sum(w*y) AS DOUBLE) AS swy,
       |    CAST(sum(y*y) AS DOUBLE) AS syy
       |  FROM hreg GROUP BY 1
       |  HAVING count(*) >= $MinObs
       |),
       |hsolve AS (
       |  SELECT *, CAST(n_obs AS DOUBLE) AS nd FROM hmom
       |)
       |SELECT underlying, n_obs,
       |  $mzAlphaSql AS mz_alpha,
       |  $mzBetaSql AS mz_beta,
       |  $mzR2Sql AS mz_r2
       |FROM hsolve""".stripMargin

  /** DuckDB tail: from a CTE `rvd(underlying, day_start, rv_cc)`,
    * the identical regression frame, moments, and shared-text solve.
    * Returns CTE list + final SELECT (no WITH). */
  def duckTail: String =
    s"""hrq AS (
       |  SELECT underlying, day_start,
       |    CAST(round(sqrt(rv_cc), 4) AS DECIMAL(16,4)) AS rq
       |  FROM rvd
       |),
       |hwin AS (
       |  SELECT underlying, day_start, rq AS d,
       |    CAST(sum(rq) OVER (PARTITION BY underlying ORDER BY day_start
       |      ROWS BETWEEN ${WeekDays - 1} PRECEDING AND CURRENT ROW)
       |      AS DECIMAL(16,4)) AS w,
       |    CAST(sum(rq) OVER (PARTITION BY underlying ORDER BY day_start
       |      ROWS BETWEEN ${MonthDays - 1} PRECEDING AND CURRENT ROW)
       |      AS DECIMAL(16,4)) AS m,
       |    count(*) OVER (PARTITION BY underlying ORDER BY day_start
       |      ROWS BETWEEN ${MonthDays - 1} PRECEDING AND CURRENT ROW)
       |      AS c10,
       |    lead(rq) OVER (PARTITION BY underlying ORDER BY day_start)
       |      AS y
       |  FROM hrq
       |),
       |hreg AS (
       |  SELECT underlying, d, w, m, y FROM hwin
       |  WHERE c10 = $MonthDays AND y IS NOT NULL
       |),
       |hmom AS (
       |  SELECT underlying, count(*) AS n_obs,
       |    CAST(sum(d) AS DOUBLE) AS sd, CAST(sum(w) AS DOUBLE) AS sw,
       |    CAST(sum(m) AS DOUBLE) AS sm, CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(d*d) AS DOUBLE) AS sdd, CAST(sum(d*w) AS DOUBLE) AS sdw,
       |    CAST(sum(d*m) AS DOUBLE) AS sdm, CAST(sum(d*y) AS DOUBLE) AS sdy,
       |    CAST(sum(w*w) AS DOUBLE) AS sww, CAST(sum(w*m) AS DOUBLE) AS swm,
       |    CAST(sum(w*y) AS DOUBLE) AS swy, CAST(sum(m*m) AS DOUBLE) AS smm,
       |    CAST(sum(m*y) AS DOUBLE) AS smy, CAST(sum(y*y) AS DOUBLE) AS syy
       |  FROM hreg GROUP BY 1
       |  HAVING count(*) >= $MinObs
       |),
       |hsolve AS (
       |  SELECT *, CAST(n_obs AS DOUBLE) AS nd FROM hmom
       |)
       |SELECT underlying, n_obs,
       |  ${betaSql(0)} AS b0,
       |  ${betaSql(1)} AS b_d,
       |  ${betaSql(2)} AS b_w,
       |  ${betaSql(3)} AS b_m,
       |  $r2Sql AS r2
       |FROM hsolve""".stripMargin
}
