package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain (removal-effect) attribution — the data-driven
  * multi-touch model (Anderl et al. 2016) that replaces ev11's
  * heuristic first/last-touch: user journeys become a first-order
  * Markov chain over channel states; a channel's credit is how much
  * the chain's START→CONV absorption probability drops when that
  * channel is removed (transitions into it re-routed to NULL).
  *
  * Distributed/driver split: journey extraction and the transition
  * counts are ONE user-keyed window exchange + a (src,dst) hash
  * aggregate — corpus-scale work, shuffle-keyed, no collect. What
  * reaches the driver is the (channels+2)² transition-count matrix
  * (the k-means-centroid bounded-collect contract); the absorption
  * solves are (channels+1)-sized Gaussian eliminations.
  *
  * Verification (echo+verify, the TermPca/EGARCH pattern): every
  * absorption vector is echoed into the oracle as literals, and the
  * oracle INDEPENDENTLY re-derives the transition counts in SQL and
  * checks each scenario's linear-system residual
  * |Σ_t c(s,t)·p(t) − p(s)·Σ_t c(s,t)| < 1e-6·max(1, Σ_t c(s,t))
  * per transient state — a wrong solve, or any drift in the journey
  * derivation, flips the gate and breaks the hash. */
object MarkovAttribution {

  val Channels: Seq[String] = Seq("view", "click", "signup", "error")
  val Conversion = "purchase"

  /** (src, dst, c) transition counts: journeys truncate at the FIRST
    * conversion; START precedes each journey; journeys without a
    * conversion terminate in NULL. */
  def transitionCounts(events: DataFrame, channels: Seq[String] = Channels,
      conversion: String = Conversion, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    val wPrior = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLag = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col(idCol))
    val kept = events
      .filter(col(typeCol).isin((channels :+ conversion): _*))
      .select(col(userCol), unix_micros(col(tsCol)).as("_us"),
        col(idCol), col(typeCol))
      .withColumn("_prior_conv",
        count(when(col(typeCol) === conversion, 1)).over(wPrior))
      .filter(col("_prior_conv") === 0)
    val steps = kept
      .withColumn("_prev", lag(col(typeCol), 1).over(wLag))
      .select(
        coalesce(col("_prev"), lit("START")).as("src"),
        when(col(typeCol) === conversion, "CONV")
          .otherwise(col(typeCol)).as("dst"))
    val terminals = kept
      .groupBy(col(userCol))
      .agg(
        max(when(col(typeCol) === conversion, 1).otherwise(0))
          .as("_has_conv"),
        max_by(col(typeCol), struct(col("_us"), col(idCol)))
          .as("_last"))
      .filter(col("_has_conv") === 0)
      .select(col("_last").as("src"), lit("NULL").as("dst"))
    steps.union(terminals)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("c"))
  }

  /** Absorption probability into CONV from each transient state for
    * the chain given by `counts`, with `removed` (optionally) taken
    * out: its outgoing transitions dropped, inbound re-routed to
    * NULL. States with no outgoing mass absorb into NULL (p = 0).
    * Returns the transient-state → p map (START included). */
  def absorption(counts: Map[(String, String), Long],
      channels: Seq[String], removed: Option[String]): Map[String, Double] = {
    val transient = "START" +: channels.filterNot(removed.contains)
    val idx = transient.zipWithIndex.toMap
    val n = transient.size
    // effective counts after removal: src==removed rows dropped,
    // dst==removed re-routed to NULL (i.e. contributes only to the
    // row sum, not to any transient/CONV column)
    val a = Array.ofDim[Double](n, n + 1)
    for (s <- transient; i = idx(s)) {
      val out = counts.collect {
        case ((`s`, d), c) if !removed.contains(s) => (d, c)
      }
      val rowSum = out.map(_._2).sum.toDouble
      if (rowSum == 0) {
        a(i)(i) = 1.0 // p(s) = 0
      } else {
        // rowSum·p(s) − Σ_{t transient} c(s,t)·p(t) = c(s,CONV)
        a(i)(i) = rowSum
        for ((d, c) <- out) {
          if (idx.contains(d)) a(i)(idx(d)) -= c.toDouble
          else if (d == "CONV") a(i)(n) += c.toDouble
          // NULL or removed dst: contributes to rowSum only
        }
      }
    }
    // Gaussian elimination with partial pivoting (n <= channels+1)
    for (k <- 0 until n) {
      val piv = (k until n).maxBy(r => math.abs(a(r)(k)))
      val tmp = a(k); a(k) = a(piv); a(piv) = tmp
      require(math.abs(a(k)(k)) > 1e-12, s"singular system at $k")
      for (r <- k + 1 until n) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k to n) a(r)(c) -= f * a(k)(c)
      }
    }
    val p = new Array[Double](n)
    for (k <- n - 1 to 0 by -1) {
      var acc = a(k)(n)
      for (c <- k + 1 until n) acc -= a(k)(c) * p(c)
      p(k) = acc / a(k)(k)
    }
    transient.zip(p).toMap
  }

  /** Driver-side attribution table: per channel, the removal CVR,
    * removal effect vs the base CVR, and the normalized share. */
  def attribution(counts: Map[(String, String), Long],
      channels: Seq[String] = Channels)
      : (Map[String, Double], Seq[(String, Double, Double, Double)]) = {
    val base = absorption(counts, channels, None)
    val baseCvr = base("START")
    val effects = channels.map { ch =>
      val pr = absorption(counts, channels, Some(ch))("START")
      val eff = if (baseCvr > 0) (baseCvr - pr) / baseCvr else 0.0
      (ch, pr, eff)
    }
    val effSum = effects.map(_._3).sum
    val rows = effects.map { case (ch, pr, eff) =>
      (ch, pr, eff, if (effSum != 0) eff / effSum else 0.0)
    }
    (base, rows)
  }
}
