package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.util.Parity

/** PCA of the embedding matryoshka head — the standard corpus-level
  * diagnostic before ANN index choice (how concentrated is the
  * spectrum? is one direction soaking up the variance → whitening
  * needed?). Runs on the first `dim` coordinates (the MRL-truncation
  * contract of `llm_mrl_recall`): PCA of the head is what an MRL
  * index actually searches.
  *
  * Same distributed contract as [[TermPca]] at d=`dim`: one
  * groupless aggregate reduces the corpus to the exact d(d+3)/2+1
  * moment sums (data-volume-independent driver state), covariance
  * closes over them in the same spelled-out form the oracle
  * re-derives in SQL, and only the d×d matrix is collected. Power
  * iteration on the driver; the eigenpair is echo+verify-gated
  * (‖Cv − λv‖∞ < 1e-8, ‖v‖₂ = 1 re-checked in SQL).
  *
  * Exactness: float32 coordinates are exact doubles and float×float
  * products are exact in double (24-bit mantissas), so every moment
  * sum is a 6-dp decimal sum of exactly-representable values. */
object EmbedPca {

  /** n + Σx_i + Σx_i·x_j (i ≤ j) over the first `dim` coordinates —
    * ONE groupless aggregate. */
  def momentSums(emb: DataFrame, dim: Int,
      vecCol: String = "embedding"): DataFrame = {
    val proj = emb.select((0 until dim).map(i =>
      element_at(col(vecCol), i + 1).cast("double").as(s"x$i")): _*)
    val sums = (0 until dim).map(i => Parity.dsum(col(s"x$i")).as(s"s$i")) ++
      (for (i <- 0 until dim; j <- i until dim)
        yield Parity.dsum(col(s"x$i") * col(s"x$j")).as(s"s${i}_$j"))
    proj.agg(count(lit(1)).as("n"), sums: _*)
  }

  /** cov(i,j) = (Σxy − Σx·Σy/n)/(n−1) from the collected moment row. */
  def covFromMoments(m: Row, dim: Int): (Array[Array[Double]], Long) = {
    val n = m.getAs[Long]("n")
    val nd = n.toDouble
    val s = (0 until dim).map(i => m.getAs[Double](s"s$i")).toArray
    val c = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val sxy = m.getAs[Double](s"s${i}_$j")
      val v = (sxy - s(i) * s(j) / nd) / (nd - 1.0)
      c(i)(j) = v; c(j)(i) = v
    }
    (c, n)
  }

  /** Top eigenpair by power iteration (driver-side, d×d); sign fixed
    * so the first loading is non-negative, vector 2-normalized. */
  def topEigen(c: Array[Array[Double]], iters: Int = 200)
      : (Double, Array[Double]) = {
    val d = c.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 0 until iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val lambda = (0 until d).map(i =>
      (0 until d).map(j => v(i) * c(i)(j) * v(j)).sum).sum
    if (v(0) < 0) v = v.map(-_)
    (lambda, v)
  }
}
