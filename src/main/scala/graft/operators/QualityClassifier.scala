package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Trainable document classifier in the fastText / CCNet lineage —
  * the classifier-based quality gate every large pre-training corpus
  * runs (curated-reference vs crawl), as opposed to the rule-based
  * gates in [[TextAnalysis.qualityScore]] / repetitionMetrics.
  *
  * Model: logistic regression over the six interpretable per-document
  * quality features, z-score standardized. Weak labels come from
  * metadata (the classic trick: no hand labels — here "does the doc
  * belong to the high-resource slice", i.e. lang == 'en', whose
  * signal the English stopword-ratio feature carries).
  *
  * Scale design — this is distributed FULL-BATCH gradient descent
  * with nothing but O(d) state on the driver:
  *  - the feature frame is computed once (one corpus scan, all
  *    codegen'd column expressions) and cached;
  *  - every GD iteration is ONE aggregation over the cache: the
  *    gradient is d+1 partial sums (map-side combine, bytes per
  *    partition), so an iteration costs one cached-columnar pass no
  *    matter the corpus size — no per-row collect, no UDF, no RDD;
  *  - weights/means/stds are d doubles on the driver by construction
  *    (the 100 TB analog of "broadcast the model, aggregate the
  *    gradient" — exactly how parameter-server-free LR scales).
  *
  * Scoring is a pure column expression (broadcast-free: the weights
  * are literals folded into codegen), built in a FIXED left-to-right
  * association so an ANSI oracle can reproduce the margin bit-exactly.
  */
object QualityClassifier {

  /** Trained model + per-iteration mean log-loss trace (diagnostics,
    * driver-sized). */
  final case class Model(features: Seq[String], mean: Array[Double],
      std: Array[Double], weights: Array[Double], bias: Double,
      losses: Array[Double])

  val FeatureCols: Seq[String] = Seq("n_words", "avg_word_len",
    "punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio")

  /** doc_id + weak label + the six features, all double. Feature
    * definitions are EXACTLY [[TextAnalysis.qualityScore]]'s — the
    * two operators cannot drift. */
  def featureFrame(docs: DataFrame, label: Column): DataFrame =
    TextAnalysis.qualityScore(docs)
      .select(col("doc_id") +: label.cast("double").as("_y") +:
        FeatureCols.map(c => col(c).cast("double").as(c)): _*)

  /** Standardized feature columns in model order. */
  private def zCols(m: Model): Seq[Column] =
    m.features.zipWithIndex.map { case (f, j) =>
      (col(f) - lit(m.mean(j))) / lit(m.std(j))
    }

  /** The margin expression: bias + Σ z_j * w_j in FIXED left-to-right
    * fold order — the order the oracle's SQL `+` chain reproduces. */
  def marginCol(m: Model): Column =
    zCols(m).zip(m.weights.toSeq).foldLeft(lit(m.bias)) {
      case (acc, (z, w)) => acc + z * lit(w)
    }

  def train(feats: DataFrame, iters: Int = 40, lr: Double = 0.5): Model = {
    val d = FeatureCols.length
    val cached = feats.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = cached.agg(
        count(lit(1)).as("n"),
        FeatureCols.flatMap(f =>
          Seq(avg(col(f)), stddev_pop(col(f)))): _*).head()
      val n = stats.getLong(0)
      if (n == 0L)
        return Model(FeatureCols, Array.fill(d)(0.0), Array.fill(d)(1.0),
          Array.fill(d)(0.0), 0.0, Array.empty)
      def safe(x: Any): Double = x match {
        case null => 0.0
        case v: Double if v.isNaN => 0.0
        case v: Double => v
      }
      val mean = Array.tabulate(d)(j => safe(stats.get(1 + 2 * j)))
      val std = Array.tabulate(d) { j =>
        val s = safe(stats.get(2 + 2 * j)); if (s > 0.0) s else 1.0
      }
      // Project the STANDARDIZED features once over the cache: every
      // GD iteration's margin/gradient references the z attributes
      // instead of re-inlining the six ((f - mean)/std) subtrees per
      // occurrence (the margin tree is duplicated ~9x inside the
      // gradient/loss aggregate, so inlined z-subtrees made each
      // per-iteration plan hundreds of nodes — measured ~200 ms per
      // iteration of pure driver planning+codegen at ANY data size,
      // guide §1.2 step 2 / §7.3). Each z_j is the identical double
      // expression over the same cached rows — evaluated per pass as
      // a trivial columnar projection — so every gradient/loss sum is
      // bit-identical to the inlined form.
      val statsM = Model(FeatureCols, mean, std, Array.fill(d)(0.0), 0.0,
        Array.empty)
      val zFrame = cached.select(
        col("_y") +: zCols(statsM).zipWithIndex.map {
          case (z, j) => z.as(s"_z$j")
        }: _*)
      var m = statsM
      val losses = Array.newBuilder[Double]
      // margin over the projected z attributes, same left-to-right
      // fold (and therefore the same doubles) as [[marginCol]]
      def marginZ(mm: Model): Column =
        (0 until d).foldLeft(lit(mm.bias)) {
          case (acc, j) => acc + col(s"_z$j") * lit(mm.weights(j))
        }
      for (_ <- 0 until iters) {
        val p = lit(1.0) / (lit(1.0) + exp(-marginZ(m)))
        val pc = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
        val err = p - col("_y")
        val gradRow: Row = zFrame.agg(
          sum(err).as("g_b"),
          (0 until d).map(j => sum(err * col(s"_z$j"))) :+
            sum(-(col("_y") * log(pc) +
              (lit(1.0) - col("_y")) * log(lit(1.0) - pc))).as("loss"): _*
        ).head()
        val gb = gradRow.getDouble(0) / n
        val g = Array.tabulate(d)(j => gradRow.getDouble(1 + j) / n)
        losses += gradRow.getDouble(1 + d) / n
        m = m.copy(
          weights = Array.tabulate(d)(j => m.weights(j) - lr * g(j)),
          bias = m.bias - lr * gb)
      }
      m.copy(losses = losses.result())
    } finally { cached.unpersist(); () }
  }

  /** Per-doc scoring: margin (the gate-exact linear score), hard
    * prediction, and the weak label for accuracy audits. Sigmoid is
    * deliberately NOT in the verified output — exp() is libm-specific
    * across engines; the margin carries the same information
    * bit-exactly. */
  def score(feats: DataFrame, m: Model): DataFrame =
    feats.select(col("doc_id"), (col("_y") === 1.0).as("label"),
      marginCol(m).as("margin"), (marginCol(m) > 0.0).as("pred"))
}
