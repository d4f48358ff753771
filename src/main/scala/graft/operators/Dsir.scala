package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * 2023): score every raw document by how much more likely its
  * hashed-unigram features are under a target-domain distribution
  * than under the raw-corpus distribution, and keep the docs whose
  * mean log-ratio clears a threshold. The standard "make the crawl
  * look like the target domain" selection step of a pretraining
  * pipeline.
  *
  *   λ(d) = Σ_{tokens w ∈ d} ln( p̂_target(h(w)) / p̂_raw(h(w)) )
  *
  * with h(w) = sha-derived 32-bit word hash mod `nBuckets` and both
  * distributions add-one smoothed over the bucket space. Documents
  * with avg λ/|d| > 0 look more target-like than raw-average; the
  * keep flag uses that natural threshold (deterministic — the paper's
  * Gumbel resampling draw is replaced by the corpus-stable decision,
  * same spirit as the sha-bucket sampling elsewhere in this engine).
  *
  * Scale shape: the tokenized-and-hashed stream is materialized once
  * (ONE corpus scan — it feeds the raw counts, the target counts,
  * the totals, and the per-doc roll-up); both distributions collapse
  * to `nBuckets`-row tables whose log-ratio join back onto the
  * stream is broadcast (map-side, no corpus shuffle); the only
  * corpus-sized shuffle is the final doc_id roll-up. The log is
  * quantized to 6 decimals before the order-free decimal sum (ln
  * parity — same contract as the unigram/bigram LM scorers). */
object Dsir {

  /** `isTarget`: boolean column over `docs` marking the target-domain
    * subset (e.g. `col("lang") === "en"` or a source predicate).
    * Emits (doc_id, n_tokens, logratio_sum, avg_logratio, keep). */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      nBuckets: Int = 256, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(nBuckets >= 2, "need at least 2 feature buckets")
    val tok = graft.util.Caches.materialize(
      docs.select(col(idCol), isTarget.as("_t"),
        explode(TextDedup.words(col(textCol))).as("word"))
        .select(col(idCol), col("_t"),
          (TextDedup.wordHash32(col("word")) % nBuckets).as("_b")))
    val raw = tok.groupBy(col("_b")).agg(count(lit(1)).as("_cr"))
    val tgt = tok.filter(col("_t")).groupBy(col("_b"))
      .agg(count(lit(1)).as("_ct"))
    val totals = tok.agg(count(lit(1)).as("_tr"),
      count(when(col("_t"), lit(1))).as("_tt"))
    // bucket-space log-ratio table: <= nBuckets rows, broadcast back
    val ratios = raw
      .join(tgt, Seq("_b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("_b"), graft.util.Parity.roundTo(
        log(((coalesce(col("_ct"), lit(0L)) + lit(1.0)) /
          (col("_tt") + lit(nBuckets))) /
          ((col("_cr") + lit(1.0)) / (col("_tr") + lit(nBuckets)))), 6)
        .as("_lr"))
    tok.join(broadcast(ratios), "_b")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        graft.util.Parity.dsum(col("_lr")).as("logratio_sum"))
      .withColumn("avg_logratio", col("logratio_sum") / col("n_tokens"))
      .withColumn("keep", col("avg_logratio") > lit(0.0))
  }
}
