package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable Misra-Gries heavy-hitters summary (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) — the sketch path for corpus
  * frequency when the vocabulary does NOT fit anywhere (the exact
  * top-k operator `llm_topk_ngrams` is the other quantile of the
  * trade-off, like a18's KLL vs a21's exact selection).
  *
  * Scale shape: one pass; each partition folds its word stream into
  * a k-counter summary (O(k) memory), the per-partition summaries
  * (#partitions × k rows total) reduce pairwise with the
  * guarantee-preserving merge (sum counts, subtract the (k+1)-th
  * largest, keep positives). The deterministic guarantee — NOT a
  * probabilistic one — is what the oracle gates on: any item with
  * true frequency > N/(k+1) of an N-word stream survives every
  * fold/merge order, and its estimate undershoots by at most
  * N/(k+1).
  */
object HeavyHitters {

  /** Fold one item (count `c`) into a k-bounded MG summary. */
  private def add(m: mutable.Map[String, Long], w: String, c: Long,
      k: Int): Unit = {
    if (m.contains(w)) m(w) += c
    else if (m.size < k) m(w) = c
    else {
      // batch-decrement: remove min(c, current minimum) from every
      // counter, drop zeros, insert the remainder if any
      val d = math.min(c, m.values.min)
      m.mapValuesInPlace((_, v) => v - d)
      m.filterInPlace((_, v) => v > 0)
      if (c > d) m(w) = c - d
    }
  }

  /** Guarantee-preserving merge: union-sum, then subtract the
    * (k+1)-th largest count and keep strictly-positive survivors. */
  def merge(a: Map[String, Long], b: Map[String, Long], k: Int)
      : Map[String, Long] = {
    val s = mutable.Map.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (w, c) =>
      s(w) = s.getOrElse(w, 0L) + c
    }
    if (s.size <= k) s.toMap
    else {
      val t = s.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      s.iterator.collect { case (w, c) if c > t => w -> (c - t) }.toMap
    }
  }

  /** One-pass k-counter summary of an item stream (the per-partition
    * kernel; also the unit under the ScalaCheck guarantee suite). */
  def summarize(items: IterableOnce[String], k: Int): Map[String, Long] = {
    val m = mutable.Map.empty[String, Long]
    items.iterator.foreach(add(m, _, 1L, k))
    m.toMap
  }

  /** MG summary of the corpus word stream: word -> estimate (always
    * an UNDER-estimate, short by at most N/(k+1)). */
  def misraGries(docs: DataFrame, k: Int,
      textCol: String = "text"): Map[String, Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextDedup.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .as[String]
    words.rdd
      .mapPartitions(it => Iterator.single(summarize(it, k)))
      .fold(Map.empty[String, Long])(merge(_, _, k))
  }
}
