package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * Sennrich-style merge learner every tokenizer build starts from,
  * run corpus-scale the classic way: on the DISTINCT-WORD frequency
  * table, never the raw token stream.
  *
  * Scale shape (100 TB): one corpus-sized shuffle builds the word
  * frequency table (map-side partial counts into a Heaps-law-bounded
  * vocabulary, orders of magnitude smaller than the corpus); every
  * merge iteration after that is (a) one hash aggregate over the
  * vocab table for adjacent-pair counts, (b) a 1-row argmax collect,
  * (c) a map-only fold rewriting each word's symbol array. Driver
  * state is the merge list — O(nMerges). Lineage is truncated per
  * iteration ([[graft.util.Caches.snapshot]]) so the loop's plan
  * stays constant-size.
  *
  * Determinism: argmax ties break (count DESC, left ASC, right ASC)
  * on binary string order; the merge fold is the standard leftmost
  * non-overlapping rewrite (an "aaa" with pair (a,a) folds to
  * ["aa","a"]), exact by construction.
  */
object TextBpe {

  /** End-of-word sentinel symbol (sorts before ASCII letters — '<'
    * is 0x3C — identically in Spark and DuckDB binary collation). */
  val EndToken = "</w>"

  final case class Merge(rank: Int, l_sym: String, r_sym: String,
      merged: String, pair_count: Long)

  /** Word frequency table with each distinct word exploded into its
    * initial symbol array: characters plus the [[EndToken]]. */
  def wordSymbols(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextDedup.words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit(EndToken))))

  /** Adjacent-symbol pair counts weighted by word frequency — one
    * hash aggregate over the vocab table. */
  def pairCounts(wordSyms: DataFrame): DataFrame = {
    val n = size(col("syms"))
    wordSyms
      .select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (a: Column, b: Column) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Leftmost non-overlapping rewrite of (l, r) -> l+r in every
    * word's symbol array — a single codegen'd fold, no shuffle. */
  def applyMerge(wordSyms: DataFrame, l: String, r: String): DataFrame =
    wordSyms.withColumn("syms",
      aggregate(col("syms"),
        array().cast("array<string>"),
        (acc, s) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s)))))

  /** Target vocab rows per partition for the merge loop. The vocab
    * table is Heaps-law-bounded (≈√corpus): at test scale it fits one
    * partition (per-iteration task overhead would otherwise dominate
    * the loop 10:1 — measured 22 s → ~4 s at sf0.1), at 100 TB a
    * ~100M-word vocab still spreads over ~200 partitions. */
  val RowsPerPartition: Long = 500000L

  /** Merge-fold iterations between lineage truncations: re-running a
    * ≤4-deep fold chain per pair count is cheaper than a checkpoint
    * job per merge, and the analyzed plan stays constant-bounded. */
  val SnapshotEvery: Int = 4

  /** Apply a learned merge list to the corpus vocabulary: the
    * distinct-word table with each word's final symbol array, token
    * count and space-joined tokenization. This is how BPE encodes at
    * corpus scale — tokenize the Heaps-bounded vocab once, then
    * join-back to the token stream by word; never fold per token
    * occurrence. Same lineage-truncation cadence as the trainer. */
  def encodeWords(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    var ws = graft.util.Caches.snapshot(wordSymbols(docs, textCol))
    var since = 0
    merges.foreach { m =>
      ws = applyMerge(ws, m.l_sym, m.r_sym)
      since += 1
      if (since >= SnapshotEvery) {
        ws = graft.util.Caches.snapshot(ws); since = 0
      }
    }
    decorate(ws)
  }

  /** Learn `nMerges` merges. Returns (merge table, initial pair-count
    * table) — the latter is what an oracle can re-derive from the raw
    * corpus (rank-1's argmax and every merge of two base characters
    * verify against it; see the llm_bpe_train gate). Stops early if
    * the pair table drains. */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text")
      : (Seq[Merge], DataFrame) = {
    val (merges, init, _) = trainFull(docs, nMerges, textCol)
    (merges, init)
  }

  /** [[train]] plus the trainer's FINAL folded vocabulary — the
    * encode path reuses it instead of re-folding every merge over
    * the vocab from scratch (measured: halves llm_bpe_encode). */
  def trainFull(docs: DataFrame, nMerges: Int, textCol: String = "text")
      : (Seq[Merge], DataFrame, DataFrame) = {
    var ws = graft.util.Caches.snapshot(wordSymbols(docs, textCol))
    // one count on the checkpointed table sizes the loop's layout
    val vocabRows = ws.count()
    val parts = math.max(1L, math.min(ws.rdd.getNumPartitions.toLong,
      vocabRows / RowsPerPartition + 1)).toInt
    if (parts < ws.rdd.getNumPartitions)
      ws = graft.util.Caches.snapshot(ws.coalesce(parts))
    var init: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var sinceSnapshot = 0
    var drained = false
    while (rank <= nMerges && !drained) {
      val pc = pairCounts(ws)
      if (rank == 1) { init = graft.util.Caches.materialize(pc) }
      val top = (if (rank == 1) init else pc)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) drained = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += Merge(rank, l, r, l + r, top(0).getLong(2))
        ws = applyMerge(ws, l, r)
        sinceSnapshot += 1
        if (sinceSnapshot >= SnapshotEvery) {
          ws = graft.util.Caches.snapshot(ws)
          sinceSnapshot = 0
        }
        rank += 1
      }
    }
    (merges.toSeq, init, ws)
  }

  /** Decorate a folded vocabulary (word, freq, syms) with token count
    * and the space-joined tokenization. */
  def decorate(wordSyms: DataFrame): DataFrame =
    wordSyms
      .withColumn("n_tokens", size(col("syms")))
      .withColumn("tokens", concat_ws(" ", col("syms")))
      .drop("syms")
}
