package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID
  * (stopword/CJK heuristic), quality scoring (length / punctuation /
  * digit / stopword ratios), and token counting (whitespace + a
  * BPE-style pre-tokenizer regex).
  *
  * All computations are pure column expressions (whole-stage codegen,
  * no UDFs); every ratio divides by a guarded non-zero length. The
  * operators scan `documents` once each — no joins, no shuffles beyond
  * the final aggregate where one exists, so they scale linearly with
  * corpus size.
  */
object TextAnalysis {

  /** Tiny per-language function-word lexicons. Deliberately small and
    * inline: the point is the *operator shape* (distinct-token overlap
    * vs N lexicons in one pass), not lexical coverage. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "was", "that",
      "for", "it", "with", "as", "on", "be", "at", "by", "a", "an"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit",
      "ein", "eine", "zu", "den", "von", "auf", "im", "sich", "als"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est",
      "dans", "que", "pour", "qui", "sur", "pas", "au", "avec"),
    "es" -> Seq("el", "los", "las", "y", "que", "en", "un", "una",
      "es", "por", "con", "para", "del", "se", "no", "como"))

  /** BPE-style pre-tokenizer: letter runs, single digits, or single
    * non-alphanumeric non-space marks (the GPT-2 pre-tok family,
    * ASCII-simplified so Java and RE2 regex dialects agree). */
  val bpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"

  /** Number of (possibly repeated) tokens present in `lexicon`. */
  def lexiconHits(wordsCol: Column, lexicon: Seq[String]): Column =
    size(filter(wordsCol, w => array_contains(
      array(lexicon.map(lit): _*), w)))

  /** Distinct-token overlap with `lexicon` (set intersection size). */
  def lexiconOverlap(wordsCol: Column, lexicon: Seq[String]): Column =
    size(array_intersect(array_distinct(wordsCol),
      array(lexicon.map(lit): _*)))

  /** Per-doc language scores + winner. CJK-ratio short-circuits to zh;
    * otherwise argmax of stopword overlaps with a fixed tie-break order
    * (en > de > fr > es, matching greatest-first CASE evaluation).
    * The distinct-words array is materialized once (wordShingles
    * contract in TextDedup: inline expressions inside HOF lambdas are
    * re-evaluated per element). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = col("_dw")
    val cjk = regexp_count(col(textCol), lit("[一-龥]"))
      .cast("double") / greatest(length(col(textCol)), lit(1))
    val scored = docs
      .withColumn("_dw", array_distinct(TextDedup.words(col(textCol))))
      .withColumn("cjk_ratio", cjk)
      .withColumn("s_en", lexiconOverlap(w, stopwords("en")))
      .withColumn("s_de", lexiconOverlap(w, stopwords("de")))
      .withColumn("s_fr", lexiconOverlap(w, stopwords("fr")))
      .withColumn("s_es", lexiconOverlap(w, stopwords("es")))
      .drop("_dw")
    val best = greatest(col("s_en"), col("s_de"), col("s_fr"), col("s_es"))
    scored.withColumn("predicted_lang",
      when(col("cjk_ratio") > 0.05, lit("zh"))
        .when(best === 0, lit("und"))
        .when(col("s_en") === best, lit("en"))
        .when(col("s_de") === best, lit("de"))
        .when(col("s_fr") === best, lit("fr"))
        .otherwise(lit("es")))
  }

  /** Per-doc quality metrics + keep flag. `avg_word_len` uses the
    * normalized single-spaced text: (chars - (n-1) spaces) / n. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val norm = col("_nt")
    val w = col("_w")
    val nWords = size(w)
    val len = greatest(length(t), lit(1)).cast("double")
    docs
      .withColumn("_nt", TextDedup.normText(t))
      .withColumn("_w", split(col("_nt"), " "))
      .withColumn("n_words", nWords)
      .withColumn("avg_word_len",
        (length(norm) - (nWords - lit(1))).cast("double") / nWords)
      .withColumn("punct_ratio",
        regexp_count(t, lit("[^A-Za-z0-9 \\t\\n\\r]")).cast("double") / len)
      .withColumn("digit_ratio",
        regexp_count(t, lit("[0-9]")).cast("double") / len)
      .withColumn("upper_ratio",
        regexp_count(t, lit("[A-Z]")).cast("double") / len)
      .withColumn("stopword_ratio",
        lexiconHits(w, stopwords("en")).cast("double") / greatest(nWords, lit(1)))
      .withColumn("quality_ok",
        nWords >= 5 && col("punct_ratio") < 0.3 && col("digit_ratio") < 0.3)
      .drop("_nt", "_w")
  }

  /** Per-doc token counts: whitespace tokens, BPE-style pre-tokens,
    * normalized char length. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("_nt", TextDedup.normText(col(textCol)))
      .withColumn("n_ws_tokens", size(split(col("_nt"), " ")))
      .withColumn("n_bpe_tokens", regexp_count(col(textCol), lit(bpePattern)))
      .withColumn("n_chars_norm", length(col("_nt")))
      .drop("_nt")
}
