package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Dsir, TextRetrieval}
import graft.util.{Parity, Tables}

/** Corpus-vs-target scoring entries: BM25 keyword retrieval
  * ([[graft.operators.TextRetrieval]]) and DSIR importance-based data
  * selection ([[graft.operators.Dsir]]). Both oracles recompute the
  * full pipeline in DuckDB — tokenization, hashing, counts, the
  * quantized transcendental, the order-free decimal sum — so
  * hash_match verifies values end to end. */
object RetrievalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // same normalization/tokenization CTEs as LlmQueries (private
  // there; the spelling is the cross-file contract with
  // TextDedup.normText/words)
  private val wrdsCte =
    """norm AS (
      |  SELECT doc_id, text, lang,
      |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
      |  FROM documents
      |),
      |wrds AS (
      |  SELECT doc_id, text, lang, nt, string_split(nt, ' ') AS w FROM norm
      |)""".stripMargin

  /** DuckDB twin of TextDedup.wordHash32 (first 8 sha256 hex chars as
    * a 32-bit int) — same spelling as LlmQueries.duckHash32. */
  private val duckHash32 =
    """CAST(list_sum([(strpos('0123456789abcdef', sha[i]) - 1)
      |      * (16.0 ** (8 - i)) for i in range(1, 9)]) AS BIGINT)""".stripMargin

  // ---- BM25 top-k retrieval ----

  private val Bm25K = 10
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** Fixed query set over the corpus vocabulary: one row per
    * (query_id, term). Tiny by nature — broadcast on the Spark side,
    * a VALUES list in the oracle. */
  private val Bm25Queries: Seq[(Int, String)] = Seq(
    0 -> "hash", 0 -> "join",
    1 -> "table", 1 -> "scan", 1 -> "fast",
    2 -> "window", 2 -> "agg",
    3 -> "merge", 3 -> "batch", 3 -> "spark")

  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextRetrieval.bm25TopK(docs(s, dir),
      Bm25Queries.toDF("query_id", "term"), Bm25K, Bm25K1, Bm25B)
  }

  val bm25Oracle: String = {
    val d = Parity.duckDoubleLit _
    val qv = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH $wrdsCte,
       |tok AS (SELECT doc_id, unnest(w) AS word FROM wrds),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
       |),
       |stats AS (
       |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl
       |),
       |qt(query_id, term) AS (VALUES $qv),
       |qd AS (SELECT DISTINCT term FROM qt),
       |post AS (
       |  SELECT t.doc_id, t.word, t.tf FROM tf t JOIN qd ON t.word = qd.term
       |),
       |dfq AS (SELECT word, count(*) AS df FROM post GROUP BY 1),
       |terms AS (
       |  SELECT qt.query_id, p.doc_id,
       |    ${Parity.duckRoundTo(
             "ln((n - df + 0.5) / (df + 0.5) + 1.0)", 6)} *
       |      ((p.tf * ${d(Bm25K1 + 1.0)}) /
       |        (p.tf + ${d(Bm25K1)} *
       |          (1.0 - ${d(Bm25B)} + (${d(Bm25B)} * l.dl) /
       |            (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))))) AS s
       |  FROM post p
       |  JOIN dfq USING (word)
       |  JOIN dl l USING (doc_id)
       |  JOIN qt ON qt.term = p.word
       |  CROSS JOIN stats
       |),
       |agg AS (
       |  SELECT query_id, doc_id, count(*) AS n_terms,
       |    ${Parity.duckDsum("s")} AS score
       |  FROM terms GROUP BY 1, 2
       |)
       |SELECT query_id, doc_id, n_terms, score, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id
       |  ) AS INT) AS rank
       |  FROM agg
       |) WHERE rank <= $Bm25K""".stripMargin
  }

  // ---- DSIR importance-based selection ----

  private val DsirBuckets = 256
  private val DsirTargetLang = "en"

  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    Dsir.importanceWeights(docs(s, dir),
      col("lang") === DsirTargetLang, DsirBuckets)

  val dsirOracle: String =
    s"""WITH $wrdsCte,
       |tok AS (
       |  SELECT doc_id, (lang = '$DsirTargetLang') AS t,
       |    sha256(unnest(w)) AS sha
       |  FROM wrds
       |),
       |tb AS (SELECT doc_id, t, ($duckHash32) % $DsirBuckets AS b FROM tok),
       |raw AS (SELECT b, count(*) AS cr FROM tb GROUP BY 1),
       |tgt AS (SELECT b, count(*) AS ct FROM tb WHERE t GROUP BY 1),
       |tot AS (
       |  SELECT count(*) AS tr, count(CASE WHEN t THEN 1 END) AS tt FROM tb
       |),
       |lr AS (
       |  SELECT r.b, ${Parity.duckRoundTo(
           s"""ln(((coalesce(ct, 0) + 1.0) / (tt + $DsirBuckets)) /
              |      ((cr + 1.0) / (tr + $DsirBuckets)))""".stripMargin, 6)}
       |    AS lr
       |  FROM raw r LEFT JOIN tgt USING (b) CROSS JOIN tot
       |),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    ${Parity.duckDsum("lr")} AS logratio_sum
       |  FROM tb JOIN lr USING (b) GROUP BY 1
       |)
       |SELECT doc_id, n_tokens, logratio_sum,
       |  logratio_sum / n_tokens AS avg_logratio,
       |  (logratio_sum / n_tokens > 0.0) AS keep
       |FROM perdoc""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "llm_bm25_topk" -> QueryDef(bm25TopK _, bm25Oracle),
    "llm_dsir_select" -> QueryDef(dsirSelect _, dsirOracle))
}
