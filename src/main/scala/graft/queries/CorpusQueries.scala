package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{EmbedPca, TextAnalysis, VectorOps}
import graft.util.Parity._
import graft.util.Tables

/** Round-11 corpus-diagnostics additions: per-source lexical entropy
  * and PCA of the embedding matryoshka head. */
object CorpusQueries {

  // ---- llm_word_entropy: per-source lexical diversity ----

  def wordEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexicalEntropy(Tables.load(s, dir, "documents"))

  val wordEntropyOracle: String =
    s"""WITH wx AS (
       |  SELECT source,
       |    unnest(string_split(
       |      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
       |      AS word
       |  FROM documents
       |),
       |wc AS (
       |  SELECT source, word, count(*) AS c
       |  FROM wx WHERE length(word) > 0
       |  GROUP BY 1, 2
       |),
       |a AS (
       |  SELECT source, count(*) AS n_types,
       |    CAST(sum(c) AS BIGINT) AS n_tokens,
       |    ${duckDsum("CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))")} AS s
       |  FROM wc GROUP BY 1
       |),
       |b AS (SELECT *, CAST(n_tokens AS DOUBLE) AS nd FROM a)
       |SELECT source, n_types, n_tokens,
       |  ${duckRoundTo("ln(nd) - s / nd", 9)} AS entropy,
       |  ${duckRoundTo(
            "(ln(nd) - s / nd) / nullif(ln(CAST(n_types AS DOUBLE)), 0.0)",
            9)}
       |    AS norm_entropy,
       |  CAST(n_types AS DOUBLE) / nd AS ttr
       |FROM b""".stripMargin

  // ---- llm_embed_pca: top principal component of the MRL head ----

  private val PcaDim = 8

  /** SQL spelling of the exact d×d covariance chain over the first
    * `PcaDim` embedding coordinates — the m24 echo+verify pattern on
    * the embeddings table. */
  private val pcaCovCte: String = {
    val ids = 0 until PcaDim
    val proj = ids.map(i => s"embedding[${i + 1}]::DOUBLE AS x$i")
      .mkString(",\n    ")
    val sums = ids.map(i => s"${duckDsum(s"x$i")} AS s$i") ++
      (for (i <- ids; j <- i until PcaDim)
        yield s"${duckDsum(s"x$i * x$j")} AS s${i}_$j")
    val covs = for (i <- ids; j <- i until PcaDim) yield
      s"(s${i}_$j - s$i * s$j / CAST(n AS DOUBLE))" +
        s" / (CAST(n AS DOUBLE) - 1.0) AS c${i}_$j"
    s"""pb AS (
       |  SELECT $proj
       |  FROM embeddings
       |),
       |mo AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, ${sums.mkString(",\n    ")}
       |  FROM pb
       |),
       |cv AS (SELECT n, ${covs.mkString(",\n    ")} FROM mo)""".stripMargin
  }

  /** Pinned-eigenpair gate: loadings/λ echoed as exact literals, the
    * covariance re-derived in SQL, `eigen_ok` = ‖Cv − λv‖∞ < 1e-8
    * and the λ/trace share derived — wrong eigenpair or moment drift
    * breaks the hash. */
  private def pcaOracle(lambda: Double, v: Array[Double]): String = {
    val ids = 0 until PcaDim
    def cc(i: Int, j: Int) = if (i <= j) s"c${i}_$j" else s"c${j}_$i"
    val lamL = duckDoubleLit(lambda)
    val vL = v.map(duckDoubleLit)
    val resid = ids.map { i =>
      val cv = ids.map(j => s"${cc(i, j)} * ${vL(j)}").mkString(" + ")
      s"abs(($cv) - $lamL * ${vL(i)})"
    }.mkString("greatest(", ", ", ")")
    val rows = ids.map(i => s"($i, ${vL(i)})").mkString(", ")
    val norm2 = vL.map(x => s"$x * $x").mkString(" + ")
    val trace = ids.map(i => s"c${i}_$i").mkString(" + ")
    s"""WITH $pcaCovCte
       |SELECT component, loading, $lamL AS lambda1,
       |  $lamL / ($trace) AS explained_frac,
       |  ($resid < 1.0E-8) AS eigen_ok,
       |  (abs(($norm2) - 1.0) < 1.0E-12) AS norm_ok
       |FROM (VALUES $rows) AS t(component, loading), cv""".stripMargin
  }

  def embedPca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val (c, _) = EmbedPca.covFromMoments(
      EmbedPca.momentSums(emb, PcaDim).head(), PcaDim)
    val (lambda, v) = EmbedPca.topEigen(c)
    val trace = (0 until PcaDim).map(i => c(i)(i)).sum
    val resid = (0 until PcaDim).map { i =>
      math.abs((0 until PcaDim).map(j => c(i)(j) * v(j)).sum
        - lambda * v(i))
    }.max
    val eigenOk = resid < 1e-8
    val normOk = math.abs(v.map(x => x * x).sum - 1.0) < 1e-12
    DynamicOracles.put("llm_embed_pca", pcaOracle(lambda, v))
    (0 until PcaDim).map { i =>
      (i, v(i), lambda, lambda / trace, eigenOk, normOk)
    }.toDF("component", "loading", "lambda1", "explained_frac",
      "eigen_ok", "norm_ok")
  }

  // ---- llm_colloc_pmi: top-k collocations by PMI ----

  def collocPmi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collocations(Tables.load(s, dir, "documents"))

  val collocPmiOracle: String =
    s"""WITH norm AS (
       |  SELECT doc_id,
       |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
       |  FROM documents
       |),
       |wrds AS (SELECT doc_id, string_split(nt, ' ') AS w FROM norm),
       |pairs AS (
       |  SELECT w[i] AS w1, w[i + 1] AS w2
       |  FROM (SELECT w, unnest(range(1, len(w))) AS i
       |        FROM wrds WHERE len(w) >= 2)
       |),
       |bigc AS (SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY 1, 2),
       |l AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x
       |      FROM bigc GROUP BY 1),
       |r AS (SELECT w2, CAST(sum(c_xy) AS BIGINT) AS c_y
       |      FROM bigc GROUP BY 1),
       |tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_pairs FROM bigc),
       |j AS (
       |  SELECT b.w1, b.w2, b.c_xy, l.c_x, r.c_y,
       |    ${duckRoundTo(
              "ln((CAST(b.c_xy AS DOUBLE) * CAST(t.n_pairs AS DOUBLE)) " +
                "/ (CAST(l.c_x AS DOUBLE) * CAST(r.c_y AS DOUBLE)))", 9)}
       |      AS pmi
       |  FROM bigc b JOIN l USING (w1) JOIN r USING (w2), tot t
       |  WHERE b.c_xy >= 5
       |)
       |SELECT w1, w2, c_xy, c_x, c_y, pmi FROM j
       |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin

  // ---- llm_len_quantiles: per-source doc-length quantiles ----

  /** Exact per-source p50/p90/p99 of document length via the
    * distributed-selection scaffolding (a21/ev15's scale path — no
    * per-key global sort). */
  def lenQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.DistributedSelection.quantiles(
      Tables.load(s, dir, "documents").select("source", "n_chars"),
      "source", "n_chars",
      Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")))
      .withColumnRenamed("n_trades", "n_docs")

  val lenQuantilesOracle: String =
    """WITH ranked AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents
      |)
      |SELECT source, max(n) AS n_docs,
      |  max(CASE WHEN rn = (n * 1 + 1) // 2 THEN n_chars END) AS p50,
      |  max(CASE WHEN rn = (n * 9 + 9) // 10 THEN n_chars END) AS p90,
      |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_chars END) AS p99
      |FROM ranked
      |WHERE rn = (n * 1 + 1) // 2 OR rn = (n * 9 + 9) // 10
      |   OR rn = (n * 99 + 99) // 100
      |GROUP BY source""".stripMargin

  // ---- llm_knn_label: leave-one-out kNN label audit ----

  private val KnnQueries = 8
  private val KnnK = 5

  def knnLabel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    VectorOps.knnLabelVote(e, e.filter(col("vec_id") < KnnQueries), KnnK)
  }

  val knnLabelOracle: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, label AS true_label
       |  FROM embeddings WHERE vec_id < $KnnQueries
       |),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    ${LlmQueries.duckCosine("qv", "e.embedding")} AS cos_sim
       |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
       |),
       |topk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS rank
       |    FROM scored
       |  ) WHERE rank <= $KnnK
       |),
       |votes AS (
       |  SELECT t.query_id, e.label AS nl, count(*) AS n_votes
       |  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
       |  GROUP BY 1, 2
       |),
       |win AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY n_votes DESC, nl) AS rn
       |  FROM votes
       |)
       |SELECT w.query_id, q.true_label, w.nl AS pred_label, w.n_votes,
       |  (w.nl = q.true_label) AS correct
       |FROM win w JOIN q USING (query_id) WHERE rn = 1""".stripMargin

  // ---- llm_band_plan: LSH (bands × rows) parameter planner ----

  private val BandPlanK = 12
  private val BandPlanThrNum = 3
  private val BandPlanThrDen = 10
  private val BandPlanGrid = 20

  def bandPlan(s: SparkSession, dir: String): DataFrame =
    graft.operators.LshPlanner.bandPlan(
      s, BandPlanK, BandPlanThrNum, BandPlanThrDen, BandPlanGrid)

  val bandPlanOracle: String = {
    val cfgRows = graft.operators.LshPlanner.configs(BandPlanK)
      .map { case (b, r) => s"($b, $r)" }.mkString(", ")
    val pBand = duckRoundTo("power(j, rows_per_band)", 9)
    val pColl =
      s"1.0 - ${duckRoundTo(s"power(1.0 - $pBand, bands)", 9)}"
    s"""WITH cfg(bands, rows_per_band) AS (VALUES $cfgRows),
       |pts AS (
       |  SELECT bands, rows_per_band, CAST(ji AS INTEGER) AS j_i,
       |    CAST(ji AS DOUBLE) / ${BandPlanGrid}.0 AS j
       |  FROM cfg, range(1, $BandPlanGrid) t(ji)
       |),
       |p AS (
       |  SELECT bands, rows_per_band, j_i, $pColl AS p_coll,
       |    j_i * $BandPlanThrDen < ${BandPlanThrNum * BandPlanGrid}
       |      AS below
       |  FROM pts
       |),
       |scored AS (
       |  SELECT bands, rows_per_band, count(*) AS n_grid,
       |    ${duckDsum("CASE WHEN below THEN p_coll ELSE 0.0 END")}
       |      AS fp_mass,
       |    ${duckDsum(
             "CASE WHEN NOT below THEN 1.0 - p_coll ELSE 0.0 END")}
       |      AS fn_mass
       |  FROM p GROUP BY 1, 2
       |),
       |tot AS (
       |  SELECT *, fp_mass + fn_mass AS total_err FROM scored
       |)
       |SELECT bands, rows_per_band, n_grid, fp_mass, fn_mass,
       |  total_err,
       |  total_err = (SELECT min(total_err) FROM tot) AS is_optimal
       |FROM tot""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "llm_band_plan" -> QueryDef(bandPlan _, bandPlanOracle),
    "llm_knn_label" -> QueryDef(knnLabel _, knnLabelOracle),
    "llm_len_quantiles" -> QueryDef(lenQuantiles _, lenQuantilesOracle),
    "llm_colloc_pmi" -> QueryDef(collocPmi _, collocPmiOracle),
    "llm_word_entropy" -> QueryDef(wordEntropy _, wordEntropyOracle),
    "llm_embed_pca" -> QueryDef(embedPca _, None))
}
