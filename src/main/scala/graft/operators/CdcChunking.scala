package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup — the Gear-hash chunker
  * (Xia et al., FastCDC '16) that storage dedup and long-document
  * corpus dedup use instead of fixed-size blocks: chunk boundaries
  * are cut where a rolling hash of the LOCAL CONTENT hits a mask, so
  * a shared passage chunks IDENTICALLY no matter what offset it sits
  * at inside each document. Fixed-size chunking misses every shifted
  * repeat (one inserted character slides all later block boundaries);
  * CDC is shift-resistant by construction — the gated entry plants a
  * boilerplate passage behind differently-sized document prefixes and
  * shows CDC's duplicate-chunk fraction high where fixed-size
  * chunking's stays ~zero.
  *
  * Determinism/cross-engine: the cut test is pure BIGINT — with
  *   gear(c) = c·2654435761 mod 2^32,
  * the shift-register h' = (h·2 mod 2^59) + gear(c) satisfies
  * h mod 64 = (Σ_{d=0..5} 2^d·gear(c_{p−d})) mod 64 (2^6 ≡ 0 mod 64),
  * so a position is a boundary iff a SIX-CHAR WINDOW sum hits the
  * mask — the classic rolling-window Gear, computable fully in
  * parallel per position with codegen'd transform/filter (no
  * sequential fold; the fold-based first cut of this operator spent
  * 21 s at sf1 in an interpreted per-char lambda — the window form
  * is ~3 s). Chunk identity is md5 of the chunk text in both
  * engines. Text is reduced to [a-z0-9 ] first so `ascii()` is
  * unambiguous cross-engine.
  *
  * Scale shape: per-document array math (parallel, no shuffle);
  * chunk stats are one hash aggregate on digests. 100 TB of
  * documents is embarrassingly parallel map work plus one
  * digest-keyed aggregate. */
object CdcChunking {

  /** Boundary mask (avg chunk ≈ 64 chars on random text). */
  val Mask = 64L

  /** The planted boilerplate passage (appended verbatim to every
    * third document, behind a document-specific prefix). */
  val Boiler: String =
    " end of document standard disclaimer the quick brown fox jumps " +
      "over the lazy dog all values are provided as is without any " +
      "warranty of completeness or fitness for purpose"

  /** ascii-only normalization so ascii() is unambiguous. */
  def cdcText(c: Column): Column =
    regexp_replace(lower(trim(regexp_replace(c, "\\s+", " "))),
      "[^a-z0-9 ]", "")

  /** The cut test: the shift-register recurrence h' = (h·2 mod 2^59)
    * + gear(c) satisfies 2^6 ≡ 0 (mod 64), so h mod 64 depends on
    * ONLY the last 6 gear values — the boundary test is a pure
    * 6-char sliding window, computable fully IN PARALLEL per
    * position with transform/filter (no sequential fold: the first
    * fold-based cut of this operator spent 21 s at sf1 in an
    * interpreted per-char lambda). This is also the textbook
    * Gear/Rabin formulation — a ROLLING window with no reset, which
    * is exactly what makes CDC shift-resistant.
    *
    * STAGING CONTRACT: the intermediate arrays (gear values, cut
    * positions, closed boundaries) are bound as LAMBDA VARIABLES via
    * single-element `transform(array(x), v -> ...)` "let" bindings,
    * NOT as withColumn projections — CollapseProject inlines a
    * projection-level alias into every one of its references inside
    * downstream HOF lambdas, re-evaluating the whole gear transform
    * PER ELEMENT ACCESS (measured O(len²): a 500-doc reassembly test
    * burned 12+ CPU-minutes). A lambda variable is evaluated exactly
    * once per enclosing element — here, once per row. */
  private val GearSql =
    "transform(filter(split(nt, ''), ch -> ch <> ''), " +
      "ch -> (ascii(ch) * 2654435761L) % 4294967296L)"

  private def windowSql(ga: String): String =
    (0 to 5).map { d =>
      if (d == 0) s"element_at($ga, p)"
      else s"(CASE WHEN p >= ${d + 1} THEN ${1L << d}L * " +
        s"element_at($ga, p - $d) ELSE 0L END)"
    }.mkString(" + ")

  // empty-gear guard: sequence(1, 0) defaults to step -1 and yields
  // [1, 0], whose element_at(ga, 0) always throws — an empty nt must
  // produce an empty cut list, not an error (callers also filter
  // length(nt) > 0, but the expression is safe standalone)
  private def cutsSql(ga: String): String =
    s"""CASE WHEN size($ga) = 0 THEN CAST(array() AS ARRAY<INT>)
       ELSE filter(
       transform(sequence(1, size($ga)),
         p -> CASE WHEN (${windowSql(ga)}) % ${Mask}L = 0
              THEN CAST(p AS INT) ELSE 0 END),
       c -> c > 0) END"""

  private def closedSql(bs0: String, ga: String): String =
    s"""CASE WHEN size($bs0) > 0 AND element_at($bs0, -1) = size($ga)
       THEN $bs0 ELSE concat($bs0, array(size($ga))) END"""

  private def chunksSql(bs: String): String =
    s"""filter(
       transform($bs, (e, j) ->
         substr(nt, CASE WHEN j = 0 THEN 1
                    ELSE element_at($bs, j) + 1 END,
                e - CASE WHEN j = 0 THEN 0 ELSE element_at($bs, j) END)),
       c -> length(c) > 0)"""

  /** Closed boundary END positions (1-based, last = length) of
    * column `nt`, all intermediates let-bound. */
  val boundsFromNt: Column = expr(
    s"""element_at(transform(array($GearSql), ga ->
       element_at(transform(array(${cutsSql("ga")}), bs0 ->
         ${closedSql("bs0", "ga")}), 1)), 1)""")

  /** CDC chunk substrings of column `nt` in the declarative
    * transform/filter spelling (the form the DuckDB oracle mirrors),
    * all intermediates let-bound. Kept as the cross-engine semantic
    * REFERENCE — the hot path uses [[chunksFromNt]]'s compiled
    * kernel, pinned equal to this spelling by CdcChunkingSpec. */
  val chunksFromNtSql: Column = expr(
    s"""flatten(transform(array($GearSql), ga ->
       flatten(transform(array(${cutsSql("ga")}), bs0 ->
         flatten(transform(array(${closedSql("bs0", "ga")}), bs ->
           ${chunksSql("bs")}))))))""")

  /** CDC chunk substrings of column `nt` — the codegen'd kernel
    * ([[graft.functions.CdcChunks]]); HOFs don't codegen, so the
    * declarative spelling pays interpreted boxing per character
    * (~21 s at sf1 vs ~2 s for the kernel). */
  def chunksFromNt: Column =
    graft.functions.CdcChunks(col("nt"))

  /** Fixed-width chunk substrings of `nt`. */
  def fixedChunksExpr(w: Int): Column = expr(
    s"""filter(
      transform(sequence(0, CAST(ceil(length(nt) / $w.0D) AS INT) - 1),
        j -> substr(nt, j * $w + 1, $w)),
      c -> length(c) > 0)""")

  /** The boilerplate-planted corpus: (doc_id, nt). */
  def planted(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(cdcText(col("text")), lit(Boiler)))
        .otherwise(cdcText(col("text"))).as("nt"))
      .where(length(col("nt")) > 0)

  /** Chunk-level near-dup detection — the Lee-et-al-style use of CDC:
    * docs sharing ≥ `minShared` content-defined chunks are near-dups
    * REGARDLESS of where the shared passage sits (the boilerplate
    * rides behind different-length prefixes in every planted doc).
    * One inverted index on chunk digests + a digest-keyed self-join;
    * per-digest postings are capped at `dfCap` (a digest shared by d
    * docs contributes d²/2 candidate pairs — the same quadratic
    * hygiene as MarketBasket's basket cap; production systems switch
    * to MinHash over the chunk set past that density). */
  def nearDup(docs: DataFrame, minShared: Int = 2,
      dfCap: Int = 4096): DataFrame = {
    val ch = graft.util.Caches.snapshot(planted(docs)
      .select(col("doc_id"), explode(chunksFromNt).as("ck"))
      .select(col("doc_id"), md5(col("ck")).as("h"))
      .distinct())
    val dfc = ch.groupBy(col("h")).agg(count(lit(1)).as("dfc"))
    val kept = ch.join(dfc.where(col("dfc") <= dfCap), "h")
    val l = kept.select(col("h"), col("doc_id").as("id_a"))
    val r = kept.select(col("h").as("h_r"), col("doc_id").as("id_b"))
    l.join(r, col("h") === col("h_r") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .agg(
        count(lit(1)).as("n_candidate_pairs"),
        // coalesce matches the oracle on a zero-pair corpus: sum over
        // an empty set is NULL in Spark, 0 after the oracle's coalesce
        coalesce(sum(when(col("shared") >= minShared, 1L).otherwise(0L)),
          lit(0L)).as("n_neardup_pairs"),
        max(col("shared")).as("max_shared"))
  }

  /** DuckDB spelling of [[nearDup]] (append after [[duckChunkCtes]]). */
  def duckNearDup(minShared: Int = 2, dfCap: Int = 4096): String =
    s"""dd AS (SELECT DISTINCT doc_id, h FROM dchunks),
       |dfc AS (SELECT h FROM dd GROUP BY h HAVING count(*) <= $dfCap),
       |kept AS (SELECT dd.doc_id, dd.h FROM dd JOIN dfc USING (h)),
       |prs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |  FROM kept a JOIN kept b
       |    ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT count(*) AS n_candidate_pairs,
       |  CAST(coalesce(sum(CASE WHEN shared >= $minShared
       |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_neardup_pairs,
       |  max(shared) AS max_shared
       |FROM prs""".stripMargin

  /** Two-row chunking audit over (doc_id, text): CDC vs fixed-size
    * duplicate-chunk fractions on the boilerplate-planted corpus. */
  def audit(docs: DataFrame, fixedWidth: Int = 64): DataFrame = {
    val plantedDf = planted(docs).select(col("nt"))
    val cdc = plantedDf.select(explode(chunksFromNt).as("ck"))
      .select(md5(col("ck")).as("h"))
    val fixed = plantedDf
      .select(explode(fixedChunksExpr(fixedWidth)).as("ck"))
      .select(md5(col("ck")).as("h"))
    def stats(t: DataFrame, fam: String): DataFrame =
      t.agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct"))
        .select(lit(fam).as("family"), col("n_chunks"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") /
            col("n_chunks").cast("double")).as("dup_frac"))
    stats(cdc, "cdc").unionAll(stats(fixed, "fixed"))
  }

  /** DuckDB chunk pipeline from a CTE `docs(doc_id, text)` — the
    * identical parallel window formulation (list comprehensions, no
    * list_reduce: DuckDB 1.0's struct-mutation fold corrupts growing
    * list/string accumulator fields, and the window form doesn't
    * need a fold at all). Ends with `dchunks(doc_id, h)` — one row
    * per chunk occurrence — plus `plf(doc_id, nt)` for the
    * fixed-size comparison. */
  val duckChunkCtes: String = {
    val w = (0 to 5).map { d =>
      if (d == 0) "ga[p]"
      else s"CASE WHEN p >= ${d + 1} THEN ${1L << d} * ga[p - $d] " +
        "ELSE 0 END"
    }.mkString(" + ")
    val norm = "regexp_replace(lower(trim(regexp_replace(text, " +
      "'\\s+', ' ', 'g'))), '[^a-z0-9 ]', '', 'g')"
    s"""pl AS (
       |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
       |    THEN concat($norm, '$Boiler') ELSE $norm END AS nt
       |  FROM docs),
       |plf AS (SELECT doc_id, nt FROM pl WHERE length(nt) > 0),
       |gar AS (
       |  SELECT doc_id, nt,
       |    [(ascii(x) * 2654435761) % 4294967296
       |     for x in string_split(nt, '')] AS ga
       |  FROM plf),
       |cutsc AS (
       |  SELECT doc_id, nt,
       |    list_filter(
       |      [CASE WHEN ($w) % ${Mask} = 0 THEN p ELSE 0 END
       |       for p in generate_series(1, len(ga))],
       |      c -> c > 0) AS bs0
       |  FROM gar),
       |bnd AS (
       |  SELECT doc_id, nt,
       |    CASE WHEN len(bs0) > 0 AND bs0[-1] = length(nt) THEN bs0
       |         ELSE list_append(bs0, length(nt)::BIGINT) END AS bs
       |  FROM cutsc),
       |dchunks AS (
       |  SELECT doc_id, md5(ck) AS h FROM (
       |    SELECT doc_id, unnest(list_filter(
       |      [substr(nt,
       |         CASE WHEN j = 1 THEN 1 ELSE bs[j - 1] + 1 END,
       |         bs[j] - CASE WHEN j = 1 THEN 0 ELSE bs[j - 1] END)
       |       for j in generate_series(1, len(bs))],
       |      c -> length(c) > 0)) AS ck
       |    FROM bnd))""".stripMargin
  }

  def duckAudit(fixedWidth: Int = 64): String = {
    s"""$duckChunkCtes,
       |cdc AS (SELECT h FROM dchunks),
       |fixed AS (
       |  SELECT md5(ck) AS h FROM (
       |    SELECT unnest(list_filter(
       |      [substr(nt, j * $fixedWidth + 1, $fixedWidth)
       |       for j in generate_series(0,
       |         CAST(ceil(length(nt) / $fixedWidth.0) AS INT) - 1)],
       |      c -> length(c) > 0)) AS ck
       |    FROM plf))
       |SELECT 'cdc' AS family, count(*) AS n_chunks,
       |  count(DISTINCT h) AS n_distinct,
       |  1.0 - CAST(count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS dup_frac
       |FROM cdc
       |UNION ALL
       |SELECT 'fixed', count(*), count(DISTINCT h),
       |  1.0 - CAST(count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |FROM fixed""".stripMargin
  }
}
