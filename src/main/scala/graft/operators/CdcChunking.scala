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
  * Determinism/cross-engine: the rolling state is pure BIGINT —
  *   h' = (h·2 mod 2^59) + gear(c),   gear(c) = c·2654435761 mod 2^32
  * (no overflow: h' < 2^59 + 2^32), boundary where h' mod MASK = 0,
  * h resets after a cut. The per-document fold runs as an `aggregate`
  * HOF over the character array (the same sequential-recurrence
  * contract as Kalman/Holt); DuckDB replays it with list_reduce. The
  * accumulator orders fields (bs, i, h) so every DuckDB field
  * assignment reads only pre-update state — `bs` and `h` both expand
  * the h' text from the OLD h, matching Spark's snapshot semantics
  * with no in-order-mutation skew. Chunk identity is md5 of the
  * chunk text in both engines. Text is reduced to [a-z0-9 ] first so
  * `ascii()` is unambiguous cross-engine.
  *
  * Scale shape: the fold is per-document (parallel, no shuffle);
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

  private val HNew = "(((a.h * 2) % 576460752303423488L) + " +
    "((ascii(x0) * 2654435761L) % 4294967296L))"

  /** Boundary END positions (1-based, last = length) for column `nt`. */
  val boundariesExpr: Column = expr(
    s"""aggregate(
      filter(split(nt, ''), ch -> ch <> ''),
      named_struct('bs', array_repeat(0, 0), 'i', 0, 'h', 0L),
      (a, x0) -> named_struct(
        'bs', CASE WHEN $HNew % ${Mask}L = 0
              THEN concat(a.bs, array(a.i + 1)) ELSE a.bs END,
        'i', a.i + 1,
        'h', CASE WHEN $HNew % ${Mask}L = 0 THEN 0L ELSE $HNew END),
      a -> CASE WHEN size(a.bs) > 0 AND element_at(a.bs, -1) = a.i
           THEN a.bs ELSE concat(a.bs, array(a.i)) END)""")

  /** CDC chunk substrings of `nt` given boundary column `bs`. */
  val cdcChunksExpr: Column = expr(
    """filter(
      transform(bs, (e, j) ->
        substr(nt, CASE WHEN j = 0 THEN 1
                   ELSE element_at(bs, j) + 1 END,
               e - CASE WHEN j = 0 THEN 0 ELSE element_at(bs, j) END)),
      c -> length(c) > 0)""")

  /** Fixed-width chunk substrings of `nt`. */
  def fixedChunksExpr(w: Int): Column = expr(
    s"""filter(
      transform(sequence(0, CAST(ceil(length(nt) / $w.0D) AS INT) - 1),
        j -> substr(nt, j * $w + 1, $w)),
      c -> length(c) > 0)""")

  /** Two-row chunking audit over (doc_id, text): CDC vs fixed-size
    * duplicate-chunk fractions on the boilerplate-planted corpus. */
  def audit(docs: DataFrame, fixedWidth: Int = 64): DataFrame = {
    val planted = docs.select(
      when(col("doc_id") % 3 === 0,
        concat(cdcText(col("text")), lit(Boiler)))
        .otherwise(cdcText(col("text"))).as("nt"))
      .where(length(col("nt")) > 0)
    val cdc = planted.withColumn("bs", boundariesExpr)
      .select(explode(cdcChunksExpr).as("ck"))
      .select(md5(col("ck")).as("h"))
    val fixed = planted
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

  /** DuckDB spelling from a CTE `docs(doc_id, text)`.
    *
    * NOTE the fold's accumulator is a LIST of per-step states with
    * `list_append`, NOT a struct holding a growing list field:
    * DuckDB 1.0's list_reduce struct mutation corrupts growing
    * list/string fields (boundary values read back as 0 / "invalid
    * unicode") — the same list-of-states shape the unigram Viterbi
    * oracle uses. Boundary positions are then projected out of the
    * state tape with list_filter. */
  def duckAudit(fixedWidth: Int = 64): String = {
    val hNew = "(((acc[-1].h * 2) % 576460752303423488) + " +
      "((ascii(x[1].c) * 2654435761) % 4294967296))"
    val norm = "regexp_replace(lower(trim(regexp_replace(text, " +
      "'\\s+', ' ', 'g'))), '[^a-z0-9 ]', '', 'g')"
    s"""pl AS (
       |  SELECT CASE WHEN doc_id % 3 = 0
       |    THEN concat($norm, '$Boiler') ELSE $norm END AS nt
       |  FROM docs),
       |plf AS (SELECT nt FROM pl WHERE length(nt) > 0),
       |folded AS (
       |  SELECT nt,
       |    list_reduce(
       |      list_concat(
       |        [[{'c': '', 'i': 0::BIGINT, 'h': 0::BIGINT,
       |           'cut': 0::BIGINT}]],
       |        [[{'c': x, 'i': 0::BIGINT, 'h': 0::BIGINT,
       |           'cut': 0::BIGINT}] for x in string_split(nt, '')]),
       |      (acc, x) -> list_append(acc, {
       |        'c': '',
       |        'i': acc[-1].i + 1,
       |        'h': CASE WHEN $hNew % ${Mask} = 0 THEN 0
       |             ELSE $hNew END,
       |        'cut': CASE WHEN $hNew % ${Mask} = 0
       |               THEN acc[-1].i + 1 ELSE 0 END})) AS dp
       |  FROM plf),
       |cuts AS (
       |  SELECT nt,
       |    list_filter(list_transform(dp, s -> s.cut), c -> c > 0)
       |      AS bs0
       |  FROM folded),
       |bnd AS (
       |  SELECT nt,
       |    CASE WHEN len(bs0) > 0 AND bs0[-1] = length(nt) THEN bs0
       |         ELSE list_append(bs0, length(nt)::BIGINT) END AS bs
       |  FROM cuts),
       |cdc AS (
       |  SELECT md5(ck) AS h FROM (
       |    SELECT unnest(list_filter(
       |      [substr(nt,
       |         CASE WHEN j = 1 THEN 1 ELSE bs[j - 1] + 1 END,
       |         bs[j] - CASE WHEN j = 1 THEN 0 ELSE bs[j - 1] END)
       |       for j in generate_series(1, len(bs))],
       |      c -> length(c) > 0)) AS ck
       |    FROM bnd)),
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
