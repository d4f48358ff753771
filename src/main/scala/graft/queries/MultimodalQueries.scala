package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.util.Tables

/** Multimodal pipeline entries. The decode stub derives metadata
  * deterministically from payload byte length (see Multimodal.StubCodec)
  * which makes the mapPartitions decode/frame-sample paths fully
  * oracle-verifiable: DuckDB recomputes the same metadata from
  * strlen(text) while Spark actually routes bytes through the typed
  * Dataset codec stages. */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String) =
    Multimodal.mediaFromDocs(Tables.load(s, dir, "documents"))

  private val mediaCte =
    """m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    strlen(text) AS len
      |  FROM documents
      |)""".stripMargin

  // ---- decode -> per-type stats ----

  def mm1DecodeStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.decode(media(s, dir)).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
        (sum(col("height")).cast("double") / count(lit(1))).as("avg_height"),
        sum(col("n_frames")).as("total_frames"))

  val mm1Oracle: String =
    s"""WITH $mediaCte,
       |d AS (
       |  SELECT media_type, len AS byte_len,
       |    CASE media_type WHEN 'image' THEN 64 + (len % 7) * 32
       |      WHEN 'audio' THEN 0 ELSE 320 END AS width,
       |    CASE media_type WHEN 'image' THEN 64 + (len % 5) * 32
       |      WHEN 'audio' THEN 0 ELSE 240 END AS height,
       |    CASE media_type WHEN 'image' THEN 1
       |      WHEN 'audio' THEN 0 ELSE 8 + len % 8 END AS n_frames
       |  FROM m
       |)
       |SELECT media_type, count(*) AS n,
       |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
       |  CAST(sum(width) AS DOUBLE) / count(*) AS avg_width,
       |  CAST(sum(height) AS DOUBLE) / count(*) AS avg_height,
       |  CAST(sum(n_frames) AS BIGINT) AS total_frames
       |FROM d GROUP BY 1""".stripMargin

  // ---- frame sampling ----

  def mm2FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(s, dir), everyN = 2).toDF()
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(length(col("frame_bytes"))).as("sampled_bytes"))

  val mm2Oracle: String =
    s"""WITH $mediaCte,
       |v AS (
       |  SELECT doc_id, len, 8 + len % 8 AS n_frames,
       |    len // (8 + len % 8) AS frame_size
       |  FROM m WHERE media_type = 'video'
       |)
       |SELECT doc_id,
       |  (n_frames + 1) // 2 AS n_sampled,
       |  CAST(((n_frames + 1) // 2) * frame_size AS BIGINT) AS sampled_bytes
       |FROM v""".stripMargin

  // ---- resize (truncate-to-budget stub; byte accounting oracle) ----

  private val ResizeMaxBytes = 120

  def mm4Resize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeImages(media(s, dir), maxBytes = ResizeMaxBytes).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("content"))).as("bytes_after"),
        count(when(length(col("content")) === ResizeMaxBytes, 1))
          .as("n_at_budget"))

  val mm4Oracle: String =
    s"""WITH $mediaCte
       |SELECT media_type, count(*) AS n,
       |  CAST(sum(CASE WHEN media_type = 'image'
       |    THEN least(len, $ResizeMaxBytes) ELSE len END) AS BIGINT)
       |    AS bytes_after,
       |  count(CASE WHEN (CASE WHEN media_type = 'image'
       |    THEN least(len, $ResizeMaxBytes) ELSE len END) = $ResizeMaxBytes
       |    THEN 1 END) AS n_at_budget
       |FROM m GROUP BY 1""".stripMargin

  // ---- feature extraction (integer byte-nibble histogram) ----

  /** Long-format histogram features: one row per (doc, bin) with the
    * integer count and its share of the payload. The counts are pure
    * integer math and `share` is a single exact division of those
    * ints, so the whole row hash-matches; the float L1-normalized
    * embedding (the same bins / total in float) stays covered by
    * MultimodalSpec. */
  def mm3Features(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractHistogram(media(s, dir)).toDF()
      .select(col("doc_id"), col("media_type"),
        posexplode(col("bins")).as(Seq("bin", "cnt")),
        aggregate(col("bins"), lit(0L), (acc, x) => acc + x).as("_total"))
      .select(col("doc_id"), col("media_type"), col("bin"), col("cnt"),
        (col("cnt").cast("double") /
          greatest(lit(1L), col("_total")).cast("double")).as("share"))

  val mm3Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    hex(encode(text)) AS hx, strlen(text) AS len
      |  FROM documents
      |),
      |bytes AS (
      |  SELECT doc_id, unnest(list_transform(range(0, len),
      |    i -> strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1))
      |    AS bin
      |  FROM m
      |),
      |cnt AS (SELECT doc_id, bin, count(*) AS c FROM bytes GROUP BY 1, 2),
      |grid AS (
      |  SELECT doc_id, media_type, len, unnest(range(0, 16)) AS bin FROM m
      |)
      |SELECT g.doc_id, g.media_type, CAST(g.bin AS INT) AS bin,
      |  CAST(coalesce(c.c, 0) AS BIGINT) AS cnt,
      |  coalesce(c.c, 0)::DOUBLE / greatest(1, g.len) AS share
      |FROM grid g LEFT JOIN cnt c USING (doc_id, bin)""".stripMargin

  /** MM7: per-video scene-cut detection
    * ([[Multimodal.sceneCuts]]) — consecutive-frame histogram L1
    * above frame_size/4 marks a cut. The oracle re-derives every
    * frame's 16-bin nibble histogram from the hex payload, replays
    * the L1 lag and the integer threshold, and must match the cut
    * set exactly. */
  def mm7SceneCuts(s: SparkSession, dir: String): DataFrame =
    Multimodal.sceneCuts(media(s, dir), denom = 4)

  val mm7Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    hex(encode(text)) AS hx, strlen(text) AS len
      |  FROM documents
      |),
      |v AS (
      |  SELECT doc_id, hx, len, 8 + len % 8 AS nf,
      |    len // (8 + len % 8) AS fs
      |  FROM m WHERE media_type = 'video'
      |),
      |fr AS (
      |  SELECT doc_id, hx, fs, nf,
      |    unnest(range(0, nf)) AS f
      |  FROM v
      |),
      |pos AS (
      |  SELECT doc_id, fs, f,
      |    unnest(range(0, fs)) AS i
      |  FROM fr
      |),
      |nib AS (
      |  SELECT p.doc_id, p.fs, p.f,
      |    strpos('0123456789ABCDEF',
      |      substr(v.hx, 2 * (p.f * p.fs + p.i) + 1, 1)) - 1 AS bin
      |  FROM pos p JOIN v USING (doc_id)
      |),
      |cnt AS (
      |  SELECT doc_id, f, bin, count(*) AS c FROM nib GROUP BY 1, 2, 3
      |),
      |grid AS (
      |  SELECT fr.doc_id, fr.fs, fr.f, b.bin,
      |    coalesce(c.c, 0) AS c
      |  FROM fr CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
      |  LEFT JOIN cnt c ON c.doc_id = fr.doc_id AND c.f = fr.f
      |    AND c.bin = b.bin
      |),
      |l1 AS (
      |  SELECT a.doc_id, a.f, a.fs,
      |    CAST(sum(abs(a.c - p.c)) AS BIGINT) AS d
      |  FROM grid a JOIN grid p
      |    ON p.doc_id = a.doc_id AND p.f = a.f - 1 AND p.bin = a.bin
      |  WHERE a.f >= 1
      |  GROUP BY 1, 2, 3
      |)
      |SELECT v.doc_id, CAST(v.nf AS BIGINT) AS n_frames,
      |  count(CASE WHEN l1.d > l1.fs // 4 THEN 1 END) AS n_cuts,
      |  count(CASE WHEN l1.d > l1.fs // 4 THEN 1 END) + 1 AS n_scenes,
      |  CAST(coalesce(sum(l1.d), 0) AS BIGINT) AS total_l1
      |FROM v LEFT JOIN l1 ON l1.doc_id = v.doc_id
      |GROUP BY 1, 2""".stripMargin

  // ---- perceptual-hash near-dup pairs ----

  private val PhashMaxHamming = 2

  /** MM5: dHash near-dup pairs ([[Multimodal.perceptualHash]] +
    * banded candidate join) — the image-dedup leg of the multimodal
    * pipeline. The oracle recomputes the 16-bit grid-sample hash from
    * the hex bytes and states the pair set WITHOUT any band
    * condition — every same-type pair within Hamming 2. Because the
    * 6+5+5 banding is guaranteed-recall (pigeonhole) it must only
    * PRUNE, so the hash match doubles as a completeness gate: a pair
    * the bands wrongly dropped would surface as an oracle mismatch. */
  def mm5PhashNeardup(s: SparkSession, dir: String): DataFrame =
    Multimodal.phashPairs(
      Multimodal.perceptualHash(media(s, dir)).toDF(), PhashMaxHamming)

  val mm5Oracle: String = {
    // byte value at 0-based position p, from the hex encoding
    def byteAt(p: String): String =
      s"""((strpos('0123456789ABCDEF', substr(hx, 2 * ($p) + 1, 1)) - 1) * 16
         | + strpos('0123456789ABCDEF', substr(hx, 2 * ($p) + 2, 1)) - 1)"""
        .stripMargin
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image'
       |         WHEN doc_id % 3 = 1 THEN 'audio'
       |         ELSE 'video' END AS media_type,
       |    hex(encode(text)) AS hx, strlen(text) AS len
       |  FROM documents
       |),
       |samp AS (
       |  SELECT doc_id, media_type,
       |    [${byteAt("(i * len) // 16")} for i in range(0, 16)] AS sl
       |  FROM m WHERE len > 0
       |),
       |ph0 AS (
       |  SELECT doc_id, media_type,
       |    CAST(list_sum([CASE WHEN sl[i + 1] > sl[((i + 1) % 16) + 1]
       |      THEN 2 ** i ELSE 0 END for i in range(0, 16)]) AS BIGINT)
       |      AS h
       |  FROM samp
       |),
       |ph AS (
       |  SELECT * FROM ph0
       |  UNION ALL
       |  SELECT doc_id, media_type, 0 AS h FROM m WHERE len = 0
       |)
       |SELECT l.media_type, l.doc_id AS doc_a, r.doc_id AS doc_b,
       |  CAST(bit_count(xor(l.h, r.h)) AS INT) AS hamming
       |FROM ph l JOIN ph r
       |  ON r.media_type = l.media_type AND l.doc_id < r.doc_id
       |WHERE bit_count(xor(l.h, r.h)) <= $PhashMaxHamming""".stripMargin
  }

  // ---- mm6: audio voice-activity segmentation ----

  def mm6AudioVad(s: SparkSession, dir: String): DataFrame =
    Multimodal.vadSegments(media(s, dir)).toDF()

  val mm6Oracle: String = {
    // byte value at 0-based position p, from the hex encoding
    def byteAt(p: String): String =
      s"""((strpos('0123456789ABCDEF', substr(hx, 2 * ($p) + 1, 1)) - 1) * 16
         | + strpos('0123456789ABCDEF', substr(hx, 2 * ($p) + 2, 1)) - 1)"""
        .stripMargin
    val centered = s"(${byteAt("CAST(f AS BIGINT) * 64 + j")} - 128)"
    s"""WITH au AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len
       |  FROM documents WHERE doc_id % 3 = 1 AND strlen(text) >= 64
       |),
       |fx AS (
       |  SELECT doc_id, hx, unnest(range(0, len // 64)) AS f
       |  FROM au
       |),
       |fr AS (
       |  SELECT doc_id, CAST(f AS INTEGER) AS f,
       |    CAST(list_sum([$centered * $centered
       |      for j in range(0, 64)]) AS BIGINT) AS e
       |  FROM fx
       |),
       |tot AS (
       |  SELECT doc_id, count(*) AS n, CAST(sum(e) AS BIGINT) AS te
       |  FROM fr GROUP BY 1
       |),
       |vo AS (
       |  SELECT fr.doc_id, f,
       |    f - row_number() OVER (PARTITION BY fr.doc_id ORDER BY f)
       |      AS isl
       |  FROM fr JOIN tot USING (doc_id)
       |  WHERE e * n > te
       |),
       |seg AS (
       |  SELECT doc_id, isl, count(*) AS run FROM vo GROUP BY 1, 2
       |),
       |per AS (
       |  SELECT doc_id, count(*) AS n_segments,
       |    sum(run) AS n_voiced, max(run) AS longest
       |  FROM seg GROUP BY 1
       |)
       |SELECT t.doc_id, CAST(t.n AS INTEGER) AS n_frames,
       |  CAST(coalesce(p.n_voiced, 0) AS INTEGER) AS n_voiced,
       |  CAST(coalesce(p.n_segments, 0) AS INTEGER) AS n_segments,
       |  CAST(coalesce(p.longest, 0) AS INTEGER) AS longest_voiced
       |FROM tot t LEFT JOIN per p USING (doc_id)""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "mm6_audio_vad" -> QueryDef(mm6AudioVad _, mm6Oracle),
    "mm7_scene_cuts" -> QueryDef(mm7SceneCuts _, mm7Oracle),
    "mm5_phash_neardup" -> QueryDef(mm5PhashNeardup _, mm5Oracle),
    "mm1_decode_stats" -> QueryDef(mm1DecodeStats _, mm1Oracle),
    "mm2_frame_sample" -> QueryDef(mm2FrameSample _, mm2Oracle),
    "mm3_features" -> QueryDef(mm3Features _, mm3Oracle),
    "mm4_resize" -> QueryDef(mm4Resize _, mm4Oracle))
}
