package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deduplication operators for large-scale text corpora: exact
  * (hash-groupBy), MinHash+LSH near-dup (shingle → signature → band →
  * bucket-join → verify), SimHash, n-gram Jaccard, and winnowing-style
  * fingerprints.
  *
  * Design for 100 TB:
  *  - NO all-pairs comparison anywhere. Candidate generation is a
  *    shuffle keyed by (band index, band value); only same-bucket pairs
  *    are verified. The verify join fetches shingle sets by doc id
  *    (shuffle by id) rather than carrying arrays through the bucket
  *    join.
  *  - All hashing is columnar (sha2 / conv inside codegen) — sha256 as
  *    the shingle hash is deliberate: it is reproducible in any engine
  *    for oracle checks. A throughput-tuned deployment would swap in
  *    xxhash64 (also a Spark builtin) — one-line change, same plan.
  *  - minhash keeps the lexicographic MIN of the seeded hash per seed:
  *    a uniform random total order per seed, i.e. a valid minwise
  *    permutation family.
  */
object TextDedup {

  /** Canonical normalization: lowercase, trim, collapse whitespace. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  def words(c: Column): Column = split(normText(c), " ")

  /** Distinct word n-grams; empty array when the doc is shorter than
    * n words. */
  def wordShingles(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) >= n,
      array_distinct(transform(
        sequence(lit(0), size(wordsCol) - n),
        i => concat_ws(" ", slice(wordsCol, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup: one row per normalized-text hash with the canonical
    * (minimum) doc id and the multiplicity. */
  def exactDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("text_hash", sha2(normText(col(textCol)), 256))
      .groupBy(col("text_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash signature: k seeded sha256-min values per shingle set. */
  def minhashSignature(shinglesCol: Column, k: Int): Seq[Column] =
    (0 until k).map { s =>
      array_min(transform(shinglesCol,
        x => sha2(concat(lit(s + ":"), x), 256)))
    }

  /** LSH bands: adjacent signature pairs concatenated (k/2 bands of
    * 2 rows each), prefixed with the band index so a single-key
    * equi-join on the band value is sufficient. Two docs collide in a
    * band iff both minhashes match. */
  def bands(signature: Seq[Column]): Seq[Column] =
    signature.grouped(2).zipWithIndex.map { case (g, i) =>
      concat_ws("|", lit(i.toString) +: g: _*)
    }.toSeq

  /** Exact Jaccard of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Winnowing-style document fingerprint: minimum sha256 over word
    * 5-grams (a 1-permutation minhash). */
  def fingerprint(wordsCol: Column): Column =
    array_min(transform(wordShingles(wordsCol, 5),
      x => sha2(x, 256)))

  /** 32-bit word hash: first 8 hex chars of sha256, parsed. */
  def wordHash32(w: Column): Column =
    conv(substring(sha2(w, 256), 1, 8), 16, 10).cast("long")

  /** SimHash-32 per doc from an exploded (doc_id, word-hash) frame:
    * per bit, +1/-1 majority vote over token hashes; set bit where the
    * vote is positive. One hash-aggregate pass. */
  def simhash32(exploded: DataFrame, idCol: String = "doc_id",
      hashCol: String = "h"): DataFrame = {
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col(hashCol), b).bitwiseAND(lit(1L)) === 1L,
        lit(1)).otherwise(lit(-1))).as(s"_bs$b")
    }
    val agg = exploded.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 32)
      .map(b => when(col(s"_bs$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), simhash.as("simhash"))
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** MinHash/LSH near-duplicate pairs: corpus must carry (idCol,
    * shingles). Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold. */
  def minhashNearDups(
      corpus: DataFrame,
      idCol: String = "doc_id",
      k: Int = 12,
      threshold: Double = 0.5): DataFrame = {
    val sig = minhashSignature(col("shingles"), k)
    // explode index-prefixed bands -> (id, band_val); candidate pairs
    // are a self-equi-join on band_val (a shuffle keyed by bucket, the
    // thing that makes this not-all-pairs at scale)
    val exploded = corpus
      .filter(size(col("shingles")) > 0)
      .select(col(idCol),
        explode(array(bands(sig): _*)).as("band_val"))
    val candidates = exploded.select(col(idCol).as("id_a"), col("band_val"))
      .join(exploded.select(col(idCol).as("id_b"), col("band_val")), "band_val")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // verify: fetch shingle sets by id (no arrays through the bucket join)
    val sh = corpus.select(col(idCol), col("shingles"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("shingles").as("_sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingles").as("_sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** n-gram Jaccard near-dups via an inverted index: explode shingles,
    * drop "stop-shingles" whose document frequency exceeds `maxDf`
    * (bounds the per-posting fan-out, the classic scale guard for
    * posting-list self-joins), self-join on the shingle, then verify
    * exact Jaccard on the distinct candidate pairs. */
  def invertedIndexPairs(
      corpus: DataFrame,
      idCol: String = "doc_id",
      maxDf: Int = 20,
      threshold: Double = 0.3): DataFrame = {
    val posting = corpus
      .select(col(idCol), explode(col("shingles")).as("shingle"))
    val rare = posting.groupBy(col("shingle"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf)
      .select(col("shingle"))
    val pruned = posting.join(rare, "shingle")
    val candidates = pruned.select(col(idCol).as("id_a"), col("shingle"))
      .join(pruned.select(col(idCol).as("id_b"), col("shingle")), "shingle")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val sh = corpus.select(col(idCol), col("shingles"))
    candidates
      .join(sh.select(col(idCol).as("id_a"), col("shingles").as("_sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingles").as("_sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: candidate pairs share at least one of the
    * four 8-bit chunks of the 32-bit simhash (pigeonhole: any pair at
    * Hamming distance <= 3 must agree on >= 1 chunk), verified by exact
    * Hamming distance. Input: (id, simhash). */
  def simhashPairs(sims: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {
    val chunks = (0 until 4).map { c =>
      concat_ws(":", lit(c.toString),
        shiftright(col("simhash"), c * 8).bitwiseAND(lit(255L)))
    }
    val exploded = sims.select(col(idCol), col("simhash"),
      explode(array(chunks: _*)).as("chunk"))
    exploded.select(col(idCol).as("id_a"), col("simhash").as("_h_a"), col("chunk"))
      .join(exploded.select(col(idCol).as("id_b"),
        col("simhash").as("_h_b"), col("chunk")), "chunk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("_h_a"), col("_h_b")).as("hamming_dist"))
      .distinct()
      .filter(col("hamming_dist") <= maxHamming)
  }
}
