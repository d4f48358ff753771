package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity operators over an `array<float>` embedding column:
  * brute-force cosine top-k (the exact baseline) and an LSH/IVF-style
  * bucketed nearest-neighbour pass (the 100 TB path).
  *
  * Determinism note: the dot product is a strict left-to-right fold of
  * per-element double products (`aggregate(zip_with(...))`), so an
  * engine-independent oracle can reproduce the bits exactly — no
  * reliance on any engine's internal reduction order.
  *
  * Scale design:
  *  - `annTopK` broadcasts the (small) query set, computes cosines
  *    map-side, and takes the per-query top-k with a rank window
  *    partitioned by query id — shuffle keyed by query, never all-pairs
  *    between corpus rows.
  *  - `bucketTop1` assigns each vector to one of `dim` buckets by its
  *    argmax coordinate (a deterministic concomitant-of-maximum LSH for
  *    inner-product search); pairs are generated only inside a bucket.
  *    At 100 TB the bucket key would extend to the top-2 coordinates
  *    (dim² buckets) — same plan shape, one more array_position call.
  */
object VectorOps {

  /** Strict left-fold dot product of two float arrays, in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** 1-based index of the (first) maximum coordinate — the bucket id. */
  def argmaxBucket(a: Column): Column =
    array_position(a, array_max(a))

  /** Exact brute-force cosine top-k: every corpus vector scored against
    * every query vector (queries broadcast), per-query top-k by
    * (cosine desc, corpus id) for deterministic ties. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: same argmax-coordinate
    * bucketing as [[bucketTop1]], emitting every intra-bucket pair at
    * or above `threshold` (id_a < id_b). The dedup-flavored variant of
    * the bucketed search — feeds the same cluster assignment as the
    * text near-dup pairs. */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = corpus.select(col(idCol), col(vecCol),
      argmaxBucket(col(vecCol)).as("bucket"))
    b.select(col(idCol).as("id_a"), col(vecCol).as("_va"), col("bucket"))
      .join(b.select(col(idCol).as("id_b"), col(vecCol).as("_vb"), col("bucket")),
        "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("_va"), col("_vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF-style bucketed nearest neighbour: per vector, the single most
    * cosine-similar other vector *within its argmax-coordinate bucket*
    * (ties broken by neighbor id). Vectors alone in their bucket drop
    * out — that is the approximation the bucket join buys. */
  def bucketTop1(corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = corpus.select(col(idCol), col(vecCol),
      argmaxBucket(col(vecCol)).as("bucket"))
    val pairs = b.select(col(idCol).as("id_a"), col(vecCol).as("_va"), col("bucket"))
      .join(b.select(col(idCol).as("id_b"), col(vecCol).as("_vb"), col("bucket")),
        "bucket")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("_va"), col("_vb")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"))
      .orderBy(col("cos_sim").desc, col("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id_a").as("vec_id"), col("id_b").as("nn_id"),
        col("cos_sim"))
  }
}
