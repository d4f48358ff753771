package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val emb = graft.util.Tables.load(spark, sfDir, "embeddings")
    emb.count() // warm
    timed("embed candidatePairs")(
      graft.operators.VectorOps.candidatePairs(emb).count())
    spark.catalog.clearCache()
    timed("embed cosineNearDups")(
      graft.operators.VectorOps.cosineNearDups(emb, 0.3).count())
    spark.catalog.clearCache()
    val docs = graft.util.Tables.load(spark, sfDir, "documents")
    docs.count()
    val hashed = docs.select(col("doc_id"),
      graft.functions.TextHashColumns.ngramHashes(col("text"), 2).as("hs"))
    timed("minhash sig+bands only") {
      val sig = graft.operators.TextDedup.minhashSignature(col("hs"), 12)
      hashed.select(col("doc_id"),
        explode(array(graft.operators.TextDedup.bands(sig): _*))
          .as("band_val")).count()
    }
    timed("minhash candidates") {
      val sig = graft.operators.TextDedup.minhashSignature(col("hs"), 12)
      val exploded = hashed.select(col("doc_id"),
        explode(array(graft.operators.TextDedup.bands(sig): _*))
          .as("band_val"))
      exploded.select(col("doc_id").as("id_a"), col("band_val"))
        .join(exploded.select(col("doc_id").as("id_b"), col("band_val")),
          "band_val")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
    }
    spark.catalog.clearCache()
    timed("minhash full")(
      graft.operators.TextDedup.minhashNearDups(hashed).count())
    spark.stop()
  }
}
