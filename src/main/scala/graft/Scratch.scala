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
    val emb = graft.util.Tables.load(spark, sfDir, "embeddings")
    emb.count() // warm
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    timed("noop count")(emb.select(col("vec_id")).count())
    timed("tops only")(emb
      .select(col("vec_id"),
        graft.operators.VectorOps.topCoords(col("embedding"), 3).as("_tops"))
      .count())
    val naturalTops = {
      val a = col("embedding")
      val pairs = transform(sequence(lit(1), size(a)),
        i => struct((-element_at(a, i)).as("v"), i.as("i")))
      transform(slice(array_sort(pairs), 1, 3), _.getField("i"))
    }
    timed("tops natural-order")(emb
      .select(col("vec_id"), naturalTops.as("_tops")).count())
    timed("tops natural again")(emb
      .select(col("vec_id"), naturalTops.as("_tops")).count())
    timed("keyed")(emb
      .select(col("vec_id"),
        graft.operators.VectorOps.topCoords(col("embedding"), 3).as("_tops"))
      .select(col("vec_id"),
        explode(graft.operators.VectorOps.pairKeysFromTops(col("_tops")))
          .as("bucket")).count())
    timed("keyed again")(emb
      .select(col("vec_id"),
        graft.operators.VectorOps.topCoords(col("embedding"), 3).as("_tops"))
      .select(col("vec_id"),
        explode(graft.operators.VectorOps.pairKeysFromTops(col("_tops")))
          .as("bucket")).count())
    timed("candidatePairs")(
      graft.operators.VectorOps.candidatePairs(emb).count())
    spark.catalog.clearCache()
    timed("cosineNearDups")(
      graft.operators.VectorOps.cosineNearDups(emb, 0.3).count())
    spark.catalog.clearCache()
    timed("bucketTop1")(
      graft.operators.VectorOps.bucketTop1(emb).count())
    spark.catalog.clearCache()
    timed("bucketTop1 again")(
      graft.operators.VectorOps.bucketTop1(emb).count())
    spark.stop()
  }
}
