package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). With the legacy
    * flag the column arrives as LONG nanoseconds; `ts div 1000` is exact
    * integer µs (a double roundtrip would lose precision above 2^53),
    * and `timestamp_micros` restores TimestampType for downstream code.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
