package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-batch sink seam for the streaming ingest — the Spark analog
  * of the reference's mode-dispatched client factory
  * (clickhouse/connection.py:38-58: `get_client(mode)` hands back a
  * local or cloud writer behind one interface). Structured
  * Streaming's `foreachBatch` re-delivers a batch with the SAME
  * batchId after a crash, so the idempotence contract lives here:
  * `writeBatch` MUST be a no-op for an already-committed id and MUST
  * overwrite a partially-written (uncommitted) one. A ClickHouse
  * connector implementation plugs in behind this trait without
  * touching the stream wiring (no ClickHouse is reachable in this
  * environment, so parquet is the shipped mode). */
trait BatchSink extends Serializable {
  def writeBatch(batch: DataFrame, batchId: Long): Unit
}

/** Default ("local parquet") sink: one batchId-keyed directory per
  * micro-batch, month-partitioned inside, committed by the parquet
  * writer's _SUCCESS marker. */
final class ParquetBatchSink(targetDir: String) extends BatchSink {
  override def writeBatch(batch: DataFrame, batchId: Long): Unit = {
    val dir = s"$targetDir/ingest_batch=$batchId"
    // skip only COMMITTED batches (_SUCCESS marker): a bare directory
    // check would permanently drop a batch whose write crashed
    // mid-flight; overwrite of a partial dir is safe.
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      batch.withColumn("month", date_format(col("timestamp"), "yyyyMM"))
        .write.mode("overwrite").partitionBy("month").parquet(dir)
    }
  }
}

object BatchSink {
  /** Mode dispatch mirroring the reference's `get_client(mode)`. */
  def forMode(mode: String, targetDir: String): BatchSink = mode match {
    case "parquet" => new ParquetBatchSink(targetDir)
    case other => throw new IllegalArgumentException(
      s"unknown sink mode '$other' (supported: parquet)")
  }
}
