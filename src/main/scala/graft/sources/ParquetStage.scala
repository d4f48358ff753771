package graft.sources

import java.io.File
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Shared DISTRIBUTED parquet staging for the store's physical V2
  * writes (the streaming sink's epochs and the row-level operations'
  * replacement data): tasks stream `InternalRow`s straight into
  * task-attempt-unique files under a staging directory inside
  * `<root>/data`, through Spark's OWN parquet OutputWriter — the
  * bytes are identical to a batch write's, rows never buffer on the
  * driver, and the driver-side commit just lists the staged paths in
  * a manifest. Uncommitted stages (aborts, replays, CAS losers) are
  * ordinary unreferenced orphans for maintenance to sweep. */
private[sources] object ParquetStage {

  /** The files one task staged. */
  final case class StagedFiles(files: Seq[String])
      extends WriterCommitMessage

  def stagedOf(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.collect { case StagedFiles(fs) => fs }.flatten.toSeq.sorted

  /** Serializable dir functions: built HERE so the lambdas close over
    * plain strings, never over a (non-serializable) Write/Sink
    * instance — the factory ships inside task binaries. */
  def epochDir(dataDir: String, prefix: String): Long => String = {
    val (d, p) = (dataDir, prefix)
    e => new File(d, s"$p-e$e").getPath
  }

  def fixedDir(dir: String): Long => String = {
    val d = dir
    _ => d
  }

  /** Driver-side: a serializable task-writer factory for `schema`,
    * staging into `dirFor(epochId)` (batch writes use epoch 0).
    * `prepareWrite` wires the parquet WriteSupport (schema, codec,
    * timestamp encoding) into a job conf whose entries ship to the
    * executors so their TaskAttemptContexts carry identical
    * settings. */
  def writers(schema: StructType, dirFor: Long => String): Writers = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    val confEntries = job.getConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toVector
    // run-unique nonce: task ids restart from 0 in a restarted
    // application, so a replayed epoch's writer could otherwise
    // collide with the crashed run's staged file of the same
    // (partition, task) pair
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    new Writers(factory, confEntries, schema, dirFor, nonce)
  }

  final class Writers(
      factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
      confEntries: Vector[(String, String)], schema: StructType,
      dirFor: Long => String, nonce: String)
      extends DataWriterFactory with StreamingDataWriterFactory {

    override def createWriter(partitionId: Int, taskId: Long)
        : DataWriter[InternalRow] = createWriter(partitionId, taskId, 0L)

    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] = {
      val conf = new Configuration(false)
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      val dir = new File(dirFor(epochId))
      dir.mkdirs()
      val path = new File(dir,
        s"part-$partitionId-$taskId-$nonce.parquet").getPath
      val attempt = new TaskAttemptID("graft", epochId.toInt,
        TaskType.MAP, partitionId, taskId.toInt)
      val ctx = new TaskAttemptContextImpl(conf, attempt)
      val out = factory.newInstance(path, schema, ctx)
      new DataWriter[InternalRow] {
        override def write(row: InternalRow): Unit = out.write(row)
        override def commit(): WriterCommitMessage = {
          out.close()
          StagedFiles(Seq(path))
        }
        override def abort(): Unit = {
          try out.close() catch { case _: Exception => () }
          Files.deleteIfExists(new File(path).toPath)
          ()
        }
        override def close(): Unit = ()
      }
    }
  }
}
