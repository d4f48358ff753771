package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** The NATIVE streaming sink for the snapshot store —
  * `df.writeStream.toTable("graft_snap.t")`, Spark's DSv2
  * STREAMING_WRITE protocol, with one CAS manifest commit per epoch:
  *
  *  - tasks stream rows straight into task-attempt-unique parquet
  *    files under an epoch staging directory (`data/st<qid>-e<N>/`)
  *    through Spark's OWN parquet `OutputWriter` — the bytes on disk
  *    are identical to a batch write's, and rows never buffer on the
  *    driver;
  *  - the driver's `commit(epochId, messages)` publishes ONE append
  *    manifest listing exactly the staged files (plus the per-commit
  *    `_schema.ddl` marker for zero-footer-IO planning), stamped with
  *    the writer token `toTable:<queryId>:<epochId>`;
  *  - exactly-once falls out of the token: Structured Streaming
  *    re-delivers the last epoch after a crash with the SAME queryId
  *    (persisted in checkpoint metadata) and epochId, so the replayed
  *    commit finds its token in a live manifest or the durable token
  *    log and NO-OPs — the re-staged files become ordinary orphans,
  *    swept by maintenance exactly like CAS losers;
  *  - `outputMode("complete")` maps to a per-epoch REPLACE commit —
  *    the incremental-MV refresh shape — under the same token guard.
  *
  * Caller note: register the `spark.sql.catalog.<name>` confs on the
  * session that is THREAD-ACTIVE when `toTable` is called (not only
  * on the stream's own session) — Spark's CatalogManager resolves
  * catalog names through `SQLConf.get` (the active session's conf),
  * and `DataStreamWriter.toTable` runs its existence check outside
  * any withActive wrapper; an unresolvable catalog there silently
  * falls back to a CREATE that then collides with the existing table.
  *
  * Scale shape: executor work is ordinary distributed parquet IO;
  * driver work per epoch is one manifest write (file-count-sized) and
  * — on an indexed store — one bounded stats aggregate, so the sink
  * inherits the append-time index-maintenance contract: range pruning
  * stays fresh under continuous ingest. */
private[graft] object SnapshotStreaming {

  /** The files one task staged (task-attempt-unique names: a task
    * retry writes NEW files; the losers are unreferenced orphans). */
  final case class StagedFiles(files: Seq[String])
      extends WriterCommitMessage

  final class Sink(root: String, info: LogicalWriteInfo,
      overwrite: Boolean) extends StreamingWrite {
    private val schema = info.schema()
    private val qid = info.queryId()

    private def stageDir(epochId: Long) =
      new File(new File(root, "data"), s"st${qid.take(8)}-e$epochId")

    override def createStreamingWriterFactory(pInfo: PhysicalWriteInfo)
        : StreamingDataWriterFactory = {
      // prepareWrite wires the parquet WriteSupport (schema, codec,
      // timestamp encoding) into the job conf — ship those entries so
      // executor TaskAttemptContexts carry the exact same settings
      val spark = SparkSession.active
      val job = Job.getInstance(
        spark.sessionState.newHadoopConf())
      val factory = new ParquetFileFormat()
        .prepareWrite(spark, job, Map.empty, schema)
      val confEntries = job.getConfiguration.asScala
        .map(e => e.getKey -> e.getValue).toVector
      // run-unique nonce: task ids restart from 0 in a restarted
      // application, so a replayed epoch's writer could otherwise
      // collide with the crashed run's staged file of the same
      // (partition, task) pair
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      new Factory(root, s"st${qid.take(8)}", factory, confEntries,
        schema, nonce)
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val staged = messages.collect { case StagedFiles(fs) => fs }
        .flatten.toSeq.sorted
      val token = Some(s"toTable:$qid:$epochId")
      if (overwrite) {
        // complete mode: this epoch's result IS the table
        Files.write(new File(stageDir(epochId), "_schema.ddl").toPath,
          schema.toDDL.getBytes(StandardCharsets.UTF_8))
        SnapshotStore.commitStagedReplace(root, staged, schema, token)
        ()
      } else if (staged.nonEmpty) {
        Files.write(new File(stageDir(epochId), "_schema.ddl").toPath,
          schema.toDDL.getBytes(StandardCharsets.UTF_8))
        SnapshotStore.commitStagedAppend(SparkSession.active, root,
          staged, schema, token)
        ()
      } // an empty append epoch publishes nothing — no version churn
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit =
      messages.collect { case StagedFiles(fs) => fs }.flatten
        .foreach(f => Files.deleteIfExists(new File(f).toPath))
  }

  /** Serializable executor-side factory: rebuilds the Hadoop conf the
    * driver's `prepareWrite` populated and opens Spark's own parquet
    * OutputWriter on a task-attempt-unique path. */
  private final class Factory(root: String, stagePrefix: String,
      writers: OutputWriterFactory, confEntries: Vector[(String, String)],
      schema: StructType, nonce: String)
      extends StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] = {
      val conf = new Configuration(false)
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      val dir = new File(new File(root, "data"), s"$stagePrefix-e$epochId")
      dir.mkdirs()
      val path = new File(dir,
        s"part-$partitionId-$taskId-$nonce.parquet").getPath
      val attempt = new TaskAttemptID("graft", epochId.toInt,
        TaskType.MAP, partitionId, taskId.toInt)
      val ctx = new TaskAttemptContextImpl(conf, attempt)
      val out = writers.newInstance(path, schema, ctx)
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
