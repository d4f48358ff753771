package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Round-18 fourth wave: the snapshot store as a STREAMING SOURCE
  * (`readStream.table` — version offsets, added-files micro-batches,
  * non-append refusal, checkpoint resumption, startingVersion). */
class Round18dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wh = graft.util.TempDirs.scoped("r18d-wh")
  private lazy val ss = {
    val s = org.apache.spark.sql.GraftBridge.sessionWithConf(
      spark, Map("spark.sql.shuffle.partitions" -> "4"))
    Seq(spark, s).foreach { x =>
      x.conf.set("spark.sql.catalog.r18d_snap",
        classOf[graft.sources.GraftCatalog].getName)
      x.conf.set("spark.sql.catalog.r18d_snap.warehouse", wh)
    }
    s
  }

  private def rows(n0: Int, n1: Int) =
    spark.range(n0, n1).select(col("id").as("tid"),
      (col("id") * 2.0).as("amount"))

  test("each commit streams as one batch of exactly its fresh rows") {
    val root = s"$wh/feed1"
    SnapshotStore.commitAppend(rows(0, 10).repartition(2), root)
    val seen = Round18dSpec.sink
    seen.clear()
    val ckpt = graft.util.TempDirs.scoped("r18d-f1-ckpt")
    def start() = ss.readStream.table("r18d_snap.feed1")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        b.collect().foreach(r => seen.add(id -> r.getLong(0)))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      val batch0 = seen.toArray(Array.empty[(Long, Long)]).toSeq
      assert(batch0.map(_._2).sorted == (0L until 10L),
        "batch 0 = the whole initial snapshot")
      assert(batch0.map(_._1).distinct == Seq(0L))
      SnapshotStore.commitAppend(rows(10, 15), root)
      q.processAllAvailable()
      val after = seen.toArray(Array.empty[(Long, Long)]).toSeq
      val batch1 = after.filter(_._1 == 1L)
      assert(batch1.map(_._2).sorted == (10L until 15L),
        "batch 1 = ONLY the second commit's rows")
      assert(after.size == 15, "no duplicates, no loss")
    } finally { q.stop(); q.awaitTermination() }
    // restart from the checkpoint: only NEW commits stream
    SnapshotStore.commitAppend(rows(15, 18), root)
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      val resumed = seen.toArray(Array.empty[(Long, Long)]).toSeq
      assert(resumed.map(_._2).sorted == (15L until 18L),
        "the restarted stream resumes at the committed offset")
    } finally { q2.stop(); q2.awaitTermination() }
  }

  test("a non-append change refuses loudly; ignoreChanges streams added files") {
    val root = s"$wh/feed2"
    SnapshotStore.commitAppend(rows(0, 20).repartition(4), root)
    val seen = Round18dSpec.sink
    seen.clear()
    val ckpt = graft.util.TempDirs.scoped("r18d-f2-ckpt")
    val q = ss.readStream.table("r18d_snap.feed2")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        b.collect().foreach(r => seen.add(id -> r.getLong(0)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // a copy-on-write DELETE rewrites a file mid-stream
      SnapshotStore.deleteRows(spark, root, col("tid") === 3L)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("rewrote or removed") ||
        Option(ex.getCause).exists(_.getMessage.contains("rewrote or removed")))
    } finally {
      // the query died with the (asserted) refusal: stop/await rethrow
      // the terminal exception — swallow it, it was the test's point
      try { q.stop(); q.awaitTermination() }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    }
    // ignoreChanges: a FRESH stream accepts the table and a further
    // rewrite emits only the added (rewritten) files' rows
    seen.clear()
    val ckpt2 = graft.util.TempDirs.scoped("r18d-f2-ckpt2")
    val q2 = ss.readStream.option("ignoreChanges", "true")
      .table("r18d_snap.feed2")
      .writeStream.option("checkpointLocation", ckpt2)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        b.collect().foreach(r => seen.add(id -> r.getLong(0)))
        ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(seen.size == 19, "initial snapshot post-delete")
      SnapshotStore.deleteRows(spark, root, col("tid") === 7L)
      q2.processAllAvailable()
      // the rewrite's fresh file re-emits its survivors (the Delta
      // ignoreChanges caveat, documented) — and nothing else
      val extra = seen.toArray(Array.empty[(Long, Long)]).toSeq
        .filter(_._1 > 0L).map(_._2).sorted
      val rewrittenFileRows = extra
      assert(rewrittenFileRows.nonEmpty && !rewrittenFileRows.contains(7L))
      assert(rewrittenFileRows.size < 19, "only the rewritten file, not the table")
    } finally { q2.stop(); q2.awaitTermination() }
  }

  test("startingVersion skips the initial snapshot") {
    val root = s"$wh/feed3"
    SnapshotStore.commitAppend(rows(0, 10), root)
    SnapshotStore.commitAppend(rows(10, 12), root)
    val seen = Round18dSpec.sink
    seen.clear()
    val ckpt = graft.util.TempDirs.scoped("r18d-f3-ckpt")
    val q = ss.readStream.option("startingVersion", "1")
      .table("r18d_snap.feed3")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        b.collect().foreach(r => seen.add(id -> r.getLong(0)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.toArray(Array.empty[(Long, Long)]).toSeq
        .map(_._2).sorted == (10L until 12L),
        "only commits after startingVersion stream")
    } finally { q.stop(); q.awaitTermination() }
  }

  test("column pruning reaches the per-batch parquet scans") {
    val root = s"$wh/feed4"
    SnapshotStore.commitAppend(rows(0, 10), root)
    val seen = new ConcurrentLinkedQueue[Long]()
    val ckpt = graft.util.TempDirs.scoped("r18d-f4-ckpt")
    // select ONE column: the streaming scan must plan with the pruned
    // schema (readSchema of the wrapped scan), not the full table
    val q = ss.readStream.table("r18d_snap.feed4").select(col("tid"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        assert(b.schema.fieldNames.toSeq == Seq("tid"))
        b.collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.toArray(Array.empty[java.lang.Long]).toSeq
        .map(_.toLong).sorted == (0L until 10L))
    } finally { q.stop(); q.awaitTermination() }
  }
}

object Round18dSpec {
  /** Executor-visible collector (local mode: same JVM). */
  val sink = new ConcurrentLinkedQueue[(Long, Long)]()
}
