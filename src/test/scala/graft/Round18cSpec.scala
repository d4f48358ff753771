package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Round-18 third wave: the native streaming sink
  * (`writeStream.toTable` → per-epoch staged parquet + token-deduped
  * CAS commits; complete mode = replace commits). */
class Round18cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wh = graft.util.TempDirs.scoped("r18c-wh")
  private lazy val ss = {
    val s = org.apache.spark.sql.GraftBridge.sessionWithConf(
      spark, Map("spark.sql.shuffle.partitions" -> "4"))
    // register on BOTH sessions: CatalogManager resolves catalog names
    // through SQLConf.get — the THREAD-ACTIVE session's conf — and
    // DataStreamWriter.toTable runs its existence check outside any
    // withActive wrapper, so the conf must be visible from whichever
    // session is active on the calling thread (else toTable falls back
    // to a CREATE that then collides with the existing table)
    Seq(spark, s).foreach { x =>
      x.conf.set("spark.sql.catalog.r18c_snap",
        classOf[graft.sources.GraftCatalog].getName)
      x.conf.set("spark.sql.catalog.r18c_snap.warehouse", wh)
    }
    s
  }

  private def mkSource(tag: String, n: Int): (String, String) = {
    val src = graft.util.TempDirs.scoped(s"$tag-src")
    val ckpt = graft.util.TempDirs.scoped(s"$tag-ckpt")
    spark.range(n).select(col("id").as("tid"),
      (col("id") * 2.0).as("amount"))
      .repartition(3).write.parquet(s"$src/pages")
    (src, ckpt)
  }

  private val schemaDDL = "tid BIGINT, amount DOUBLE"

  test("writeStream.toTable appends one token-deduped commit per epoch") {
    val (src, ckpt) = mkSource("r18c-app", 30)
    val root = s"$wh/sink1"
    SnapshotStore.createEmpty(root,
      org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
    def runOnce(): Unit = {
      val q = ss.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
        .option("maxFilesPerTrigger", "1").parquet(s"$src/pages")
        .writeStream.option("checkpointLocation", ckpt)
        .toTable("r18c_snap.sink1")
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    runOnce()
    // v1 createEmpty + one commit per micro-batch (3 source files)
    assert(SnapshotStore.versions(root) == Seq(1, 2, 3, 4))
    (2 to 4).foreach { v =>
      assert(SnapshotStore.manifestMeta(root, v).get("writer")
        .exists(_.startsWith("toTable:")), s"v$v carries the epoch token")
    }
    val head = SnapshotStore.read(spark, root)
    assert(head.count() == 30L)
    assert(head.agg(sum(col("amount"))).head().getDouble(0)
      == (0 until 30).map(_ * 2.0).sum)
    // a rerun on the same (fully-committed) checkpoint publishes NOTHING
    runOnce()
    assert(SnapshotStore.versions(root) == Seq(1, 2, 3, 4))
    // the SQL face reads it like any table, schema pinned (no footers)
    assert(ss.sql("SELECT count(*) AS n FROM r18c_snap.sink1")
      .head().getLong(0) == 30L)
  }

  test("crash-replay: the re-delivered epoch's commit no-ops via its token") {
    val (src, ckpt) = mkSource("r18c-replay", 30)
    val root = s"$wh/sink2"
    SnapshotStore.createEmpty(root,
      org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
    def runOnce(): Unit = {
      val q = ss.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
        .option("maxFilesPerTrigger", "1").parquet(s"$src/pages")
        .writeStream.option("checkpointLocation", ckpt)
        .toTable("r18c_snap.sink2")
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    runOnce()
    assert(SnapshotStore.versions(root) == Seq(1, 2, 3, 4))
    // crash window: sink committed, checkpoint marker (+ crc) lost
    val commitDir = new java.io.File(ckpt, "commits")
    val markers = commitDir.listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    require(markers.last.delete())
    new java.io.File(commitDir, s".${markers.last.getName}.crc").delete()
    runOnce() // re-executes the last epoch with the SAME queryId/epochId
    assert(SnapshotStore.versions(root) == Seq(1, 2, 3, 4),
      "replayed epoch must find its token and publish nothing")
    assert(SnapshotStore.read(spark, root).count() == 30L,
      "no double-committed rows")
  }

  test("complete mode publishes one REPLACE commit per epoch") {
    val (src, ckpt) = mkSource("r18c-complete", 40)
    val root = s"$wh/sink3"
    SnapshotStore.createEmpty(root,
      org.apache.spark.sql.types.StructType.fromDDL(
        "bucket BIGINT, n BIGINT"))
    val q = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
      .option("maxFilesPerTrigger", "1").parquet(s"$src/pages")
      .groupBy((col("tid") % 4).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .toTable("r18c_snap.sink3")
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    val vs = SnapshotStore.versions(root)
    assert(vs.size >= 3, s"one replace per epoch, got $vs")
    // the head IS the final aggregate (each epoch replaced the last)
    val head = SnapshotStore.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(head == (0L to 3L).map(b => b -> 10L).toMap)
    // earlier epochs remain time-travel readable with FEWER counts
    val mid = SnapshotStore.read(spark, root, Some(vs(1))).collect()
      .map(_.getLong(1)).sum
    assert(mid < 40L && mid > 0L)
  }
}
