package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Round-17 fourth wave: SQL maintenance procedures (CALL). */
class Round17dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = graft.util.TempDirs.scoped("r17d-wh")

  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.r17d_snap",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.r17d_snap.warehouse", wh)
  }

  test("CALL set_tag pins a name readable via VERSION AS OF") {
    val root = s"$wh/tagme"
    SnapshotStore.commitAppend(
      spark.range(4).select(col("id").as("tid")), root)
    registerCatalog()
    val res = spark.sql(
      "CALL r17d_snap.system.set_tag('tagme', 'baseline')").collect()
    assert(res.length == 1 &&
      res.head.getString(0) == "baseline" && res.head.getInt(1) == 1)
    SnapshotStore.commitAppend(
      spark.range(4).select(col("id").as("tid")), root)
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.tagme VERSION AS OF 'baseline'")
      .head().getLong(0) == 4)
    assert(spark.sql("SELECT count(*) AS n FROM r17d_snap.tagme")
      .head().getLong(0) == 8)
    // explicit version argument moves the tag
    spark.sql("CALL r17d_snap.system.set_tag('tagme', 'baseline', 2)")
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.tagme VERSION AS OF 'baseline'")
      .head().getLong(0) == 8)
  }

  test("CALL compact merges small files, readers see identical rows") {
    val root = s"$wh/packme"
    SnapshotStore.commitAppend(
      spark.range(20).select(col("id").as("tid")).repartition(5), root)
    registerCatalog()
    val before = spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.packme").head().getLong(0)
    val res = spark.sql(
      "CALL r17d_snap.system.compact('packme', 1048576, 2)").collect()
    assert(res.head.getInt(0) == 2, "compaction published version 2")
    assert(res.head.getInt(1) == 5, "all 5 small files merged")
    assert(SnapshotStore.filesAt(root, 2).size <= 2)
    assert(spark.sql("SELECT count(*) AS n FROM r17d_snap.packme")
      .head().getLong(0) == before)
    // the pre-compaction version still reads its own files
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.packme VERSION AS OF 1")
      .head().getLong(0) == before)
  }

  test("CALL expire keeps tagged versions and purges orphans") {
    val root = s"$wh/expireme"
    SnapshotStore.commitReplace(
      spark.range(6).select(col("id").as("tid")), root)
    registerCatalog()
    spark.sql("CALL r17d_snap.system.set_tag('expireme', 'keep', 1)")
    SnapshotStore.commitReplace(
      spark.range(7).select(col("id").as("tid")), root)
    SnapshotStore.commitReplace(
      spark.range(8).select(col("id").as("tid")), root)
    val res = spark.sql(
      "CALL r17d_snap.system.expire('expireme', 1, 0)").collect()
    assert(res.head.getInt(0) == 1, "v2 expired (v1 tagged, v3 head)")
    assert(res.head.getInt(1) == 2, "v1 + v3 survive")
    assert(res.head.getInt(2) > 0, "v2's replaced files were purged")
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.expireme VERSION AS OF 'keep'")
      .head().getLong(0) == 6)
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM r17d_snap.expireme VERSION AS OF 2").collect()
    }
  }

  test("CALL merge_rows applies a changelog view as MERGE INTO") {
    val root = s"$wh/mergeme"
    SnapshotStore.commitAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("tid", "v"), root)
    registerCatalog()
    Seq((2L, "b2", "U", 10L, 1L), (3L, "c", "D", 11L, 2L),
      (9L, "i", "U", 12L, 3L))
      .toDF("tid", "v", "op", "seq", "id")
      .createOrReplaceTempView("r17d_changes")
    val res = spark.sql(
      """CALL r17d_snap.system.merge_rows('mergeme', 'r17d_changes',
        |  'tid', 'op', 'seq', 'id')""".stripMargin).collect()
    assert(res.head.getInt(0) == 2)
    val rows = spark.sql(
      "SELECT tid, v FROM r17d_snap.mergeme ORDER BY tid").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (9L, "i")))
    // pre-merge version unchanged
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.mergeme VERSION AS OF 1")
      .head().getLong(0) == 3)
  }

  test("CALL index re-clusters and makes pushed ranges prune files") {
    val root = s"$wh/indexme"
    SnapshotStore.commitAppend(
      spark.range(400).select(col("id").as("tid"),
        timestamp_micros(lit(1767225600000000L) + col("id") * 1000000L)
          .as("ts"),
        (col("id") * 2).cast("double").as("amount")).repartition(4), root)
    registerCatalog()
    val res = spark.sql(
      "CALL r17d_snap.system.index('indexme', 'ts,tid', 4)").collect()
    assert(res.head.getInt(0) == 2)
    assert(res.head.getString(1) == "ts:ts,tid:long")
    def planned(sql: String): Int =
      spark.sql(sql).queryExecution.sparkPlan.collect {
        case bs: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => bs.scan
      }.map(graft.sources.SnapshotSource.unwrap).map[Int] {
        case q: org.apache.spark.sql.execution.datasources.v2.parquet
            .ParquetScan => q.fileIndex.inputFiles.length
        case _ => 0
      }.sum
    val total = SnapshotStore.filesAt(root, 2).size
    assert(planned(
      "SELECT tid FROM r17d_snap.indexme WHERE tid < 50") < total)
    assert(planned(
      """SELECT tid FROM r17d_snap.indexme
        |WHERE ts < timestamp_micros(1767225650000000)""".stripMargin)
      < total)
    assert(spark.sql("SELECT count(*) AS n FROM r17d_snap.indexme")
      .head().getLong(0) == 400, "re-indexing changes no rows")
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.indexme VERSION AS OF 1")
      .head().getLong(0) == 400)
    // build_bloom on top: a point query prunes to ~1 file
    spark.sql("CALL r17d_snap.system.build_bloom('indexme', 'tid')")
    assert(planned(
      "SELECT amount FROM r17d_snap.indexme WHERE tid = 7") <= 2)
  }

  test("metadata tables: history, files, tags") {
    val root = s"$wh/meta"
    SnapshotStore.commitAppend(
      spark.range(6).select(col("id").as("tid")).repartition(2), root,
      Some("q:b1"))
    SnapshotStore.stampManifest(root, 1, 1700000000000L)
    SnapshotStore.commitAppend(
      spark.range(3).select(col("id").as("tid")).repartition(1), root)
    SnapshotStore.stampManifest(root, 2, 1700000005000L)
    SnapshotStore.tag(root, "first", Some(1))
    registerCatalog()
    val hist = spark.sql(
      "SELECT * FROM r17d_snap.meta.history ORDER BY version").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(hist.map(_.getLong(1)).toSeq ==
      Seq(1700000000000L, 1700000005000L))
    assert(hist.head.getInt(2) == 2 && hist(1).getInt(2) == 3)
    assert(hist.head.getString(3) == "q:b1" && hist(1).isNullAt(3))
    val files = spark.sql("SELECT path, size_bytes FROM r17d_snap.meta.files")
      .collect()
    assert(files.map(_.getString(0)).toSet ==
      SnapshotStore.filesAt(root, 2).toSet)
    assert(files.forall(_.getLong(1) > 0))
    val tags = spark.sql("SELECT * FROM r17d_snap.meta.tags").collect()
    assert(tags.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("first", 1)))
    // metadata reflects CURRENT state on re-query
    SnapshotStore.commitAppend(
      spark.range(2).select(col("id").as("tid")), root)
    assert(spark.sql("SELECT count(*) AS n FROM r17d_snap.meta.history")
      .head().getLong(0) == 3)
  }

  test("a real table named like a metadata kind wins resolution") {
    val root = s"$wh/sub/history"
    SnapshotStore.commitAppend(
      spark.range(4).select(col("id").as("tid")), root)
    registerCatalog()
    assert(spark.sql("SELECT count(*) AS n FROM r17d_snap.sub.history")
      .head().getLong(0) == 4, "the genuine table, not sub's history")
  }

  test("TRUNCATE TABLE routes through the copy-on-write delete") {
    val root = s"$wh/truncme"
    SnapshotStore.commitAppend(
      spark.range(5).select(col("id").as("tid")), root)
    registerCatalog()
    spark.sql("TRUNCATE TABLE r17d_snap.truncme")
    assert(spark.sql("SELECT count(*) AS n FROM r17d_snap.truncme")
      .head().getLong(0) == 0)
    assert(spark.sql(
      "SELECT count(*) AS n FROM r17d_snap.truncme VERSION AS OF 1")
      .head().getLong(0) == 5, "pre-truncate snapshot intact")
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE list the surface") {
    registerCatalog()
    val names = spark.sql("SHOW PROCEDURES IN r17d_snap.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(names == Set("set_tag", "compact", "expire", "merge_rows",
      "index", "build_bloom", "set_spec"))
    val desc = spark.sql("DESCRIBE PROCEDURE r17d_snap.system.set_tag")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("set_tag") && desc.contains("pin a tag"))
  }

  test("unknown procedure names itself and the known set") {
    registerCatalog()
    val e = intercept[Exception] {
      spark.sql("CALL r17d_snap.system.optimize('x')").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("optimize") &&
      c.getMessage.contains("set_tag")), s"got: $e")
  }
}
