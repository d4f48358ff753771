package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Round-18 fifth wave: row-level SQL DML — UPDATE, MERGE INTO, and
  * subquery DELETEs through SupportsRowLevelOperations (copy-on-write
  * ReplaceData over the staged-parquet seam). */
class Round18eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wh = graft.util.TempDirs.scoped("r18e-wh")
  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.r18e_snap",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.r18e_snap.warehouse", wh)
  }

  private def freshTable(name: String, n: Int): String = {
    val root = s"$wh/$name"
    SnapshotStore.commitAppend(
      spark.range(n).select(col("id").as("tid"),
        (col("id") * 2.0).as("amount")), root)
    registerCatalog()
    root
  }

  test("UPDATE rewrites matching rows, copies the rest through") {
    val root = freshTable("upd", 20)
    spark.sql(
      "UPDATE r18e_snap.upd SET amount = amount + 1000 WHERE tid % 5 = 0")
    val rows = spark.sql("SELECT tid, amount FROM r18e_snap.upd").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size == 20, "unmatched rows copied through")
    (0L until 20L).foreach { t =>
      val want = if (t % 5 == 0) t * 2.0 + 1000 else t * 2.0
      assert(rows(t) == want, s"tid=$t")
    }
    // the update was ONE replace commit; the old version still reads
    assert(SnapshotStore.versions(root) == Seq(1, 2))
    assert(spark.sql(
      "SELECT CAST(sum(amount) AS DOUBLE) FROM r18e_snap.upd VERSION AS OF 1")
      .head().getDouble(0) == (0 until 20).map(_ * 2.0).sum)
  }

  test("MERGE INTO applies delete/update/insert in one statement") {
    freshTable("mrg", 10)
    spark.range(8, 14).select(col("id").as("tid"),
      lit(99.0).as("amount"),
      when(col("id") === 8, "D").otherwise("U").as("op"))
      .createOrReplaceTempView("r18e_changes")
    spark.sql(
      """MERGE INTO r18e_snap.mrg t USING r18e_changes c ON t.tid = c.tid
        |WHEN MATCHED AND c.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET amount = c.amount
        |WHEN NOT MATCHED THEN INSERT (tid, amount) VALUES (c.tid, c.amount)
        |""".stripMargin)
    val rows = spark.sql("SELECT tid, amount FROM r18e_snap.mrg").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 0..7 untouched minus 8 deleted; 9 updated; 10..13 inserted
    assert(!rows.contains(8L), "matched D deletes")
    assert(rows(9L) == 99.0, "matched U updates")
    (10L to 13L).foreach(t => assert(rows(t) == 99.0, s"insert $t"))
    (0L to 7L).foreach(t => assert(rows(t) == t * 2.0, s"carry $t"))
    assert(rows.size == 13)
  }

  test("a subquery DELETE takes the row-level path and works") {
    val root = freshTable("subdel", 12)
    spark.range(3).select((col("id") * 4).as("bad"))
      .createOrReplaceTempView("r18e_bad")
    spark.sql(
      "DELETE FROM r18e_snap.subdel WHERE tid IN (SELECT bad FROM r18e_bad)")
    val left = spark.sql("SELECT tid FROM r18e_snap.subdel").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(left == (0L until 12L).filterNot(t => t % 4 == 0 && t < 12))
    assert(SnapshotStore.versions(root) == Seq(1, 2))
  }

  test("UPDATE and MERGE on an EMPTY table commit an empty replacement") {
    registerCatalog()
    spark.sql("CREATE TABLE r18e_snap.empt (tid BIGINT, amount DOUBLE)")
    val root = s"$wh/empt"
    spark.sql("UPDATE r18e_snap.empt SET amount = 0 WHERE tid = 1")
    assert(SnapshotStore.versions(root) == Seq(1, 2))
    assert(spark.sql("SELECT count(*) FROM r18e_snap.empt")
      .head().getLong(0) == 0L)
    // MERGE into the empty table: only the INSERT branch fires
    spark.range(2).select(col("id").as("tid"), lit(1.0).as("amount"))
      .createOrReplaceTempView("r18e_seed")
    spark.sql(
      """MERGE INTO r18e_snap.empt t USING r18e_seed c ON t.tid = c.tid
        |WHEN MATCHED THEN UPDATE SET amount = c.amount
        |WHEN NOT MATCHED THEN INSERT (tid, amount) VALUES (c.tid, c.amount)
        |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM r18e_snap.empt")
      .head().getLong(0) == 2L)
  }

  test("UPDATE preserves the table's default spec and statcol headers") {
    registerCatalog()
    val root = s"$wh/specupd"
    // a FLAT stats-indexed table with a default spec set for FUTURE
    // writes (set_spec is metadata-only, so the layout stays flat and
    // row-level ops remain available — evolved layouts refuse them)
    SnapshotStore.commitAppendWithStats(
      spark.range(8).select(col("id").as("tid"),
        (col("id") * 1.0).as("amount"),
        (col("id") % 2).cast("string").as("shard")), root, "tid", 2)
    spark.sql("CALL r18e_snap.system.set_spec('specupd', 'shard')")
    spark.sql("UPDATE r18e_snap.specupd SET amount = 0 WHERE tid = 3")
    // an UPDATE replaces DATA, not table metadata: the spec AND the
    // statcol header survive, and the NEXT insert lands partitioned
    assert(SnapshotStore.currentSpec(root) == Seq("shard"))
    assert(SnapshotStore.statCols(root,
      SnapshotStore.latestVersion(root)) == Map("tid" -> "long"))
    spark.range(8, 10).select(col("id").as("tid"),
      (col("id") * 1.0).as("amount"), (col("id") % 2).cast("string")
        .as("shard")).createOrReplaceTempView("r18e_su2")
    spark.sql(
      "INSERT INTO r18e_snap.specupd SELECT tid, amount, shard FROM r18e_su2")
    val v4 = SnapshotStore.latestVersion(root)
    val fresh = SnapshotStore.filesAt(root, v4).toSet --
      SnapshotStore.filesAt(root, v4 - 1).toSet
    assert(fresh.nonEmpty && fresh.forall(_.contains("/shard=")))
    assert(spark.sql("SELECT count(*) FROM r18e_snap.specupd")
      .head().getLong(0) == 10L)
    assert(spark.sql(
      "SELECT CAST(sum(amount) AS DOUBLE) FROM r18e_snap.specupd " +
        "WHERE tid = 3").head().getDouble(0) == 0.0)
  }

  test("a staged replace against a stale base refuses with the CAS conflict") {
    val root = s"$wh/stale"
    SnapshotStore.commitAppend(
      spark.range(3).select(col("id").as("tid")), root)
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("tid BIGINT")
    // base pinned at v1, head still v1: commits fine
    SnapshotStore.commitStagedReplace(root, Seq.empty, schema, None,
      expectedPrev = Some(1))
    assert(SnapshotStore.latestVersion(root) == 2)
    // base pinned at v1, but the head moved: a silent replace would
    // erase v2 — must throw the retryable conflict instead
    intercept[SnapshotStore.CommitConflictException] {
      SnapshotStore.commitStagedReplace(root, Seq.empty, schema, None,
        expectedPrev = Some(1))
    }
    assert(SnapshotStore.latestVersion(root) == 2, "nothing published")
  }

  test("a translatable DELETE still takes the targeted metadata path") {
    val root = freshTable("fastdel", 100)
    // 4 tid-ranged files with stats: a targeted delete rewrites ONE
    SnapshotStore.commitReplace(spark.createDataFrame(
      SnapshotStore.read(spark, root).rdd,
      SnapshotStore.read(spark, root).schema), root)
    val root2 = s"$wh/fastdel2"
    val t = spark.range(100).select(col("id").as("tid"),
      (col("id") * 2.0).as("amount"))
    for (i <- 0 until 4)
      SnapshotStore.commitAppendWithStats(
        t.filter(col("tid") >= i * 25 && col("tid") < (i + 1) * 25),
        root2, "tid", 1)
    registerCatalog()
    val before = SnapshotStore.filesAt(root2, 4)
    spark.sql("DELETE FROM r18e_snap.fastdel2 WHERE tid >= 10 AND tid <= 20")
    val after = SnapshotStore.filesAt(root2, 5)
    // targeted copy-on-write: 3 of 4 files carried BY PATH — the
    // row-level full rewrite would have replaced all of them
    assert(before.toSet.intersect(after.toSet).size == 3,
      "translatable predicates must keep the deleteWhere fast path")
    assert(spark.sql("SELECT count(*) FROM r18e_snap.fastdel2")
      .head().getLong(0) == 89L)
  }
}
