package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{BloomIndex, SnapshotRead, SnapshotStore}

/** Round-16 third wave: sidecar pruning through the SQL catalog —
  * pushed-down predicates must shrink the PLANNED file set to exactly
  * what the Scala SnapshotRead planner keeps. */
class Round16cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case bs: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => bs.scan
    }.map(graft.sources.SnapshotSource.unwrap).collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet
          .ParquetScan => p.fileIndex.inputFiles.toSeq
    }.flatten

  test("SQL pushdown prunes by stats and Bloom like SnapshotRead") {
    val wh = graft.util.TempDirs.scoped("r16c-wh")
    val root = s"$wh/t"
    val t = spark.range(80).select(col("id").as("tid"),
      (col("id") * 10).cast("double").as("amount"))
    SnapshotStore.commitAppendWithStats(t, root, "tid", 4)
    BloomIndex.build(spark, root, "tid")
    spark.conf.set("spark.sql.catalog.g16c", classOf[
      graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16c.warehouse", wh)

    val full = plannedFiles(spark.sql("SELECT * FROM g16c.t"))
    assert(full.size == 4, "no predicate: every manifest file planned")

    // range: same survivors as the Scala planner's stats layer
    val r = spark.sql("SELECT sum(amount) FROM g16c.t WHERE tid >= 0 AND tid <= 15")
    val rLedger = SnapshotRead.plan(spark, root,
      range = Some(("tid", 0L, 15L)))
    assert(plannedFiles(r).size == rLedger.filesAfterStats,
      "SQL range scan must plan exactly the stats survivors")
    assert(rLedger.statsSkipped > 0)
    assert(r.head.getDouble(0) == (0 to 15).map(_ * 10.0).sum)

    // point: same survivors as the Scala planner's Bloom layer
    val p = spark.sql("SELECT count(*) FROM g16c.t WHERE tid = 7")
    val pLedger = SnapshotRead.plan(spark, root, point = Some(("tid", 7L)))
    assert(plannedFiles(p).size == pLedger.filesAfterBloom,
      "SQL point scan must plan exactly the Bloom survivors")
    assert(pLedger.filesAfterBloom == 1)
    assert(p.head.getLong(0) == 1L)

    // absent key: everything skipped, one file kept for schema, zero rows
    val miss = spark.sql("SELECT count(*) FROM g16c.t WHERE tid = -5")
    assert(plannedFiles(miss).size == 1)
    assert(miss.head.getLong(0) == 0L)

    // an unsupported predicate shape prunes nothing and stays correct
    val odd = spark.sql("SELECT count(*) FROM g16c.t WHERE tid % 2 = 1")
    assert(plannedFiles(odd).size == 4)
    assert(odd.head.getLong(0) == 40L)

    // IN-list: union of per-key Bloom survivors — 7 and 63 live in
    // opposite range files, so exactly two files survive
    val in = spark.sql("SELECT count(*) FROM g16c.t WHERE tid IN (7, 63)")
    assert(plannedFiles(in).size == 2)
    assert(in.head.getLong(0) == 2L)
  }

  test("statcol metadata survives later appends and maintenance") {
    val wh = graft.util.TempDirs.scoped("r16c-carry")
    val root = s"$wh/t"
    val t = spark.range(40).select(col("id").as("tid"),
      lit(1.0).as("amount"))
    SnapshotStore.commitAppendWithStats(t, root, "tid", 4)
    SnapshotStore.commitAppend(
      spark.range(40, 50).select(col("id").as("tid"),
        lit(2.0).as("amount")), root)
    spark.conf.set("spark.sql.catalog.g16cc", classOf[
      graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16cc.warehouse", wh)
    val r = spark.sql("SELECT count(*) FROM g16cc.t WHERE tid <= 5")
    val ledger = SnapshotRead.plan(spark, root,
      range = Some(("tid", Long.MinValue, 5L)))
    assert(ledger.statsSkipped > 0,
      "the carried stats must still prune v1 files")
    assert(plannedFiles(r).size == ledger.filesAfterStats)
    assert(r.head.getLong(0) == 6L)
  }
}
