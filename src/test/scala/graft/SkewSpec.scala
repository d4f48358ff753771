package graft

import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.ScaleTechniques

/** Measured task-level skew evidence for the x4/x5 pair: at bench
  * scale both run in well under a second (wall-clock there is
  * overhead-dominated, like the partition-pruning headline), so the
  * scale claim is pinned where it is actually visible — the
  * per-task shuffle-read distribution. The direct window form must
  * concentrate the hot key's rows in ONE task; the agg+broadcast
  * rewrite must never give any task more than a sliver. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = 200000L

  /** Half the rows on key 0, the rest spread over a modular tail —
    * the same shape as ScaleQueries' lineitem-derived fixture. */
  private def skewed(s: org.apache.spark.sql.SparkSession) =
    s.range(0, N, 1, 8).toDF("id")
      .select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 1024)
          .as("skew_key"),
        col("id"), (col("id") % 97).cast("double").as("v"))

  /** Max shuffle-read records over all tasks during `action`
    * (listener delivery is async: poll until the max stops moving). */
  private def maxShuffleTaskRecords(action: => Unit): Long = {
    val max = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          max.updateAndGet(c => math.max(c, r))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var prev = -1L
      var cur = max.get
      var spins = 0
      while (prev != cur && spins < 50) {
        Thread.sleep(100); prev = cur; cur = max.get; spins += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("hot key lands in one window task; the join rewrite spreads it") {
    // independent SQLConf so the 16-way shuffle doesn't leak into the
    // suite-shared session (2 shuffle partitions would mask any skew)
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "16")
    val df = skewed(s)
    val windowMax = maxShuffleTaskRecords {
      ScaleTechniques.windowKeyTotal(df, "skew_key", "v")
        .agg(sum(col("v_key_total"))).collect()
    }
    val joinMax = maxShuffleTaskRecords {
      ScaleTechniques.joinKeyTotal(df, "skew_key", "v")
        .agg(sum(col("v_key_total"))).collect()
    }
    // the window partition for key 0 holds N/2 rows in a single task
    assert(windowMax >= (N * 2) / 5,
      s"window hot task read only $windowMax of $N rows")
    // the rewrite's only shuffle is the two-stage aggregate: partials
    // absorb the hot key map-side, so no task sees more than a sliver
    assert(joinMax <= windowMax / 3,
      s"join rewrite still skewed: $joinMax vs window $windowMax")
  }

  test("joinKeyTotal values are bit-identical to the window form") {
    val s = spark.newSession()
    val df = skewed(s).filter(col("id") < 5000)
    val viaWindow = ScaleTechniques.windowKeyTotal(df, "skew_key", "v")
      .select("id", "v_key_total").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaJoin = ScaleTechniques.joinKeyTotal(df, "skew_key", "v")
      .select("id", "v_key_total").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaWindow == viaJoin)
  }
}
