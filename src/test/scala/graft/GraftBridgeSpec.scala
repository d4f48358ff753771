package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.GraftBridge

/** The session-rebind seam: the streaming harness registers memory-sink
  * temp views on a cloned session and hands the result back to the
  * caller's session through bindTo. Round 6 regression: binding the
  * UNRESOLVED plan re-analyzed the clone-local view name against the
  * caller's catalog (TABLE_OR_VIEW_NOT_FOUND); bindTo must bind the
  * analyzed plan. */
class GraftBridgeSpec extends AnyFunSuite {

  test("bindTo carries a clone-local temp view back to the base session") {
    val base = TestSpark.spark
    import base.implicits._
    val clone = GraftBridge.sessionWithConf(base,
      Map("spark.sql.shuffle.partitions" -> "1"))
    // view exists ONLY in the clone's catalog (cloneSession copies the
    // temp-view map at clone time; later registrations stay clone-local)
    clone.createDataFrame(Seq((1, "a"), (2, "b"), (3, "c"))).toDF("id", "v")
      .createOrReplaceTempView("graft_bridge_spec_view")
    assert(!base.catalog.tableExists("graft_bridge_spec_view"))
    val df = clone.table("graft_bridge_spec_view")
    val bound = GraftBridge.bindTo(df, base)
    assert(bound.sparkSession eq base)
    assert(bound.count() == 3)
    assert(bound.filter($"id" > 1).count() == 2)
  }

  test("withSessionConf scopes conf without mutating the base session") {
    val base = TestSpark.spark
    import base.implicits._
    val before = base.conf.get("spark.sql.shuffle.partitions")
    val df = GraftBridge.withSessionConf(
      Seq(1, 2, 3).toDF("x"),
      Map("spark.sql.shuffle.partitions" -> "1"))
    assert(df.sparkSession.conf.get("spark.sql.shuffle.partitions") == "1")
    assert(base.conf.get("spark.sql.shuffle.partitions") == before)
    assert(GraftBridge.bindTo(df, base).count() == 3)
  }
}
