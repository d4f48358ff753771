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

  test("snapshot loops cannot compound size estimates (BigInt blowup)") {
    // Dataset.checkpoint copies the origin plan's estimated
    // sizeInBytes onto the new leaf and join estimation MULTIPLIES
    // child sizes, so a snapshot-per-round loop squares the estimate
    // every round — by round ~25 the driver wedges for minutes in
    // BigInteger products just planning (observed on the sf1 cluster
    // loop). Caches.snapshot clamps each leaf, so 20 rounds of
    // self-join+snapshot must keep every estimate at or below the cap
    // (and this test finishes in seconds instead of geologic time).
    val spark = TestSpark.spark
    import spark.implicits._
    val cap = BigInt(2).pow(50)
    var labels = graft.util.Caches.snapshot(
      Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "label"))
    for (_ <- 1 to 20) {
      val parent = labels.select($"id".as("label"), $"label".as("_ll"))
      labels = graft.util.Caches.snapshot(
        labels.join(parent, Seq("label"), "left")
          .select($"id", org.apache.spark.sql.functions.coalesce($"_ll",
            $"label").as("label")))
      val est = labels.queryExecution.logical.stats.sizeInBytes
      assert(est <= cap, s"snapshot leaf estimate $est exceeds the cap")
    }
    assert(labels.count() == 3)
  }
}
