package graft

import org.apache.spark.sql.SparkSession

/** Throwaway optimization experiments (deleted before round end).
  * Mini-bench with env-driven conf overrides:
  *   SPARK_GRAFT_EXP_CONF="k=v;k2=v2" SPARK_GRAFT_ONLY=q1,q2 runMain graft.Exp
  */
object Exp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.getOrElse("SPARK_GRAFT_EXP_CONF", "").split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try graft.util.Tables.names.foreach { t =>
      try graft.util.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    } catch { case _: Throwable => () }
    try graft.queries.SystemQueries.prunedStore(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.queries.ScaleQueries.ensureX2Tables(spark, sfDir)
    catch { case _: Throwable => () }

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[exp] $name FAILED: ${e.getMessage}"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        try spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        catch { case _: Throwable => () }
        println(f"[exp] $name: $sec%.3f ok=$ok")
        (name, sec, ok)
      }
    println(f"[exp] TOTAL ${results.map(_._2).sum}%.3f failed=${results.count(!_._3)}")
    spark.stop()
  }
}
