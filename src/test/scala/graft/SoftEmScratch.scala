package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: measure soft-EM vs hard-EM Viterbi log-lik at the
  * binding vocab budget (not part of the library surface). */
object SoftEmScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.util.Tables.load(spark, sfDir, "documents")
    for (budget <- Seq(24, 200)) {
      val t0 = System.nanoTime()
      val (_, hs, _) = graft.operators.TextUnigramLm.train(
        docs, targetMultis = budget)
      val t1 = System.nanoTime()
      val (_, ss, _) = graft.operators.TextUnigramLm.trainSoft(
        docs, targetMultis = budget)
      val t2 = System.nanoTime()
      println(s"budget=$budget hard_ll=${hs.last.loglik_micro} " +
        s"soft_ll=${ss.last.loglik_micro} " +
        s"soft_wins=${ss.last.loglik_micro >= hs.last.loglik_micro} " +
        f"hard=${(t1 - t0) / 1e9}%.1fs soft=${(t2 - t1) / 1e9}%.1fs")
      println("hard iters: " + hs.map(_.loglik_micro).mkString(", "))
      println("soft iters: " + ss.map(_.loglik_micro).mkString(", "))
    }
    spark.stop()
  }
}
