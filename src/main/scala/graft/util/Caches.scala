package graft.util

import org.apache.spark.sql.DataFrame

object Caches {

  /** Persist + eagerly materialize a DataFrame that feeds multiple
    * plan branches or a Generate (explode).
    *
    * Why both: (1) branches of one job race to populate a lazy cache
    * and each recomputes the subtree; (2) explode's implicit
    * `size(col) > 0` predicate is pushed down *through* staged
    * projections, re-inlining the whole upstream expression into a
    * row-level Filter where HOF lambdas re-evaluate their captured
    * expressions per element (measured ~50x). The cache is a hard
    * barrier against both. At cluster scale this is the standard
    * "signature table" materialization of a multi-branch pipeline. */
  def materialize(df: DataFrame): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    cached
  }

  /** Scale-adaptive repartition ahead of a per-row-heavy stage
    * (explode, shingle hashing): when the frame plans NARROWER than
    * half the session's parallelism — the harness corpus is ONE
    * parquet file, i.e. one scan task — spread it by `key` so the
    * explode and its map-side partial aggregation run wide instead of
    * single-task (guide §2.5 input skew). An already-parallel input
    * (any real multi-file table, and 100 TB in particular) passes
    * through untouched, paying no exchange. */
  def widen(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    if (df.rdd.getNumPartitions * 2 < spark.sparkContext.defaultParallelism)
      df.repartition(key)
    else df
  }

  /** Eager checkpoint-or-localCheckpoint: truncates lineage either way,
    * and a configured checkpoint dir upgrades the truncation to a
    * fault-tolerant one — localCheckpoint blocks are unreplicated, so
    * an executor loss cannot recompute past the truncation. Iterative
    * loops (connected components) and released-cache snapshots
    * (candidate pair sets) both route through this so a cluster
    * deployment gets reliability by setting one conf.
    *
    * The checkpointed leaf's carried size estimate is CAPPED: Spark
    * copies the origin plan's estimated Statistics onto the new leaf,
    * and Catalyst's size-only visitor MULTIPLIES child sizes through
    * joins — in a snapshot-per-round loop the estimate's bit-length
    * doubles every round (size_k ~ size_{k-1}^2), and by round ~25
    * the driver spends minutes on multi-megabit BigInteger products
    * just planning the next round (observed: the sf1 cluster loop
    * wedged single-threaded in BigInteger.multiplyToomCook3). Small
    * real estimates pass through untouched, so broadcast-threshold
    * decisions keep working; only the meaningless astronomical ones
    * are clamped. */
  def snapshot(df: DataFrame): DataFrame = {
    val chk =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(true)
      else df.localCheckpoint(true)
    org.apache.spark.sql.GraftBridge.capLeafStats(chk, BigInt(2).pow(50))
  }
}
