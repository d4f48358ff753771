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

  /** Eager checkpoint-or-localCheckpoint: truncates lineage either way,
    * and a configured checkpoint dir upgrades the truncation to a
    * fault-tolerant one — localCheckpoint blocks are unreplicated, so
    * an executor loss cannot recompute past the truncation. Iterative
    * loops (connected components) and released-cache snapshots
    * (candidate pair sets) both route through this so a cluster
    * deployment gets reliability by setting one conf. */
  def snapshot(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(true)
    else df.localCheckpoint(true)
}
