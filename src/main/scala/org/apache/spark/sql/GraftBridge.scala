package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge plus a session-scoped conf rebind.
  * Spark 4 marks ExpressionUtils / cloneSession / Dataset.ofRows
  * private[sql]; extension libraries conventionally expose them from
  * inside the package (same pattern as frameless / spark-daria /
  * sedona bridges). Nothing else from the private API is touched. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** One clone per (base session, conf overrides): cloneSession
    * registers listeners/state with the shared context for the
    * process lifetime, so an uncached helper called in a loop would
    * accumulate a SessionState per call. The distinct conf-map set is
    * small and stable (shuffle/state sizing), which bounds the cache.
    * Contract: treat the returned session as shared and read-only —
    * set conf ONLY through the `confs` argument. */
  private val cloneCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, Map[String, String]), SparkSession]

  /** Clone of `session` carrying `confs` overrides. The clone shares
    * the SparkContext, SharedState and CacheManager (cached plans
    * still hit), but its SQLConf is private — callers can size
    * shuffles / state stores without mutating the conf that
    * concurrent queries on the original session read. Cached per
    * (session, confs); see [[cloneCache]]. */
  def sessionWithConf(session: SparkSession,
      confs: Map[String, String]): SparkSession =
    cloneCache.getOrElseUpdate((session, confs), {
      val scoped = session.asInstanceOf[classic.SparkSession].cloneSession()
      confs.foreach { case (k, v) => scoped.conf.set(k, v) }
      scoped
    })

  /** Rebind `df` to a clone of its session carrying `confs` overrides
    * (see [[sessionWithConf]]) — iterative operators size their loop
    * shuffles through this instead of a set/finally-restore on the
    * shared conf. */
  def withSessionConf(df: DataFrame, confs: Map[String, String]): DataFrame =
    classic.Dataset.ofRows(
      sessionWithConf(df.sparkSession, confs)
        .asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical)

  /** Rebind `df`'s plan to `target` (the way home after
    * [[withSessionConf]]). Binds the ANALYZED plan: session-local
    * relations (e.g. a memory-sink temp view registered only on a
    * clone) must be resolved against the session that knows them
    * before the plan can execute under `target`'s catalog. */
  def bindTo(df: DataFrame, target: SparkSession): DataFrame =
    classic.Dataset.ofRows(target.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed)

  /** Clamp the size estimate a checkpointed `LogicalRDD` leaf carries
    * (Dataset.checkpoint copies the origin plan's Statistics onto the
    * new leaf; join-product estimation then compounds them across
    * snapshot-per-round loops — see graft.util.Caches.snapshot).
    * Leaves whose estimate is already at or below `cap` — every
    * honestly-sized table — are returned untouched, real row counts
    * and column stats are preserved either way. */
  /** Bloom-filter aggregate / membership probe — the expressions the
    * optimizer injects for runtime join filtering (SPARK-32268),
    * exposed for explicit use: `bloom_filter_agg` is not in the SQL
    * function registry, so a library-level Bloom prefilter (e.g.
    * benchmark-n-gram decontamination where the exact set is too big
    * to broadcast but the fixed-bits filter is not) has to build the
    * expression directly. Input must be LongType. */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    column(new catalyst.expressions.aggregate.BloomFilterAggregate(
      expression(c),
      catalyst.expressions.Literal(estimatedItems),
      catalyst.expressions.Literal(numBits)).toAggregateExpression())

  def bloomMightContain(bloom: Column, value: Column): Column =
    column(catalyst.expressions.BloomFilterMightContain(
      expression(bloom), expression(value)))

  /** One-row one-column frame as a scalar subquery expression —
    * `might_contain` requires its Bloom argument to be a constant or
    * scalar subquery, not a join output. */
  def scalarSubquery(df: DataFrame): Column =
    column(catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed))

  def capLeafStats(df: DataFrame, cap: BigInt): DataFrame =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical match {
      case lr: execution.LogicalRDD if lr.stats.sizeInBytes > cap =>
        val capped = lr.stats.copy(sizeInBytes = cap)
        val fresh = execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[classic.SparkSession],
          Some(capped), None)
        classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[classic.SparkSession], fresh)
      case _ => df
    }
}
