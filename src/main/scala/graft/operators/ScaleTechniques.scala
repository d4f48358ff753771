package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shuffle-discipline techniques the 100 TB deployment leans on,
  * expressed as *verifiable* operators rather than prose: salted
  * two-stage aggregation for skewed keys, and bucketed co-located
  * joins that eliminate the probe-side shuffle entirely.
  *
  * Both produce results identical to their naive one-shuffle
  * counterparts — the DuckDB oracles for their registered queries are
  * the plain formulations — so the rewrites are provably
  * value-preserving, and PlanAuditSpec pins the plan shapes
  * (two-stage aggregate; join with no Exchange above either scan).
  */
object ScaleTechniques {

  /** Two-stage salted sum/count: stage 1 aggregates on
    * (keys..., salt) so a heavy-hitter key spreads over `nSalts`
    * reducers instead of melting one; stage 2 combines the partials
    * on the true keys — a shuffle of at most `nSalts` rows per key.
    *
    * The salt must be a deterministic function of NON-key columns
    * (`saltFrom`) so re-runs place every row in the same salted group.
    * Partial sums are exact decimals, so re-association cannot change
    * the final double — the salted plan is bit-identical to the
    * direct `groupBy(keys).agg(dsum)`. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFrom: String, nSalts: Int = 16): DataFrame = {
    val salt = pmod(hash(col(saltFrom)), lit(nSalts))
    df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(28, 6))).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_psum")).cast("double").as(s"${valueCol}_sum"),
        sum(col("_pcnt")).as("n_rows"))
  }

  /** Windowed per-key total, the DIRECT form: `sum() OVER
    * (PARTITION BY key)`. On a power-law key this is the shape skew
    * actually kills in Spark — a partitioned window materializes and
    * sorts the whole hot partition in ONE task (partial aggregation,
    * which neutralizes input skew for algebraic `groupBy` aggregates,
    * does not apply to windows). Registered only as the bench
    * contrast for [[joinKeyTotal]]. */
  def windowKeyTotal(df: DataFrame, key: String, valueCol: String)
      : DataFrame =
    df.withColumn(s"${valueCol}_key_total",
      sum(col(valueCol).cast(DecimalType(28, 6)))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)))
        .cast("double"))

  /** The skew-safe rewrite of [[windowKeyTotal]]: two-stage
    * aggregate (map-side partials absorb the hot key) + broadcast
    * join back. No per-key sort, no single hot task; the dimension
    * side is one row per key. Decimal partials keep the value
    * bit-identical to the window form, so both share one oracle. */
  def joinKeyTotal(df: DataFrame, key: String, valueCol: String)
      : DataFrame = {
    val totals = df.groupBy(col(key))
      .agg(sum(col(valueCol).cast(DecimalType(28, 6))).as("_t"))
    df.join(broadcast(totals), key)
      .withColumn(s"${valueCol}_key_total", col("_t").cast("double"))
      .drop("_t")
  }

  // no dots: the suffix becomes part of a catalog table name
  private def san(s: String): String = s.replaceAll("[^A-Za-z0-9]", "_")

  /** Bucketed twin tables for a shuffle-free equi-join on
    * `bucketCol`: both sides are written `bucketBy(n)` + `sortBy` on
    * the join key, so the sort-merge join needs neither an Exchange
    * nor a Sort on either side — Spark's equivalent of ClickHouse
    * keeping the dictionary and the fact co-located. Tables are
    * created once per (session, sf dir); `aggFn` builds the dimension
    * side FROM the bucketed fact scan, so even its groupBy runs
    * without a shuffle. Returns (fact table name, dim table name). */
  def ensureBucketedPair(s: SparkSession, dir: String, fact: DataFrame,
      bucketCol: String, aggFn: DataFrame => DataFrame,
      nBuckets: Int = 8): (String, String) = {
    // full-path hash + readable tail: two dirs can share a sanitized
    // tail (same sf name under different roots), and a suffix
    // collision would silently reuse the FIRST dir's bucketed data
    val suffix = f"${dir.hashCode & 0xffffff}%06x_" +
      san(dir).takeRight(20).dropWhile(_ == '_')
    val factTable = s"graft_fact_b_$suffix"
    val dimTable = s"graft_dim_b_$suffix"
    if (!s.catalog.tableExists(factTable)) {
      fact.write.mode(SaveMode.Overwrite)
        .option("path", s"/tmp/graft_bucketed/$suffix/fact")
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(factTable)
    }
    if (!s.catalog.tableExists(dimTable)) {
      aggFn(s.table(factTable)).write.mode(SaveMode.Overwrite)
        .option("path", s"/tmp/graft_bucketed/$suffix/dim")
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(dimTable)
    }
    (factTable, dimTable)
  }

  /** The co-located join itself: plain `join` over the two bucketed
    * scans — bucket metadata makes Catalyst drop both Exchanges. */
  def colocatedJoin(s: SparkSession, factTable: String, dimTable: String,
      bucketCol: String, factCols: Seq[Column], dimCols: Seq[Column])
      : DataFrame = {
    val f = s.table(factTable)
    val d = s.table(dimTable)
    f.join(d, bucketCol)
      .select((col(bucketCol) +: (factCols ++ dimCols)): _*)
  }
}
