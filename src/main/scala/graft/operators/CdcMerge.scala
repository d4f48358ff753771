package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD1 changelog merge — the batch MERGE/upsert a lakehouse ingest
  * runs to roll a CDC feed into a snapshot (the latest-wins
  * complement of ev7's SCD2 history builder; the reference's
  * ReplacingMergeTree FINAL collapse, SURVEY §2.1 S4/O4, expressed as
  * a periodic batch job instead of a merge-on-read table engine).
  *
  * Scale shape: latest-change-per-key is ONE `max_by(struct(payload),
  * struct(order))` hash aggregate — a mergeable partial that never
  * sorts, vs. the textbook `row_number() OVER (PARTITION BY key ORDER
  * BY seq DESC)` which shuffles AND per-key sorts the full changelog.
  * The apply step is a single key-equi full-outer join between the
  * (already key-partitioned) aggregate output and the snapshot — at
  * 100 TB both sides bucket by key and the join is co-located.
  */
object CdcMerge {

  /** Collapse a changelog to its latest state per key: one row per
    * `keyCol` carrying `op`/`val`/`us`/`eid` of the change with the
    * highest (usCol, idCol) — a lexicographic `max_by`, no window
    * sort. `eid` (the tiebreak id) rides along so collapsed states
    * can be re-collapsed later under the SAME total order — the
    * version column a streaming CDC apply needs. */
  def latestState(changes: DataFrame, keyCol: String, opCol: String,
      valCol: String, usCol: String, idCol: String): DataFrame =
    changes.groupBy(col(keyCol))
      .agg(max_by(
        struct(col(opCol).as("op"), col(valCol).as("val"),
          col(usCol).as("us"), col(idCol).as("eid")),
        struct(col(usCol), col(idCol))).as("_last"))
      .select(col(keyCol), col("_last.op").as("op"),
        col("_last.val").as("val"), col("_last.us").as("us"),
        col("_last.eid").as("eid"))

  /** Version-guarded reduce of collapsed states (schema of
    * [[latestState]]): latest (us, eid) wins per key. Commutative
    * and associative — applying micro-batches in ANY order or
    * grouping yields the same state, which is what makes a streaming
    * CDC apply safe under file-arrival reordering. Tombstones ('D'
    * rows) stay IN the state: dropping them would let a later-
    * arriving but older 'U' resurrect a deleted key. */
  def reduceStates(states: DataFrame, keyCol: String): DataFrame =
    latestState(states, keyCol, "op", "val", "us", "eid")

  /** Apply a collapsed changelog (`keyCol`, op ∈ {'U','D'}, val, us)
    * to a snapshot (`keyCol`, val, us). Latest-wins semantics: a 'D'
    * removes the key (a 'D' on an absent key is a no-op), a 'U'
    * upserts, untouched snapshot rows pass through. `status` labels
    * the outcome (kept / updated / inserted). */
  def merge(snapshot: DataFrame, latestChanges: DataFrame,
      keyCol: String): DataFrame = {
    // explicit presence flag: snapshot columns (val/us) may
    // legitimately be null, so null-ness of a payload column cannot
    // stand in for "the key existed in the snapshot"
    val s = snapshot.withColumn("_s_present", lit(true)).as("s")
    val c = latestChanges.as("c")
    s.join(c, Seq(keyCol), "full_outer")
      // null-safe: keep rows with no change (op null) or an upsert
      .filter(col("c.op").isNull || col("c.op") === "U")
      .select(col(keyCol),
        when(col("c.op") === "U", col("c.val")).otherwise(col("s.val"))
          .as("val"),
        when(col("c.op") === "U", col("c.us")).otherwise(col("s.us"))
          .as("last_us"),
        when(col("c.op").isNull, "kept")
          .when(col("_s_present").isNull, "inserted")
          .otherwise("updated").as("status"))
  }
}
