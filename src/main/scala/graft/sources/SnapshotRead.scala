package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, timestamp_micros}

/** ONE composable snapshot read planner — the entry point a 100 TB
  * user expects instead of four parallel ones (`read` / `readPruned`
  * / `readEvolved` / `BloomIndex.lookup`, which did not compose: a
  * range predicate against a partition-evolved table got no stats
  * pruning, and a Bloom point lookup was blind to evolved layouts).
  *
  * The plan applies, in order:
  *   1. version resolution — explicit version, `TIMESTAMP AS OF`
  *      (manifest-carried publication instants), or a named tag;
  *   2. manifest min/max stats pruning for a range predicate
  *      (`v<N>.stats` sidecar — driver-side, file-count-sized, no
  *      IO; files without stats lines are conservatively kept);
  *   3. per-file Bloom skipping for a point predicate (`v<N>.bloom.*`
  *      sidecar) — probed only on the stats survivors, never on
  *      files min/max already excluded;
  *   4. the spec-aware evolved read: every surviving file resolves
  *      against the partition spec ITS commit was written with
  *      (Iceberg's read contract under partition evolution);
  *   5. the row-level predicates on top (sidecars bound FILES, they
  *      never filter rows).
  *
  * Both predicates address DATA columns; a column that is a partition
  * directory in some commit's layout still surfaces (readEvolved
  * recovers it as a string) but carries no sidecar lines there.
  * Returns the pruning ledger alongside the frame so callers (and the
  * plan audit) can pin skipped-file counts from BOTH sidecars. */
object SnapshotRead {

  /** The planned scan: `df` is the final filtered frame; the counts
    * are the per-layer pruning ledger (`filesTotal` ≥ afterStats ≥
    * afterBloom). */
  final case class ScanPlan(version: Int, filesTotal: Int,
      filesAfterStats: Int, filesAfterBloom: Int, df: DataFrame) {
    def statsSkipped: Int = filesTotal - filesAfterStats
    def bloomSkipped: Int = filesAfterStats - filesAfterBloom
  }

  /** Plan a snapshot read. At most one of `version` / `asOfMillis` /
    * `tag` may be given (default: latest). `range` = (statCol, lo,
    * hi) enables stats pruning + the row filter `lo <= c <= hi`;
    * `ranges` adds FURTHER range predicates (per-column typed stats
    * sidecars prune on every indexed column at once — Iceberg-style
    * per-column bounds); `strRanges` = (col, lo, hi) STRING bounds,
    * pruned against `str`-kind sidecar lines with the same byte-wise
    * unsigned UTF8String ordering the SQL face uses (Spark's string
    * order — what min/max computed when the sidecar was built);
    * `point` = (keyCol, key) enables Bloom skipping + the row filter
    * `c = key`. All together express their conjunction. A range on a
    * `ts`-kind column takes epoch-MICROS bounds (the sidecar's
    * storage domain) and filters rows through `timestamp_micros`. */
  def plan(spark: SparkSession, root: String,
      version: Option[Int] = None,
      asOfMillis: Option[Long] = None,
      tag: Option[String] = None,
      range: Option[(String, Long, Long)] = None,
      point: Option[(String, Long)] = None,
      ranges: Seq[(String, Long, Long)] = Nil,
      strRanges: Seq[(String, String, String)] = Nil): ScanPlan = {
    require(Seq(version, asOfMillis, tag).count(_.isDefined) <= 1,
      "give at most one of version / asOfMillis / tag")
    val v = version
      .orElse(asOfMillis.map(SnapshotStore.versionAsOf(root, _)))
      .orElse(tag.map(t => SnapshotStore.tags(root).getOrElse(t,
        throw new graft.QueryError(s"unknown tag: $t"))))
      .getOrElse(SnapshotStore.latestVersion(root))
    val all = SnapshotStore.filesAt(root, v)
    val kinds = SnapshotStore.statCols(root, v)
    val allRanges = range.toSeq ++ ranges
    // stats pruning applies ONLY when a range's column IS one the
    // sidecar indexes (the manifest's #statcol header) — bounds of
    // a different column would prune files that still hold matching
    // rows, silently dropping them. A range on any other column keeps
    // every file (the row filter below still applies), mirroring the
    // SQL catalog's conservative contract.
    val afterLong = allRanges.foldLeft(all) {
      case (fs, (c, lo, hi))
          if kinds.get(c).exists(k => k == "long" || k == "ts") =>
        val stats = SnapshotStore.boundsFor(root, v, c)
        fs.filter(f => stats.get(f).forall { case (mn, mx) =>
          mx >= lo && mn <= hi })
      case (fs, _) => fs
    }
    // str-kind bounds prune with byte-wise unsigned UTF8String order —
    // same identity guard: only a column the header names as `str`
    // prunes, anything else keeps every file
    val afterStats = strRanges.foldLeft(afterLong) {
      case (fs, (c, lo, hi)) if kinds.get(c).contains("str") =>
        import org.apache.spark.unsafe.types.UTF8String
        val stats = SnapshotStore.strBoundsFor(root, v, c)
        val (loU, hiU) = (UTF8String.fromString(lo), UTF8String.fromString(hi))
        fs.filter(f => stats.get(f).forall { case (mn, mx) =>
          UTF8String.fromString(mx).compareTo(loU) >= 0 &&
            UTF8String.fromString(mn).compareTo(hiU) <= 0 })
      case (fs, _) => fs
    }
    val afterBloom = point match {
      case Some((keyCol, key)) =>
        BloomIndex.survivorsAmong(root, keyCol, key, v, afterStats)
      case None => afterStats
    }
    val base =
      if (afterBloom.nonEmpty)
        SnapshotStore.readFilesEvolved(spark, root, afterBloom)
      else if (all.nonEmpty)
        // schema-preserving empty frame when every file was skipped
        SnapshotStore.readFilesEvolved(spark, root, all).limit(0)
      else throw new graft.QueryError(s"version $v of $root lists no files")
    def rangeFilter(c: String, lo: Long, hi: Long) =
      if (kinds.get(c).contains("ts"))
        col(c) >= timestamp_micros(lit(lo)) &&
          col(c) <= timestamp_micros(lit(hi))
      else col(c) >= lo && col(c) <= hi
    val filtered = (
      allRanges.map { case (c, lo, hi) => rangeFilter(c, lo, hi) } ++
      strRanges.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi } ++
      point.map { case (c, k) => col(c) === k })
      .foldLeft(base)(_.filter(_))
    ScanPlan(v, all.size, afterStats.size, afterBloom.size, filtered)
  }

  /** The frame alone, for callers that don't need the ledger. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None,
      asOfMillis: Option[Long] = None,
      tag: Option[String] = None,
      range: Option[(String, Long, Long)] = None,
      point: Option[(String, Long)] = None,
      ranges: Seq[(String, Long, Long)] = Nil,
      strRanges: Seq[(String, String, String)] = Nil): DataFrame =
    plan(spark, root, version, asOfMillis, tag, range, point, ranges,
      strRanges).df
}
