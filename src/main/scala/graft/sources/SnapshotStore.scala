package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, max, max_by, min, not, struct, unix_micros}

/** Manifest-based snapshot isolation over plain parquet — the
  * time-travel core of a lakehouse table format (Delta/Iceberg's
  * essential mechanism) built from two primitives Spark already has:
  * immutable data files and an explicit file list per version.
  *
  *  - data files live under `<root>/data/c<N>-<token>/part-*.parquet`
  *    (token commit-unique) and are NEVER mutated or deleted by a
  *    commit;
  *  - version N's manifest `<root>/_manifests/v<N>.list` is the
  *    newline-separated list of data files visible at N, written with
  *    a tmp-file + atomic-rename so a reader can never observe a
  *    half-written manifest;
  *  - a reader resolves a version (or the latest) to its file list
  *    and hands EXACTLY those paths to the parquet scan — old
  *    versions stay readable after any later commit, and a compaction
  *    (replace-commit of the same logical rows) changes no reader's
  *    result at any version.
  *
  * Commit kinds: [[commitAppend]] (new manifest = previous files +
  * the new write's files) and [[commitReplace]] (new manifest = only
  * the new write's files — full-table rewrite/compaction). At 100 TB
  * the manifest is file-count-sized (KBs per commit), the data path
  * is ordinary distributed parquet IO, and version resolution is
  * driver-side metadata — the same asymmetry the real table formats
  * rely on.
  *
  * Concurrency: optimistic, Iceberg-style. Data files are written
  * FIRST under a commit-unique directory (never colliding), and the
  * versioned manifest is published LAST via an atomic
  * create-fail-if-exists (hard link) — the single serialization
  * point. Two committers that both read version N race to publish
  * N+1; exactly one link creation succeeds, the loser gets a
  * retryable [[CommitConflictException]] and must re-read the new
  * latest and re-resolve (its orphaned data directory is unreferenced
  * by any manifest — ordinary orphan-file maintenance, the price
  * every optimistic table format pays). Without the CAS a silent
  * manifest overwrite LOSES the first commit — unacceptable at any
  * scale, catastrophic at 100 TB. */
object SnapshotStore {

  /** A concurrent committer published this version first. Retryable:
    * re-read [[latestVersion]], re-resolve the base file set, commit
    * again. Part of the [[graft.GraftException]] hierarchy — the one
    * subtype a caller should catch-and-retry rather than propagate. */
  final class CommitConflictException(root: String, version: Int)
    extends graft.GraftException(
      s"version $version under $root was committed concurrently; " +
        "re-read the latest version and retry")

  private def manifestDir(root: String) = new File(root, "_manifests")

  private def manifestFile(root: String, v: Int) =
    new File(manifestDir(root), s"v$v.list")

  /** Highest committed version, 0 when none. */
  def latestVersion(root: String): Int = {
    val d = manifestDir(root)
    if (!d.isDirectory) 0
    else
      d.listFiles().map(_.getName)
        .collect { case s if s.matches("v\\d+\\.list") =>
          s.stripPrefix("v").stripSuffix(".list").toInt }
        .foldLeft(0)(math.max)
  }

  private def manifestLines(root: String, v: Int): Seq[String] = {
    val f = manifestFile(root, v)
    if (!f.isFile)
      throw new graft.QueryError(s"no manifest for version $v under $root")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private[graft] def filesAt(root: String, v: Int): Seq[String] =
    manifestLines(root, v).filterNot(_.startsWith("#"))

  /** Commit metadata carried INSIDE the manifest as `#key<TAB>value`
    * header lines — durable table metadata, unlike filesystem mtimes
    * (a backup/restore or `cp -r` rewrites every mtime; Iceberg/Delta
    * store the commit instant in the snapshot metadata for exactly
    * this reason). Keys in use: `ts` (publication instant, epoch-ms)
    * and `writer` (streaming idempotence token, see
    * [[committedVersionFor]]). Legacy manifests without headers
    * return an empty map and fall back to mtime-era behavior. */
  private[graft] def manifestMeta(root: String, v: Int)
      : Map[String, String] =
    manifestLines(root, v).filter(_.startsWith("#"))
      .flatMap { l =>
        l.drop(1).split("\t", 2) match {
          case Array(k, value) => Some(k -> value)
          case _ => None
        }
      }.toMap

  /** Publish version `v`'s manifest — the commit's serialization
    * point. `Files.createLink` is atomic create-fail-if-exists (an
    * ATOMIC_MOVE rename would silently OVERWRITE an existing v<N>
    * manifest on POSIX, losing the concurrent commit), so exactly one
    * of two racing committers wins; the loser's tmp file is removed
    * and [[CommitConflictException]] tells it to retry. Every commit
    * stamps its publication instant (`#ts`) into the content so time
    * travel survives mtime loss; `meta` adds further header lines
    * (e.g. the streaming writer token). */
  private[graft] def writeManifest(root: String, v: Int,
      files: Seq[String], meta: Map[String, String] = Map.empty): Unit = {
    val dir = manifestDir(root)
    dir.mkdirs()
    val withTs =
      if (meta.contains("ts")) meta
      else meta + ("ts" -> System.currentTimeMillis().toString)
    val header = withTs.toSeq.sortBy(_._1)
      .map { case (k, value) => s"#$k\t$value" }
    val tmp = Paths.get(dir.getPath, s".v$v.list.tmp-${commitToken()}")
    Files.write(tmp,
      (header ++ files).mkString("\n").getBytes(StandardCharsets.UTF_8))
    try Files.createLink(manifestFile(root, v).toPath, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(root, v)
    } finally Files.deleteIfExists(tmp)
    // after the link succeeded (and only then), record the writer
    // token in the append-only token log — see [[committedVersionFor]]
    withTs.get("writer").foreach { tok =>
      Files.write(tokensLogFile(root).toPath,
        s"$tok\t$v\n".getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  private def tokensLogFile(root: String) =
    new File(manifestDir(root), "tokens.log")

  /** Every writer token ever committed, token → version (latest
    * wins). The log is append-only and — unlike the manifests that
    * also carry the token — SURVIVES [[expireVersions]], closing the
    * fail-open replay window: without it, a vacuum that expires the
    * manifest of a still-replay-eligible micro-batch would make the
    * crash-replayed batch find no token and double-commit. Log size
    * is one short line per tokened commit — manifest-count-scale
    * metadata, read driver-side. */
  private def tokenLog(root: String): Map[String, Int] = {
    val f = tokensLogFile(root)
    if (!f.isFile) Map.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap { l =>
        l.split("\t") match {
          case Array(tok, v) => Some(tok -> v.toInt)
          case _ => None
        }
      }.toMap
  }

  /** The live version whose manifest carries `writer == token`, if
    * any — the replay check behind batchId-idempotent streaming
    * commits. Structured Streaming re-delivers the last uncommitted
    * micro-batch after a crash with the SAME batchId; a commit made
    * with that token already in a live manifest must be a no-op
    * (otherwise the replayed batch double-commits its rows — the
    * [[graft.streaming.BatchSink]] contract, applied to the snapshot
    * store). All live headers are scanned (newest first) rather than
    * just the head: a foreachBatch body may compact or vacuum AFTER
    * its append, so the token's manifest need not be the head. The
    * append-only [[tokenLog]] backstops the manifests: it survives
    * [[expireVersions]], so a token whose manifest was vacuumed away
    * is STILL recognized and the replayed batch still no-ops — replay
    * safety no longer depends on retention settings.
    * Driver-side metadata work, manifest-count-sized; vacuum bounds
    * the manifest count in long-running loops, and a replayed batch
    * is always among the most recent commits. */
  private[graft] def committedVersionFor(root: String, token: String)
      : Option[Int] =
    versions(root).reverse.find(v =>
      manifestMeta(root, v).get("writer").contains(token))
      .orElse(tokenLog(root).get(token))

  /** Header keys that travel from a version to its successor the same
    * way stats sidecar lines do: `statcol` (which columns the stats
    * sidecar indexes — the SQL face's pushdown pruning keeps working
    * after later appends carry the stats forward) and `spec` (the
    * table's DEFAULT partition spec for future writes — the knob
    * `CREATE TABLE ... PARTITIONED BY` sets and `CALL
    * system.set_spec` evolves; committed layouts are untouched by
    * either, exactly Iceberg's spec evolution). */
  private def carriedMeta(root: String, prev: Int): Map[String, String] =
    if (prev == 0) Map.empty
    else manifestMeta(root, prev).filter { case (k, _) =>
      k == "statcol" || k == "spec" }

  /** The table's default partition spec for NEW writes — the `#spec`
    * header of the latest manifest (empty = unpartitioned appends).
    * Purely a forward-looking default: readers resolve every file
    * against the spec its own commit recorded. */
  def currentSpec(root: String): Seq[String] = {
    val v = latestVersion(root)
    if (v == 0) Seq.empty
    else manifestMeta(root, v).get("spec").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  }

  /** Evolve the table's DEFAULT partition spec — a METADATA-ONLY
    * commit: the new version lists the same files, every committed
    * layout stays exactly as written (spec-per-commit is the whole
    * point — nothing rewrites), and only writes AFTER this commit
    * land under the new spec. Empty `spec` = future writes are
    * unpartitioned. Same CAS publish as every commit. */
  def setSpec(root: String, spec: Seq[String]): Int = {
    val prev = latestVersion(root)
    if (prev == 0)
      throw new graft.QueryError(s"no snapshot table under $root")
    // validate against the pinned schema when one exists — a typo'd
    // column should refuse HERE, not at the next insert's partitionBy
    // (an evolved store without a pin defers to that loud failure)
    manifestMeta(root, prev).get("schema")
      .map(org.apache.spark.sql.types.StructType.fromDDL)
      .foreach { pinned =>
        spec.find(c => !pinned.fieldNames.contains(c)).foreach(c =>
          throw new graft.QueryError(
            s"partition column $c is not in the table schema"))
      }
    val meta = carriedMeta(root, prev) - "spec"
    val withSpec =
      if (spec.isEmpty) meta
      else meta + ("spec" -> spec.mkString(","))
    val v = prev + 1
    writeManifest(root, v, filesAt(root, prev),
      withSpec ++ manifestMeta(root, prev).filter(_._1 == "schema"))
    val prior = statsLinesAt(root, prev)
    if (prior.nonEmpty) writeStatsLines(root, v, prior)
    v
  }

  /** The `#schema` header for a commit that adds `df`'s rows on top of
    * version `prev` — the table schema PINNED in manifest metadata so
    * the SQL face's `loadTable` never has to infer it from data-file
    * footers (plan-time IO proportional to the table at 100 TB file
    * counts). The pinned schema is the MERGE of the previous pinned
    * schema with the incoming frame's (schema evolution widens the
    * union; a same-schema append is a no-op merge). A legacy store
    * whose previous version carries no header stays header-less —
    * only footer inference can know the union of its historic commits
    * — and upgrades at its next replace-shaped commit. An
    * un-mergeable evolution (a column changing to an incompatible
    * type) also drops the header: readers fall back to footer
    * inference, never to a wrong pinned schema. */
  private def mergedSchemaMeta(df: DataFrame, root: String, prev: Int)
      : Map[String, String] =
    mergedSchemaMetaOf(df.schema, root, prev)

  private def mergedSchemaMetaOf(
      schema: org.apache.spark.sql.types.StructType, root: String,
      prev: Int): Map[String, String] = {
    import org.apache.spark.sql.types.StructType
    val merged: Option[StructType] =
      if (prev == 0) Some(schema)
      else manifestMeta(root, prev).get("schema").flatMap { ddl =>
        try Some(graft.util.SchemaMerge.merge(StructType.fromDDL(ddl), schema))
        catch { case _: Exception => None }
      }
    merged.map(m => "schema" -> m.toDDL).toMap
  }

  /** `#schema` for a replace-shaped commit (full rewrite / MERGE):
    * the table IS the incoming frame, so its schema pins directly. */
  private def replaceSchemaMeta(df: DataFrame): Map[String, String] =
    Map("schema" -> df.schema.toDDL)

  /** Which columns version `v`'s stats sidecar indexes, as
    * column → kind, parsed from the manifest's `#statcol` header.
    * Header grammar: a comma-separated list of `name:kind` entries;
    * a bare `name` (every manifest written before typed stats) is the
    * legacy single Long column. Kinds in use: `long` (integral) and
    * `ts` (timestamp, bounds stored as epoch-micros). EVERY consumer
    * of the sidecar must resolve the pruned column through this map —
    * pruning against bounds that index a DIFFERENT column silently
    * drops rows, the one failure mode a reader can never have. */
  private[graft] def statCols(root: String, v: Int)
      : scala.collection.immutable.ListMap[String, String] =
    manifestMeta(root, v).get("statcol") match {
      case None => scala.collection.immutable.ListMap.empty
      case Some(h) =>
        scala.collection.immutable.ListMap(
          h.split(",").toSeq.filter(_.nonEmpty).map { e =>
            e.split(":", 2) match {
              case Array(n, k) => n -> k
              case Array(n) => n -> "long"
            }
          }: _*)
    }

  /** Commit-unique suffix so two optimistic committers never collide
    * on a data directory (the loser's dir becomes an orphan, cleaned
    * by maintenance — never by a commit). */
  private def commitToken(): String =
    java.util.UUID.randomUUID().toString.take(8)

  private[graft] def writeData(df: DataFrame, root: String, v: Int)
      : Seq[String] = {
    val dir = new File(new File(root, "data"), s"c$v-${commitToken()}")
    df.write.parquet(dir.getPath)
    // per-commit schema marker (DDL): lets the SQL face resolve a
    // layout group's schema without opening any data-file footer
    Files.write(new File(dir, "_schema.ddl").toPath,
      df.schema.toDDL.getBytes(StandardCharsets.UTF_8))
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq.sorted
  }

  /** Append commit: the new version sees every previous file plus the
    * incoming frame's files. Returns the new version number.
    *
    * `writerToken` is the streaming-replay idempotence key (use
    * `"<queryName>:<batchId>"` from a foreachBatch body): when a live
    * manifest already carries it, the frame was committed by a
    * previous delivery of the same micro-batch and this call returns
    * that version WITHOUT writing — exactly-once into the store under
    * Structured Streaming's at-least-once foreachBatch re-delivery.
    *
    * Index maintenance: when the store carries a `#statcol` index and
    * `freshStats` is on (the default), the fresh files' typed bounds
    * are recorded in the same commit — without this, every append
    * (each SQL INSERT, each streaming micro-batch) dilutes the
    * skipping index with unindexed files until a full re-cluster, and
    * range queries degrade linearly with ingest age. Iceberg records
    * per-file bounds on EVERY write for exactly this reason (from
    * parquet footers — same numbers; here it is one bounded-output
    * aggregate pass over the fresh files). Indexed columns the frame
    * lacks (or whose type no longer matches the recorded kind) simply
    * get no lines — conservative, never wrong. `freshStats = false`
    * preserves the legacy stats-less append (tests of the
    * conservative keep path use it). */
  def commitAppend(df: DataFrame, root: String,
      writerToken: Option[String] = None,
      freshStats: Boolean = true): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val prev = latestVersion(root)
      val v = prev + 1
      val fresh = writeData(df, root, v)
      val base = if (prev == 0) Seq.empty else filesAt(root, prev)
      writeManifest(root, v, base ++ fresh,
        carriedMeta(root, prev) ++ mergedSchemaMeta(df, root, prev) ++
          writerToken.map("writer" -> _).toMap)
      // stats travel with their surviving files; fresh files are
      // indexed in place when the store carries an index (above)
      val prior = statsLinesAt(root, prev)
      val freshLines =
        if (!freshStats || prev == 0) Seq.empty
        else statsForFiles(df.sparkSession, fresh,
          usableKinds(df, statCols(root, prev)))
      if (prior.nonEmpty || freshLines.nonEmpty)
        writeStatsLines(root, v, prior ++ freshLines)
      v
    }

  /** The `#statcol` entries a frame can honestly produce bounds for:
    * the column must exist in the frame AND derive the SAME kind the
    * header records — bounds in a different domain would prune
    * wrongly, the one failure mode a reader can never have. */
  private def usableKinds(df: DataFrame,
      kinds: scala.collection.immutable.ListMap[String, String])
      : Seq[(String, String)] = usableKindsOf(df.schema, kinds)

  private def usableKindsOf(schema: org.apache.spark.sql.types.StructType,
      kinds: scala.collection.immutable.ListMap[String, String])
      : Seq[(String, String)] =
    kinds.toSeq.filter { case (c, k) =>
      schema.fieldNames.contains(c) &&
        (try kindOfType(schema(c).dataType) == k
         catch { case _: graft.QueryError => false })
    }

  /** Replace commit (full rewrite / compaction): the new version sees
    * ONLY the incoming frame's files; older versions keep reading the
    * files they always listed. Returns the new version number.
    * `writerToken` as in [[commitAppend]]. */
  def commitReplace(df: DataFrame, root: String,
      writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val v = latestVersion(root) + 1
      writeManifest(root, v, writeData(df, root, v),
        replaceSchemaMeta(df) ++ writerToken.map("writer" -> _).toMap)
      v
    }

  /** Create an EMPTY versioned table: version 1 lists no files and
    * pins the schema in the `#schema` header — the commit CREATE
    * TABLE (SQL or Scala) publishes before any data arrives, so
    * readers and the catalog resolve the table immediately and the
    * first INSERT is an ordinary append commit. A non-empty `spec`
    * records the DEFAULT partition spec for future writes (`CREATE
    * TABLE ... PARTITIONED BY`); it must name schema columns. */
  def createEmpty(root: String,
      schema: org.apache.spark.sql.types.StructType,
      spec: Seq[String] = Seq.empty): Int = {
    require(versions(root).isEmpty, s"table already exists under $root")
    spec.find(c => !schema.fieldNames.contains(c)).foreach(c =>
      throw new graft.QueryError(
        s"partition column $c is not in the table schema"))
    writeManifest(root, 1, Seq.empty, Map("schema" -> schema.toDDL) ++
      (if (spec.isEmpty) Map.empty[String, String]
       else Map("spec" -> spec.mkString(","))))
    1
  }

  /** Append commit over files a DISTRIBUTED WRITER already staged
    * under `<root>/data` — the driver half of the streaming sink
    * ([[SnapshotStreaming]]): tasks write their parquet files first
    * (never colliding — task-attempt-unique names), this publishes
    * the manifest listing them, under the same CAS and the same
    * writer-token replay check as every commit. A replayed epoch
    * whose token is already live no-ops and its re-staged files
    * become ordinary orphans (swept by maintenance, like CAS losers).
    * On an indexed store the staged files' bounds are recorded in the
    * same commit (append-time index maintenance). */
  private[sources] def commitStagedAppend(spark: SparkSession,
      root: String, staged: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      writerToken: Option[String]): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val prev = latestVersion(root)
      val v = prev + 1
      val base = if (prev == 0) Seq.empty else filesAt(root, prev)
      writeManifest(root, v, base ++ staged,
        carriedMeta(root, prev) ++ mergedSchemaMetaOf(schema, root, prev) ++
          writerToken.map("writer" -> _).toMap)
      val prior = statsLinesAt(root, prev)
      val freshLines =
        if (prev == 0) Seq.empty
        else statsForFiles(spark, staged,
          usableKindsOf(schema, statCols(root, prev)))
      if (prior.nonEmpty || freshLines.nonEmpty)
        writeStatsLines(root, v, prior ++ freshLines)
      v
    }

  /** Replace commit over staged files — the streaming sink's
    * COMPLETE-mode epoch and the row-level rewrites' publish. Carried
    * headers (`statcol`, `spec`) survive: an UPDATE/MERGE replaces
    * DATA, not table metadata — without the carry a row-level
    * statement would silently un-partition future writes.
    *
    * `expectedPrev` is the optimistic-concurrency guard for callers
    * whose replacement was COMPUTED against a pinned base (the
    * row-level scan): when another commit landed in between, this
    * replace would erase its rows — refuse with the retryable
    * [[CommitConflictException]] instead of silently winning. The
    * streaming complete-mode caller passes None (its epochs replace
    * serially from one writer — the MV pattern). */
  private[graft] def commitStagedReplace(root: String,
      staged: Seq[String], schema: org.apache.spark.sql.types.StructType,
      writerToken: Option[String],
      expectedPrev: Option[Int] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val prev = latestVersion(root)
      if (expectedPrev.exists(_ != prev))
        throw new CommitConflictException(root, prev + 1)
      val v = prev + 1
      writeManifest(root, v, staged,
        carriedMeta(root, prev) ++ Map("schema" -> schema.toDDL) ++
          writerToken.map("writer" -> _).toMap)
      v
    }

  /** `ALTER TABLE ADD COLUMN` — a METADATA-ONLY commit: the new
    * version lists the SAME files as its predecessor and widens the
    * pinned `#schema` header through the same [[graft.util.SchemaMerge]]
    * appends use, so existing files read the added column as NULL (the
    * merge marks it nullable) and the next INSERT may populate it.
    * Zero data IO at any table size — additive DDL on a 100 TB table
    * is a manifest write. Refuses loudly when the column already
    * exists, and on a legacy store that pins no `#schema` (the union
    * of its historic commits is unknowable without footer IO — publish
    * one replace-shaped commit first). Stats sidecar lines carry: the
    * files are unchanged, so their bounds still hold. Same CAS
    * publish as every commit. Returns the new version. */
  def addColumns(root: String,
      cols: Seq[org.apache.spark.sql.types.StructField]): Int = {
    import org.apache.spark.sql.types.StructType
    require(cols.nonEmpty, "ADD COLUMN needs at least one column")
    val prev = latestVersion(root)
    if (prev == 0)
      throw new graft.QueryError(s"no snapshot table under $root")
    val pinned = manifestMeta(root, prev).get("schema")
      .map(StructType.fromDDL).getOrElse(throw new graft.QueryError(
        s"cannot ADD COLUMN under $root: version $prev pins no #schema " +
          "header (legacy store) — publish one replace-shaped commit first"))
    cols.find(c => pinned.fieldNames.contains(c.name)).foreach(c =>
      throw new graft.QueryError(
        s"cannot ADD COLUMN ${c.name}: it already exists in $root"))
    val widened = graft.util.SchemaMerge.merge(pinned,
      StructType(cols.map(_.copy(nullable = true))))
    val v = prev + 1
    writeManifest(root, v, filesAt(root, prev),
      carriedMeta(root, prev) + ("schema" -> widened.toDDL))
    val prior = statsLinesAt(root, prev)
    if (prior.nonEmpty) writeStatsLines(root, v, prior)
    v
  }

  /** Snapshot read at a version (defaults to latest). */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(root))
    spark.read.parquet(filesAt(root, v): _*)
  }

  // ---- time travel by timestamp (AS OF) ----

  /** A manifest's publication instant: the `#ts` header the commit
    * wrote into the manifest CONTENT (durable — survives
    * backup/restore, `cp -r`, coarse-mtime filesystems), falling back
    * to the file mtime only for legacy manifests written before
    * headers existed. */
  private def publishedAt(root: String, v: Int): Long =
    manifestMeta(root, v).get("ts").map(_.toLong)
      .getOrElse(manifestFile(root, v).lastModified())

  /** Version visible at `tsMillis`: the HIGHEST version whose
    * manifest was published at or before that instant (publication
    * time = the `#ts` instant the commit stamped into the manifest at
    * its serialization point; mtime only for legacy manifests). Ties
    * (same-millisecond publications) resolve to the later version,
    * matching "the state a reader at that wall-clock instant would
    * have seen". Throws the typed [[graft.QueryError]] when the table
    * did not exist yet. */
  def versionAsOf(root: String, tsMillis: Long): Int = {
    val vs = versions(root).filter(publishedAt(root, _) <= tsMillis)
    if (vs.isEmpty)
      throw new graft.QueryError(
        s"no snapshot of $root existed at epoch-ms $tsMillis")
    vs.max
  }

  /** SELECT ... AS OF <timestamp>. */
  def readAsOf(spark: SparkSession, root: String,
      tsMillis: Long): DataFrame =
    read(spark, root, Some(versionAsOf(root, tsMillis)))

  /** Test/maintenance hook: pin a manifest's publication instant so
    * time-travel reads are deterministic under test (two commits can
    * otherwise land in the same millisecond). Rewrites the `#ts`
    * header IN the manifest content — the instant versionAsOf
    * resolves from — via tmp + atomic replace (a maintenance
    * overwrite of an already-published manifest, not a commit race,
    * so ATOMIC_MOVE is correct here). */
  private[graft] def stampManifest(root: String, v: Int,
      tsMillis: Long): Unit = {
    val meta = manifestMeta(root, v) + ("ts" -> tsMillis.toString)
    val header = meta.toSeq.sortBy(_._1)
      .map { case (k, value) => s"#$k\t$value" }
    val tmp = Paths.get(manifestDir(root).getPath,
      s".v$v.list.stamp-${commitToken()}")
    Files.write(tmp, (header ++ filesAt(root, v))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile(root, v).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- partition evolution (Iceberg-style spec-per-commit) ----

  /** Append commit written under a PARTITION SPEC — the layout knob
    * a long-lived table re-tunes as it grows (month-only early, then
    * (month, underlying) once a month's volume outgrows one prune
    * unit). The spec applies to THIS commit's files only; earlier
    * commits keep their own layout — Iceberg's partition-spec
    * evolution, where old files are NEVER rewritten to the new spec
    * (rewriting 100 TB to re-bucket it is exactly what spec-per-
    * commit avoids). The spec is recorded in a `_spec.list` marker
    * inside the commit directory (self-describing — no shared
    * mutable metadata file to race on), and the manifest lists the
    * leaf parquet files as usual, so every other store operation
    * (expire, tags, diff, stats carry) works unchanged. */
  def commitAppendPartitioned(df: DataFrame, root: String,
      spec: Seq[String], writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      require(spec.nonEmpty, "partition spec must name at least one column")
      val prev = latestVersion(root)
      val v = prev + 1
      val dir = new File(new File(root, "data"), s"c$v-${commitToken()}")
      df.write.partitionBy(spec: _*).parquet(dir.getPath)
      Files.write(new File(dir, "_spec.list").toPath,
        spec.mkString("\n").getBytes(StandardCharsets.UTF_8))
      // full frame schema (partition columns included) — the SQL
      // face's zero-IO schema source for this layout group
      Files.write(new File(dir, "_schema.ddl").toPath,
        df.schema.toDDL.getBytes(StandardCharsets.UTF_8))
      val fresh = leafParquet(dir)
      val base = if (prev == 0) Seq.empty else filesAt(root, prev)
      writeManifest(root, v, base ++ fresh,
        carriedMeta(root, prev) ++ writerToken.map("writer" -> _).toMap)
      val prior = statsLinesAt(root, prev)
      if (prior.nonEmpty) writeStatsLines(root, v, prior)
      v
    }

  /** REPLACE commit under a partition spec — `INSERT OVERWRITE` on a
    * spec'd table: the new version lists ONLY the fresh partitioned
    * files; older versions keep reading theirs. Spec/statcol headers
    * carry (the overwrite re-tunes data, not table metadata). */
  def commitReplacePartitioned(df: DataFrame, root: String,
      spec: Seq[String], writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      require(spec.nonEmpty, "partition spec must name at least one column")
      val prev = latestVersion(root)
      val v = prev + 1
      val dir = new File(new File(root, "data"), s"c$v-${commitToken()}")
      df.write.partitionBy(spec: _*).parquet(dir.getPath)
      Files.write(new File(dir, "_spec.list").toPath,
        spec.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.write(new File(dir, "_schema.ddl").toPath,
        df.schema.toDDL.getBytes(StandardCharsets.UTF_8))
      writeManifest(root, v, leafParquet(dir),
        carriedMeta(root, prev) ++ writerToken.map("writer" -> _).toMap)
      v
    }

  private def leafParquet(dir: File): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def rec(f: File): Unit =
      if (f.isDirectory) f.listFiles().foreach(rec)
      else if (f.getName.endsWith(".parquet")) buf += f.getPath
    rec(dir)
    buf.toSeq.sorted
  }

  /** Layout-aware snapshot read: manifest files are grouped by their
    * commit directory and each group is read under its OWN basePath,
    * so Hive-style partition directories resolve against the spec
    * the commit was written with; groups union BY NAME (a column is
    * data in one layout and a partition directory in another — both
    * reads surface it). Filters on a partition column prune
    * directories in the commits that partition by it and fall back
    * to row filters in the ones that don't — the exact Iceberg
    * read-side contract. Partition values are recovered as strings
    * (no type inference) so the layout never changes a column's
    * type; reads cast explicitly where needed. */
  def readEvolved(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    readFilesEvolved(spark, root,
      filesAt(root, version.getOrElse(latestVersion(root))))

  /** [[readEvolved]] over an explicit file subset — the composable
    * piece [[SnapshotRead]] stacks under stats/Bloom pruning: a
    * pruned file list still resolves each survivor against the
    * partition spec its commit was written with. */
  private[sources] def readFilesEvolved(spark: SparkSession,
      root: String, files: Seq[String]): DataFrame = {
    val dataDir = new File(root, "data").getCanonicalFile
    val groups = files.groupBy { p =>
      var f = new File(p).getCanonicalFile
      while (f.getParentFile != null && f.getParentFile != dataDir)
        f = f.getParentFile
      f.getName
    }
    // the no-type-inference setting lives on a CLONED session (own
    // sessionState, shared SparkContext), so a concurrent query on the
    // caller's session can never observe the flipped value or race a
    // try/finally restore. The clone starts from builder-time defaults,
    // so the caller's RUNTIME conf (ANSI mode, timezone, registered
    // catalogs set via spark.conf.set after startup) is carried over
    // explicitly — otherwise an evolved read silently runs under stale
    // configuration. Static/immutable entries are skipped.
    val reader = spark.newSession()
    spark.conf.getAll.foreach { case (k, value) =>
      if (reader.conf.isModifiable(k) &&
          !reader.conf.getOption(k).contains(value))
        reader.conf.set(k, value)
    }
    reader.conf
      .set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    groups.toSeq.sortBy(_._1)
      .map { case (cdir, fs) =>
        reader.read
          .option("basePath", new File(dataDir, cdir).getPath)
          .parquet(fs.sorted: _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Incremental small-file compaction — the real-world OPTIMIZE:
    * data files below `minBytes` are read, merged into `targetFiles`
    * fresh files, and the new manifest lists the merged output PLUS
    * the untouched large files, carried over by path (NOT rewritten —
    * at 100 TB, re-copying the healthy gigabyte files is exactly the
    * cost incremental compaction exists to avoid). Nothing is
    * deleted, so every older version (and every tag) keeps reading
    * its original files. Stats lines survive for carried-over files,
    * and on an indexed store the MERGED files are re-indexed in the
    * same commit (one bounded aggregate — OPTIMIZE must not dilute
    * the skipping index). No-op (returns
    * the current version) when nothing is small enough.
    * Returns (version, nSmallMerged, nCarried). */
  def compactSmall(spark: SparkSession, root: String, minBytes: Long,
      targetFiles: Int = 1): (Int, Int, Int) = {
    val prev = latestVersion(root)
    val files = filesAt(root, prev)
    val (small, big) =
      files.partition(f => new File(f).length() < minBytes)
    if (small.isEmpty) (prev, 0, big.size)
    else {
      val v = prev + 1
      // spec-aware read: a small file under an evolved layout carries
      // column VALUES in its directory names — a flat parquet read
      // would silently drop them from the merged rewrite. The merged
      // files then store those columns as ordinary (string) data,
      // which the evolved union surfaces identically.
      val mergedDf = readFilesEvolved(spark, root, small)
        .coalesce(targetFiles)
      val merged = writeData(mergedDf, root, v)
      // a compaction rewrites bytes, not the table: carry the pinned
      // schema with the statcol header
      writeManifest(root, v, big ++ merged, carriedMeta(root, prev) ++
        manifestMeta(root, prev).filter(_._1 == "schema"))
      val bigSet = big.toSet
      val carried = statsLinesAt(root, prev).filter(l => bigSet(l.path))
      // merged files stay indexed: OPTIMIZE must not dilute the
      // skipping index (same maintenance contract as commitAppend)
      val freshLines = statsForFiles(spark, merged,
        usableKinds(mergedDf, statCols(root, prev)))
      if (carried.nonEmpty || freshLines.nonEmpty)
        writeStatsLines(root, v, carried ++ freshLines)
      (v, small.size, big.size)
    }
  }

  /** Copy-on-write row-level DELETE — the takedown / right-to-be-
    * forgotten commit a real training-data store hits first. Only
    * files that actually CONTAIN matching rows are rewritten; every
    * other file is carried into the new manifest BY PATH (at 100 TB,
    * rewriting healthy files for a targeted delete is the whole cost
    * this exists to avoid). Old versions keep listing the original
    * files, so pre-delete snapshots still read the deleted rows —
    * time travel is unchanged; a GDPR-grade physical purge is the
    * separate maintenance step that expires old manifests and
    * orphaned files.
    *
    * Candidate pruning is two-layered: `pruneRange` — a
    * (column, lo, hi) triple the caller's predicate must IMPLY —
    * resolves against the v<N>.stats sidecar first (through the
    * `#statcol` column-identity map: a range on a non-indexed column
    * prunes nothing rather than prune by another column's bounds,
    * which would leave matching rows ALIVE in wrongly-skipped files —
    * a silent retention/GDPR failure) — driver-side, file-count-sized,
    * no IO — then ONE distributed probe pass finds
    * which surviving candidates really hold matching rows
    * (`input_file_name` distinct — output bounded by file count, not
    * row count). Rewritten survivors = `NOT coalesce(pred, false)`:
    * SQL DELETE semantics remove only rows where the predicate is
    * TRUE — null-predicate rows are kept, which a bare `!pred` filter
    * would silently drop. Stats lines are carried for untouched
    * files; on an indexed store the rewritten files are re-indexed in
    * the same commit.
    *
    * Returns (newVersion, nRewritten, nCarried); no-op (current
    * version, 0, fileCount) when nothing matches. */
  def deleteRows(spark: SparkSession, root: String, predicate: Column,
      pruneRange: Option[(String, Long, Long)] = None): (Int, Int, Int) = {
    val prev = latestVersion(root)
    val all = filesAt(root, prev)
    val candidates = pruneRange match {
      case Some((c, lo, hi)) => pruneFiles(root, c, lo, hi, Some(prev))._1
      case None => all
    }
    // spec-aware reads throughout: files under an evolved layout keep
    // their directory-encoded column values through both the probe and
    // the rewrite (a flat read would drop them from the rewritten
    // rows — silent data loss), and a predicate over a partition
    // column resolves instead of failing
    val hit: Set[String] =
      if (candidates.isEmpty) Set.empty
      else readFilesEvolved(spark, root, candidates)
        .filter(predicate)
        .select(input_file_name().as("f")).distinct()
        .collect()
        .map(r => new java.net.URI(r.getString(0)).getPath).toSet
    if (hit.isEmpty) (prev, 0, all.size)
    else {
      val v = prev + 1
      val keep = all.filterNot(hit)
      val rewriteDf = readFilesEvolved(spark, root, hit.toSeq.sorted)
        .filter(not(coalesce(predicate, lit(false))))
      val fresh = writeData(rewriteDf, root, v)
      writeManifest(root, v, keep ++ fresh, carriedMeta(root, prev) ++
        manifestMeta(root, prev).filter(_._1 == "schema"))
      val keepSet = keep.toSet
      val carried = statsLinesAt(root, prev).filter(l => keepSet(l.path))
      // rewritten survivors stay indexed: a takedown delete must not
      // dilute the skipping index (same maintenance as commitAppend)
      val freshLines = statsForFiles(spark, fresh,
        usableKinds(rewriteDf, statCols(root, prev)))
      if (carried.nonEmpty || freshLines.nonEmpty)
        writeStatsLines(root, v, carried ++ freshLines)
      (v, hit.size, keep.size)
    }
  }

  /** MERGE INTO — the lakehouse upsert commit that closes the write
    * surface (append / replace / delete / compact / merge). Reads the
    * snapshot at the CURRENT latest version (file list pinned at call
    * time), applies an SCD1 latest-wins changelog via
    * [[graft.operators.CdcMerge]] ('U' upserts, 'D' deletes, untouched
    * rows carry), and publishes the merged state as a replace-commit
    * under the SAME CAS guard as every other commit: the target
    * version number is pinned BEFORE the (slow) distributed write, so
    * a concurrent commit that lands in between makes the manifest
    * link fail with [[CommitConflictException]] — which is exactly
    * right, because this merge was computed against a base that is no
    * longer the head (a lost-update otherwise). Retry = re-read, re-
    * merge, re-commit. Pre-merge versions keep reading the old rows
    * (their manifests pin the original files).
    *
    * Contract: the stored table's schema is (`keyCol`, val, us) — the
    * shape [[graft.operators.CdcMerge.merge]] applies changes to;
    * `changes` is a raw changelog with (`keyCol`, `opCol`, `valCol`,
    * `usCol`, `idCol`), collapsed latest-wins per key before the
    * apply. Returns the new version. For a store of ANY schema use
    * [[commitMergeRows]]; this single-value variant predates it and
    * stays for the CdcMerge-status-label path (s29). */
  def commitMerge(spark: SparkSession, root: String, changes: DataFrame,
      keyCol: String, opCol: String, valCol: String, usCol: String,
      idCol: String, writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val prev = latestVersion(root)
      require(prev >= 1, s"no snapshot to merge into under $root")
      val base = readEvolved(spark, root, Some(prev))
        .select(col(keyCol), col("val"), col("us"))
      val latest = graft.operators.CdcMerge.latestState(
        changes, keyCol, opCol, valCol, usCol, idCol)
      val merged = graft.operators.CdcMerge.merge(base, latest, keyCol)
        .select(col(keyCol), col("val"), col("last_us").as("us"))
      val v = prev + 1
      writeManifest(root, v, writeData(merged, root, v),
        replaceSchemaMeta(merged) ++ writerToken.map("writer" -> _).toMap)
      v
    }

  /** MERGE INTO for a snapshotted table of ARBITRARY schema — the
    * general upsert [[commitMerge]]'s blessed (key, val, us) triple
    * can't express: the reference's ReplacingMergeTree story (late
    * trade corrections upserted by trade_id) completed at the
    * lakehouse layer. `changes` carries the FULL target schema plus
    * `opCol` ('U' upsert-whole-row / 'D' delete) and the
    * (`seqCol`, `idCol`) ordering pair; per key the latest change
    * wins (ONE `max_by` hash aggregate — never a window sort), then
    * the apply is MERGE INTO semantics: matched+D deletes,
    * matched+U replaces the whole row, unmatched+U inserts.
    *
    * Scale shape: the collapse shuffles only the changelog (small);
    * the apply is ONE equi-keyed anti-join of base against the
    * collapsed keys (broadcast when the changelog is small — the
    * typical late-correction batch — so the 100 TB base never
    * shuffles) plus a union with the upserts. Same CAS discipline as
    * every commit: the target version pins BEFORE the distributed
    * write, a concurrent commit makes the manifest link throw
    * [[CommitConflictException]], retry = re-read + re-merge.
    * Pre-merge versions keep reading the original files. */
  def commitMergeRows(spark: SparkSession, root: String,
      changes: DataFrame, keyCol: String, opCol: String, seqCol: String,
      idCol: String, writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val prev = latestVersion(root)
      require(prev >= 1, s"no snapshot to merge into under $root")
      // evolved-safe: directory-encoded columns surface (as strings)
      // and ride into the merged replace-commit as data columns
      val base = readEvolved(spark, root, Some(prev))
      val cols = base.columns.toSeq
      require(cols.contains(keyCol), s"key column $keyCol not in table")
      val payload = cols.filterNot(_ == keyCol) :+ opCol
      val latest = changes
        .groupBy(col(keyCol))
        .agg(max_by(struct(payload.map(col): _*),
          struct(col(seqCol), col(idCol))).as("__mr"))
        .select(col(keyCol) +: payload.map(c => col(s"__mr.$c").as(c)): _*)
      val upserts = latest.filter(col(opCol) === "U")
        .select(cols.map(col): _*)
      val merged = base
        .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(upserts)
        .select(cols.map(col): _*)
      val v = prev + 1
      writeManifest(root, v, writeData(merged, root, v),
        replaceSchemaMeta(merged) ++ writerToken.map("writer" -> _).toMap)
      v
    }

  /** All committed version numbers, ascending (empty when none). */
  def versions(root: String): Seq[Int] = {
    val d = manifestDir(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().map(_.getName)
      .collect { case s if s.matches("v\\d+\\.list") =>
        s.stripPrefix("v").stripSuffix(".list").toInt }
      .toSeq.sorted
  }

  /** What [[expireVersions]] did: which versions were expired /
    * survive, and how many orphaned data files (and bytes) were
    * physically deleted. */
  final case class ExpireResult(expired: Seq[Int], survivors: Seq[Int],
      deletedFiles: Int, deletedBytes: Long)

  /** Default orphan grace: 6 hours — comfortably above any realistic
    * in-flight commit, matching Iceberg's remove-orphan-files stance
    * that the DEFAULT must be safe on a live table. Pass 0 explicitly
    * only for a quiesced table (tests, single-writer maintenance
    * windows). */
  val DefaultOrphanGraceMs: Long = 6L * 3600 * 1000

  /** Snapshot retention — the VACUUM / expire-snapshots maintenance
    * step [[deleteRows]]' contract defers to. Without it a 100 TB
    * store grows without bound and takedown-deleted rows remain
    * readable through old versions forever, defeating the delete.
    *
    *  - keeps the `keepLast` most recent versions (≥ 1 — the head is
    *    never expirable) plus every TAGGED version, matching the tag
    *    contract: tags pin manifests regardless of age;
    *  - expired versions lose their manifest and their stats/Bloom
    *    sidecars, so a
    *    later `read(root, Some(v))` fails loudly ("no manifest for
    *    version v") instead of returning silently-wrong data;
    *  - data files referenced by NO surviving manifest are physically
    *    deleted — the GDPR-grade purge. `orphanGraceMs` is the
    *    Iceberg remove-orphan-files age guard: an optimistic
    *    committer writes data files FIRST and publishes its manifest
    *    LAST, so an unreferenced-but-young file may be an in-flight
    *    commit, not garbage. The default is a conservative
    *    [[DefaultOrphanGraceMs]]; 0 purges everything unreferenced
    *    and must be passed EXPLICITLY, only when no commit is
    *    concurrent with the vacuum.
    *
    * The referenced-file set is RE-LISTED from the live manifests
    * immediately before the physical delete loop: a commit that
    * publishes its manifest at any point before the sweep protects
    * its files regardless of grace, shrinking the race window from
    * "whole vacuum duration" to the instant between the re-list and
    * each delete. Grace remains the only guard for a commit still
    * between its data write and its manifest publish at sweep time —
    * the same residual window Iceberg accepts.
    *
    * Driver-side metadata work is manifest-count × file-count sized
    * (KBs); the deletes are per-file filesystem calls — on a real
    * object store these fan out to a distributed delete, the listing
    * stays metadata. Loser-commit orphan directories (CAS losers)
    * are swept by the same unreferenced-file rule, and the husk
    * cleanup (marker files, emptied directories) honors the same
    * age cutoff so a just-created output directory of an in-flight
    * commit is never yanked from under it. */
  def expireVersions(root: String, keepLast: Int,
      orphanGraceMs: Long = DefaultOrphanGraceMs): ExpireResult =
    expireVersionsImpl(root, keepLast, orphanGraceMs, () => ())

  /** [[expireVersions]] with a test seam: `beforeSweep` runs between
    * manifest expiry and the physical sweep, where a concurrent
    * commit is hardest to protect — Round15Spec commits there and
    * proves the re-list keeps its files under a 0-grace vacuum. */
  private[graft] def expireVersionsImpl(root: String, keepLast: Int,
      orphanGraceMs: Long, beforeSweep: () => Unit): ExpireResult = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val all = versions(root)
    if (all.isEmpty) return ExpireResult(Nil, Nil, 0, 0L)
    val tagged = tags(root).values.toSet
    val survive = (all.takeRight(keepLast).toSet ++
      all.filter(tagged)).toSeq.sorted
    val expired = all.filterNot(survive.toSet)
    expired.foreach { v =>
      Files.deleteIfExists(manifestFile(root, v).toPath)
      Files.deleteIfExists(statsFile(root, v).toPath)
      // every per-column bloom sidecar of the dead version — without
      // this, v<N>.bloom.<col> files accumulate in _manifests forever
      // on long-running tables (they are version-keyed metadata, dead
      // the instant their manifest is)
      Option(manifestDir(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"v$v.bloom."))
        .foreach(f => Files.deleteIfExists(f.toPath))
    }
    beforeSweep()
    // physical purge: every data file no LIVE manifest lists, old
    // enough to provably not belong to an in-flight commit. The
    // manifest list is re-read HERE — not reused from the expiry
    // phase — so any manifest published since then (a concurrent
    // commit) pins its files without depending on grace.
    val referenced = versions(root).flatMap(filesAt(root, _)).toSet
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    var nDel = 0
    var bytes = 0L
    val dataDir = new File(root, "data")
    def sweep(f: File): Unit =
      if (f.isDirectory) {
        f.listFiles().foreach(sweep)
        // a dir left with no data files is an empty husk (markers
        // like _SUCCESS/.crc included) — remove it with its residue,
        // but only once BOTH the residue and the directory itself
        // clear the age cutoff: a fresh marker-only directory is an
        // in-flight write's output, not garbage
        val left = f.listFiles()
        if (left.forall(c => !c.isDirectory &&
            !c.getName.endsWith(".parquet") &&
            c.lastModified() <= cutoff) &&
            f.lastModified() <= cutoff) {
          left.foreach(c => Files.deleteIfExists(c.toPath))
          if (f.listFiles().isEmpty) Files.deleteIfExists(f.toPath)
        }
      } else if (f.getName.endsWith(".parquet") &&
          !referenced(f.getPath) && f.lastModified() <= cutoff) {
        bytes += f.length()
        nDel += 1
        Files.deleteIfExists(f.toPath)
      }
    if (dataDir.isDirectory) dataDir.listFiles().foreach(sweep)
    ExpireResult(expired, survive, nDel, bytes)
  }

  // ---- named tags over versions ----

  private def tagsFile(root: String) = new File(manifestDir(root), "tags.list")

  /** All tags: name → version. */
  def tags(root: String): Map[String, Int] = {
    val f = tagsFile(root)
    if (!f.isFile) Map.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .map { l => val Array(n, v) = l.split("\t"); n -> v.toInt }
      .toMap
  }

  /** Tag a version (default: latest) with a stable name — the
    * Iceberg/Delta "tag" primitive: tags pin manifests and manifests
    * pin files, so a tagged snapshot stays byte-identical through any
    * later commit INCLUDING compaction (replace commits never delete
    * data files). Re-tagging a name moves it (latest write wins);
    * the tag file is rewritten via tmp + atomic rename like the
    * manifests. Returns the tagged version. */
  def tag(root: String, name: String, version: Option[Int] = None): Int = {
    require(name.nonEmpty && !name.contains("\t") && !name.contains("\n"),
      s"bad tag name: '$name'")
    val v = version.getOrElse(latestVersion(root))
    require(manifestFile(root, v).isFile, s"no manifest for version $v")
    val all = tags(root) + (name -> v)
    val tmp = Paths.get(manifestDir(root).getPath, ".tags.list.tmp")
    Files.write(tmp,
      all.toSeq.sortBy(_._1).map { case (n, tv) => s"$n\t$tv" }
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, tagsFile(root).toPath, StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Read the snapshot a tag points at. */
  def readTag(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = tags(root).getOrElse(name,
      throw new graft.QueryError(s"unknown tag: $name"))
    read(spark, root, Some(v))
  }

  // ---- per-file min/max stats: manifest-level data skipping ----

  private def statsFile(root: String, v: Int) =
    new File(manifestDir(root), s"v$v.stats")

  /** One typed stats line: per (file, column) min/max. `kind` is the
    * value domain — `long` (integral, decimal render), `ts`
    * (timestamp, epoch-MICROS render — the engine-neutral instant),
    * `str` (string, base64 of the UTF-8 bytes so tabs/newlines in
    * data can never corrupt the sidecar). `mn`/`mx` hold the ENCODED
    * form. */
  private[sources] final case class ColStats(path: String, col: String,
      kind: String, mn: String, mx: String)

  /** All stats lines at version `v`, both formats: legacy 3-field
    * lines (`path min max` — the single Long column the manifest's
    * bare `#statcol` names) normalize to typed lines, 5-field lines
    * (`path col kind min max`) parse directly. Files committed
    * without stats simply have no line (and are never skipped). */
  private[graft] def statsLinesAt(root: String, v: Int): Seq[ColStats] = {
    val f = statsFile(root, v)
    if (!f.isFile) Seq.empty
    else {
      lazy val legacyCol =
        statCols(root, v).headOption.map(_._1).getOrElse("")
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .flatMap { line =>
          line.split("\t") match {
            case Array(p, mn, mx) =>
              Some(ColStats(p, legacyCol, "long", mn, mx))
            case Array(p, c, k, mn, mx) => Some(ColStats(p, c, k, mn, mx))
            case _ => None
          }
        }
    }
  }

  private def writeStatsLines(root: String, v: Int,
      lines: Seq[ColStats]): Unit = {
    val tmp = Paths.get(manifestDir(root).getPath, s".v$v.stats.tmp")
    Files.write(tmp,
      lines.sortBy(l => (l.path, l.col))
        .map(l => s"${l.path}\t${l.col}\t${l.kind}\t${l.mn}\t${l.mx}")
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, statsFile(root, v).toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Long-domain [min, max] per file for column `c` (kinds `long` and
    * `ts` — a ts bound IS its epoch-micros long). The caller must
    * have resolved `c` against [[statCols]]; lines for other columns
    * are ignored, so bounds can never be mistaken across columns. */
  private[graft] def boundsFor(root: String, v: Int, c: String)
      : Map[String, (Long, Long)] =
    statsLinesAt(root, v)
      .filter(l => l.col == c && (l.kind == "long" || l.kind == "ts"))
      .map(l => l.path -> (l.mn.toLong, l.mx.toLong)).toMap

  /** String-domain [min, max] per file for column `c` (kind `str`),
    * decoded from base64. Ordering at the USE site must be byte-wise
    * unsigned (UTF8String.compareTo) — Spark's string order. */
  private[graft] def strBoundsFor(root: String, v: Int, c: String)
      : Map[String, (String, String)] = {
    val dec = java.util.Base64.getDecoder
    def s(b: String) = new String(dec.decode(b), StandardCharsets.UTF_8)
    statsLinesAt(root, v)
      .filter(l => l.col == c && l.kind == "str")
      .map(l => l.path -> (s(l.mn), s(l.mx))).toMap
  }

  /** Append commit that also records per-file min/max of `statCol`
    * (an integral column) in a `v<N>.stats` sidecar — the
    * manifest-level data-skipping index every real table format
    * carries. Single-column spelling of [[commitAppendWithStatsMulti]],
    * kept as the common case's API. */
  def commitAppendWithStats(df: DataFrame, root: String,
      statCol: String, nFiles: Int = 8,
      writerToken: Option[String] = None): Int =
    commitAppendWithStatsMulti(df, root, Seq(statCol), nFiles, writerToken)

  /** The stats-sidecar kind for a DataFrame column, from its Spark
    * type: integral → `long`, timestamp → `ts` (bounds as
    * epoch-micros — the engine-neutral instant), string → `str`
    * (bounds base64-coded). Anything else can't be min/max-indexed
    * here — fail loudly rather than write bounds that would prune
    * wrongly. */
  private def statKindOf(df: DataFrame, c: String): String =
    try kindOfType(df.schema(c).dataType)
    catch {
      case _: graft.QueryError => throw new graft.QueryError(
        s"stats column $c has unsupported type ${df.schema(c).dataType} " +
          "(supported: integral, timestamp, string)")
    }

  private def kindOfType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType => "long"
      case TimestampType => "ts"
      case StringType => "str"
      case other => throw new graft.QueryError(
        s"unsupported stats type $other")
    }
  }

  /** Append commit recording per-file typed min/max for EVERY column
    * in `statColumns` — per-column file skipping like Iceberg's
    * per-column bounds, so ONE read can prune by a time range AND a
    * second dimension at once (the reference's headline time-range
    * pruning, applied to the snapshot path, without giving up the
    * second index). The frame is range-partitioned on the stat
    * columns in order (first = primary clustering) so files hold
    * tight, mostly-disjoint ranges — stats only skip when the layout
    * clusters. Bounds for the fresh files come from ONE distributed
    * pass (a production impl reads parquet footers — same
    * information, zero extra IO); prior versions' lines carry
    * forward, and the `#statcol` header merges prior entries with
    * this commit's `name:kind` list so every consumer resolves
    * column identity before pruning. All-null columns in a file get
    * no line (conservatively never skipped). */
  def commitAppendWithStatsMulti(df: DataFrame, root: String,
      statColumns: Seq[String], nFiles: Int = 8,
      writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val prev = latestVersion(root)
      val v = prev + 1
      val (fresh, freshStats, kinds) =
        writeDataWithStats(df, root, v, statColumns, nFiles)
      val base = if (prev == 0) Seq.empty else filesAt(root, prev)
      // record WHICH columns the stats sidecar indexes (name:kind list)
      // — the pruning faces need the identity, not just the numbers
      val prevCols =
        if (prev == 0) scala.collection.immutable.ListMap.empty[String, String]
        else statCols(root, prev)
      val hdr = (prevCols ++ kinds)
        .map { case (c, k) => s"$c:$k" }.mkString(",")
      writeManifest(root, v, base ++ fresh,
        Map("statcol" -> hdr) ++ mergedSchemaMeta(df, root, prev) ++
          writerToken.map("writer" -> _).toMap)
      writeStatsLines(root, v, statsLinesAt(root, prev) ++ freshStats)
      v
    }

  /** REPLACE commit with typed stats on every requested column — the
    * re-indexing rewrite behind `CALL system.index(...)`: the whole
    * table re-clusters by the stat columns and the new version's
    * sidecar indexes ONLY the fresh files (replace semantics — old
    * stats die with the files they described; old VERSIONS keep
    * reading their original files as always). */
  def commitReplaceWithStatsMulti(df: DataFrame, root: String,
      statColumns: Seq[String], nFiles: Int = 8,
      writerToken: Option[String] = None): Int =
    writerToken.flatMap(committedVersionFor(root, _)).getOrElse {
      val v = latestVersion(root) + 1
      val (fresh, freshStats, kinds) =
        writeDataWithStats(df, root, v, statColumns, nFiles)
      val hdr = kinds.map { case (c, k) => s"$c:$k" }.mkString(",")
      writeManifest(root, v, fresh,
        Map("statcol" -> hdr) ++ replaceSchemaMeta(df) ++
          writerToken.map("writer" -> _).toMap)
      writeStatsLines(root, v, freshStats)
      v
    }

  /** Shared stats-commit core: range-partition `df` on the stat
    * columns, write version `v`'s data files, and compute per-file
    * typed bounds in ONE distributed pass (bounded collect — one row
    * per fresh file). Returns (files, stats lines, name→kind list). */
  private def writeDataWithStats(df: DataFrame, root: String, v: Int,
      statColumns: Seq[String], nFiles: Int)
      : (Seq[String], Seq[ColStats], Seq[(String, String)]) = {
    require(statColumns.nonEmpty, "need at least one stats column")
    val kinds = statColumns.map(c => c -> statKindOf(df, c))
    val fresh = writeData(
      df.repartitionByRange(nFiles, statColumns.map(col): _*), root, v)
    (fresh, statsForFiles(df.sparkSession, fresh, kinds), kinds)
  }

  /** Typed per-file [min, max] bounds of already-written `files` on
    * `kinds` — the core the stats commits AND append-time index
    * maintenance share: ONE distributed aggregate whose output is
    * bounded by the file count, not the row count (a production
    * implementation reads parquet footers — the same numbers with
    * zero extra IO). All-null columns in a file get no line
    * (conservatively never skipped). */
  private def statsForFiles(spark: SparkSession, files: Seq[String],
      kinds: Seq[(String, String)]): Seq[ColStats] = {
    if (files.isEmpty || kinds.isEmpty) return Seq.empty
    val aggs = kinds.flatMap { case (c, k) =>
      def b(agg: Column): Column = k match {
        case "long" => agg.cast("long")
        case "ts" => unix_micros(agg)
        case _ => agg
      }
      Seq(b(min(col(c))).as(s"mn_$c"), b(max(col(c))).as(s"mx_$c"))
    }
    val enc = java.util.Base64.getEncoder
    def render(r: org.apache.spark.sql.Row, k: String, f: String): String =
      if (k == "str") enc.encodeToString(
        r.getAs[String](f).getBytes(StandardCharsets.UTF_8))
      else r.getAs[Long](f).toString
    // bounded collect: one row per file
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .toSeq.flatMap { r =>
        // input_file_name is a file:// URI; manifests hold plain paths
        val p = new java.net.URI(r.getAs[String]("f")).getPath
        kinds.flatMap { case (c, k) =>
          if (r.isNullAt(r.fieldIndex(s"mn_$c"))) None // all-null file
          else Some(ColStats(p, c, k,
            render(r, k, s"mn_$c"), render(r, k, s"mx_$c")))
        }
      }
  }

  /** The manifest's file list at `v` split by the skipping decision
    * for `[lo, hi]` on `statCol`: (kept, skipped). The column is
    * resolved through the manifest's `#statcol` identity map FIRST —
    * on a multi-column-indexed store, pruning `statCol`'s range
    * against a DIFFERENT column's bounds would silently drop files
    * that still hold matching rows (the one failure mode a reader can
    * never have; found on `SnapshotRead.plan` in round 16 and on this
    * legacy face in round 17). When `statCol` is not an indexed
    * long/ts column, NOTHING prunes — the caller's row filter still
    * applies, so correctness never depends on the sidecar. A file is
    * skipped ONLY when its recorded [min, max] provably misses the
    * range; files without stats lines are conservatively kept.
    * Driver-side metadata — file-count-sized, no data IO. */
  def pruneFiles(root: String, statCol: String, lo: Long, hi: Long,
      version: Option[Int] = None): (Seq[String], Seq[String]) = {
    val v = version.getOrElse(latestVersion(root))
    val all = filesAt(root, v)
    if (!statCols(root, v).get(statCol).exists(k => k == "long" || k == "ts"))
      (all, Seq.empty)
    else {
      val stats = boundsFor(root, v, statCol)
      all.partition { f =>
        stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
  }

  /** Range read with manifest-level file skipping: only files whose
    * [min, max] of `statCol` overlaps `[lo, hi]` reach the parquet
    * scan (the row-level predicate still applies on top — stats
    * bound files, they don't filter rows). Semantically identical to
    * `read(...).filter(lo <= statCol <= hi)` ALWAYS: the column
    * resolves through the `#statcol` identity map inside
    * [[pruneFiles]], and a non-indexed column simply prunes nothing. */
  def readPruned(spark: SparkSession, root: String, statCol: String,
      lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    val (kept, _) = pruneFiles(root, statCol, lo, hi, version)
    spark.read.parquet(kept: _*)
      .filter(col(statCol) >= lo && col(statCol) <= hi)
  }

  /** Row-level changelog between two versions (the Iceberg
    * `create_changelog_view` / Delta CDF-from-snapshots primitive),
    * computed from the manifests ALONE: files carried by path between
    * the versions cancel by identity and are NEVER read, so the scan
    * is delta-proportional — after an append + a copy-on-write delete
    * on a 100 TB table, the diff reads the appended and rewritten
    * files, not the table. Survivor rows that a rewrite copied into
    * fresh files also sit in the dropped originals, so they cancel in
    * the signed multiset aggregate (one shuffle keyed by the full
    * row, no join) and only true adds/removes surface. Emits the
    * table's columns plus `change` ∈ {added, removed} and the
    * multiplicity `n`. */
  def snapshotDiff(spark: SparkSession, root: String, v1: Int, v2: Int)
      : DataFrame = {
    import org.apache.spark.sql.functions.{abs => fabs, sum => fsum, _}
    val s1 = filesAt(root, v1).toSet
    val s2 = filesAt(root, v2).toSet
    val onlyOld = (s1 -- s2).toSeq.sorted
    val onlyNew = (s2 -- s1).toSeq.sorted
    val allFiles = onlyOld ++ onlyNew ++ s1 ++ s2
    // both versions file-less (e.g. two empty initial commits): the
    // diff is empty by definition, and there is no data file to probe
    // a table schema from — return the degenerate (change, n) frame
    // instead of dereferencing .head
    if (allFiles.isEmpty) {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("change", StringType),
          StructField("n", LongType))))
    }
    val probe = allFiles.head
    val schema = spark.read.parquet(probe).schema
    val cols = schema.fieldNames.toSeq
    def side(fs: Seq[String], w: Long): DataFrame = {
      val base = if (fs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.parquet(fs: _*)
      // normalize column order — unionAll is positional and a rewrite
      // commit may have serialized columns in a different order
      base.select(cols.map(col): _*).withColumn("__sd_w", lit(w))
    }
    side(onlyOld, -1L).unionAll(side(onlyNew, 1L))
      .groupBy(cols.map(col): _*)
      .agg(fsum(col("__sd_w")).as("__sd_delta"))
      .where(col("__sd_delta") =!= 0L)
      .select(cols.map(col) :+
        when(col("__sd_delta") > 0, "added").otherwise("removed")
          .as("change") :+
        fabs(col("__sd_delta")).as("n"): _*)
  }
}
