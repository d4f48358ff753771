package graft.sources

import java.io.File
import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The SQL-text face of the snapshot store — a DataSourceV2
  * [[TableCatalog]] so a pure-SQL user gets Delta/Iceberg-style time
  * travel without touching the Scala API:
  *
  * {{{
  *   SET spark.sql.catalog.graft_snap = graft.sources.GraftCatalog
  *   SET spark.sql.catalog.graft_snap.warehouse = /path/to/warehouse
  *   SELECT * FROM graft_snap.trades VERSION AS OF 3;
  *   SELECT * FROM graft_snap.trades VERSION AS OF 'baseline'; -- a tag
  *   SELECT * FROM graft_snap.trades TIMESTAMP AS OF '2026-01-01';
  * }}}
  *
  * A table named `t` is the snapshot-store root `<warehouse>/t`
  * (nested namespaces map to subdirectories). `loadTable` resolves
  * the requested version — Spark's parser hands `VERSION AS OF` /
  * `TIMESTAMP AS OF` straight to the catalog's overloads, timestamps
  * in MICROSECONDS — to its manifest file list and hands EXACTLY
  * those paths to Spark's own `ParquetTable`, so the SQL path and
  * the Scala `SnapshotStore.read` path plan the same file-pruned
  * parquet scan (filter pushdown, column pruning, and vectorized
  * reading all come from the stock parquet source). A non-numeric
  * `VERSION AS OF` string resolves as a TAG name — the natural SQL
  * spelling for pinned snapshots.
  *
  * Read-only by design: writes go through the commit API
  * ([[SnapshotStore.commitAppend]] etc.), whose CAS publish is the
  * store's single serialization point — letting SQL INSERT bypass it
  * would reintroduce the lost-update race the manifests exist to
  * prevent. All write-shaped methods throw. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(new File(warehouse))(new File(_, _)).getPath

  private def tableAt(ident: Identifier, v: Int): Table = {
    val root = rootOf(ident)
    val files = SnapshotStore.filesAt(root, v)
    // partition-evolved commits store values in DIRECTORY names under
    // a per-commit spec; a flat parquet scan over the leaf files would
    // silently DROP those columns. Fail loudly instead of returning a
    // narrower table than the Scala read path sees.
    val evolved = files.exists { p =>
      var d = new File(p).getParentFile
      var hit = false
      while (d != null && !hit && d.getName != "data") {
        hit = new File(d, "_spec.list").isFile
        d = d.getParentFile
      }
      hit
    }
    if (evolved)
      throw new UnsupportedOperationException(
        s"table ${ident.toString} has partition-evolved commits whose " +
          "columns live in directory layouts; the SQL face cannot " +
          "flatten them — read it via SnapshotStore.readEvolved / " +
          "SnapshotRead.plan")
    new GraftCatalog.SnapshotTable(
      s"$catalogName.${ident.toString}@v$v", root, v, files)
  }

  private def checkExists(ident: Identifier): String = {
    val root = rootOf(ident)
    if (SnapshotStore.versions(root).isEmpty)
      throw new NoSuchTableException(ident)
    root
  }

  override def loadTable(ident: Identifier): Table =
    tableAt(ident, SnapshotStore.latestVersion(checkExists(ident)))

  /** `VERSION AS OF <v>` — an integer version or a tag name. An
    * unknown tag is a VERSION error, not a missing table: the table
    * exists (checkExists passed), so the diagnostic must name the
    * actual problem — NoSuchTableException here would tell a user who
    * typo'd a tag that a table they can SELECT from doesn't exist. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = checkExists(ident)
    val v = version.toIntOption.getOrElse(
      SnapshotStore.tags(root).getOrElse(version,
        throw new graft.QueryError(
          s"unknown version/tag '$version' for table ${ident.toString}: " +
            s"known tags ${SnapshotStore.tags(root).keys.toSeq.sorted
              .mkString("[", ", ", "]")}, " +
            s"versions ${SnapshotStore.versions(root).headOption.getOrElse(0)}" +
            s"..${SnapshotStore.latestVersion(root)}")))
    tableAt(ident, v)
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    tableAt(ident,
      SnapshotStore.versionAsOf(checkExists(ident), timestampMicros / 1000L))

  override def tableExists(ident: Identifier): Boolean =
    SnapshotStore.versions(rootOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(new File(warehouse))(new File(_, _))
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    kids.filter(f => f.isDirectory &&
        new File(f, "_manifests").isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is the read face of the snapshot store; $op goes " +
        "through the commit API (SnapshotStore.commit*)")

  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME TABLE")
}

object GraftCatalog {
  /** Read-only view over Spark's own ParquetTable: exposes ONLY
    * `SupportsRead` — `ParquetTable` also implements `SupportsWrite`,
    * and letting a SQL `INSERT INTO` stream parquet into
    * manifest-listed paths would mutate committed files behind every
    * version's back (the exact corruption the immutable-data-file
    * contract forbids). Narrowing the interface makes the analyzer
    * reject writes at plan time ("table does not support append"),
    * not at runtime. Scans go through [[SnapshotScanBuilder]], which
    * re-resolves the file list against the sidecar indexes at filter-
    * pushdown time. */
  /** Test seam: how many times a table's schema had to be INFERRED
    * from data-file footers because the manifest pins no `#schema`
    * header. Stores written by current commits always pin one, so
    * `loadTable` + scans are zero-data-IO at plan time; only legacy
    * manifests pay inference. */
  private[graft] val footerInferences =
    new java.util.concurrent.atomic.AtomicLong(0)

  private final class SnapshotTable(tableName: String, root: String,
      v: Int, files: Seq[String])
      extends Table with SupportsRead {
    // the pinned schema travels in manifest METADATA (#schema header,
    // written at commit) — resolving it is a string parse, not IO over
    // a 100 TB table's footers. Passed as the user-specified schema so
    // the delegate ParquetTable never infers either.
    private val pinned: Option[org.apache.spark.sql.types.StructType] =
      SnapshotStore.manifestMeta(root, v).get("schema")
        .map(org.apache.spark.sql.types.StructType.fromDDL)
    private[sources] def mk(fs: Seq[String]): ParquetTable =
      ParquetTable(tableName, SparkSession.active,
        new CaseInsensitiveStringMap(Collections.emptyMap()),
        fs.toIndexedSeq, pinned, classOf[ParquetFileFormat])
    override def name(): String = tableName
    override def schema(): org.apache.spark.sql.types.StructType =
      pinned.getOrElse {
        footerInferences.incrementAndGet()
        mk(files).schema
      }
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.Collections.singleton(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = new SnapshotScanBuilder(root, v, files, mk, options)
  }

  /** The piece that makes the SQL face plan like the Scala planner:
    * Spark pushes the query's predicates into the scan builder
    * (`SupportsPushDownCatalystFilters` — the optimizer's V2 pushdown
    * entry point), and THIS builder resolves them against the
    * manifest sidecars BEFORE the parquet scan exists — equality on a
    * Bloom-indexed column keeps only covering files, bounds on the
    * stats column (identified by the manifest's `#statcol` header)
    * keep only [min,max]-overlapping files — then rebuilds the stock
    * ParquetScanBuilder over the SURVIVORS and forwards the same
    * predicates for ordinary row-group pushdown. A pure-SQL
    * `WHERE tid = k` thus scans the same one-ish file the Scala
    * `SnapshotRead.plan(point = ...)` scans, with zero extra syntax.
    * Unsupported predicate shapes simply prune nothing (the full
    * list survives) — correctness never depends on the pruning, only
    * IO does. When everything is skipped, one file is kept so schema
    * inference and the (now trivially empty) row filter still work. */
  private final class SnapshotScanBuilder(root: String, v: Int,
      all: Seq[String], mk: Seq[String] => ParquetTable,
      options: CaseInsensitiveStringMap)
      extends org.apache.spark.sql.internal.connector
        .SupportsPushDownCatalystFilters
      with org.apache.spark.sql.connector.read
        .SupportsPushDownRequiredColumns {
    import org.apache.spark.sql.catalyst.expressions._

    private var inner = mk(all).newScanBuilder(options)

    private def longOf(l: Literal): Option[Long] = l.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType =>
        Option(l.value).map(_.toString.toLong)
      // a timestamp literal's Catalyst value IS epoch-micros — the
      // same domain the `ts`-kind sidecar stores bounds in
      case org.apache.spark.sql.types.TimestampType =>
        Option(l.value).map(_.asInstanceOf[Long])
      case _ => None
    }

    private def strOf(l: Literal): Option[UTF8String] =
      l.dataType match {
        case org.apache.spark.sql.types.StringType =>
          Option(l.value).map(_.asInstanceOf[UTF8String])
        case _ => None
      }

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
      var lo = Map.empty[String, Long]
      var hi = Map.empty[String, Long]
      // string bounds compare byte-wise unsigned (UTF8String) — the
      // ordering Spark's min/max used when the sidecar was built
      var sLo = Map.empty[String, UTF8String]
      var sHi = Map.empty[String, UTF8String]
      // per column: the key SETS the predicate restricts it to (an
      // equality is a 1-element set, an IN-list its values) — a file
      // survives a set when it may contain ANY member
      var keySets = Map.empty[String, Seq[Long]]
      def tightenLo(c: String, x: Long): Unit =
        lo += c -> math.max(x, lo.getOrElse(c, Long.MinValue))
      def tightenHi(c: String, x: Long): Unit =
        hi += c -> math.min(x, hi.getOrElse(c, Long.MaxValue))
      // strict string bounds relax to inclusive — conservative: keeps
      // at most the boundary file it could have skipped
      def tightenSLo(c: String, x: UTF8String): Unit =
        sLo += c -> sLo.get(c).filter(_.compareTo(x) >= 0).getOrElse(x)
      def tightenSHi(c: String, x: UTF8String): Unit =
        sHi += c -> sHi.get(c).filter(_.compareTo(x) <= 0).getOrElse(x)
      def keySet(c: String, ks: Seq[Long]): Unit = {
        keySets += c -> ks
        tightenLo(c, ks.min); tightenHi(c, ks.max)
      }
      def bound(a: String, l: Literal, isLo: Boolean, strict: Boolean)
          : Unit = {
        longOf(l).foreach { k =>
          val adj = if (strict) (if (isLo) k + 1 else k - 1) else k
          if (isLo) tightenLo(a, adj) else tightenHi(a, adj)
        }
        strOf(l).foreach(x => if (isLo) tightenSLo(a, x) else tightenSHi(a, x))
      }
      filters.foreach {
        case EqualTo(a: AttributeReference, l: Literal) =>
          longOf(l).foreach(k => keySet(a.name, Seq(k)))
          strOf(l).foreach { x => tightenSLo(a.name, x); tightenSHi(a.name, x) }
        case EqualTo(l: Literal, a: AttributeReference) =>
          longOf(l).foreach(k => keySet(a.name, Seq(k)))
          strOf(l).foreach { x => tightenSLo(a.name, x); tightenSHi(a.name, x) }
        case In(a: AttributeReference, vs)
            if vs.nonEmpty && vs.size <= 64 &&
              vs.forall(_.isInstanceOf[Literal]) =>
          val ks = vs.flatMap(x => longOf(x.asInstanceOf[Literal]))
          if (ks.size == vs.size) keySet(a.name, ks)
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          bound(a.name, l, isLo = true, strict = false)
        case GreaterThan(a: AttributeReference, l: Literal) =>
          bound(a.name, l, isLo = true, strict = true)
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          bound(a.name, l, isLo = false, strict = false)
        case LessThan(a: AttributeReference, l: Literal) =>
          bound(a.name, l, isLo = false, strict = true)
        case _ => // unsupported shape: prunes nothing
      }
      // per-column typed pruning: every constrained column that the
      // #statcol header names (name:kind) intersects the survivor set.
      // Column identity is resolved through the header — bounds of one
      // column NEVER prune by another's predicate.
      val kinds = SnapshotStore.statCols(root, v)
      val afterStats = kinds.foldLeft(all) { case (fs, (c, kind)) =>
        kind match {
          case "long" | "ts" if lo.contains(c) || hi.contains(c) =>
            val (l, h) = (lo.getOrElse(c, Long.MinValue),
              hi.getOrElse(c, Long.MaxValue))
            val stats = SnapshotStore.boundsFor(root, v, c)
            fs.filter(f => stats.get(f).forall { case (mn, mx) =>
              mx >= l && mn <= h })
          case "str" if sLo.contains(c) || sHi.contains(c) =>
            val stats = SnapshotStore.strBoundsFor(root, v, c)
            fs.filter(f => stats.get(f).forall { case (mn, mx) =>
              sLo.get(c).forall(l =>
                UTF8String.fromString(mx).compareTo(l) >= 0) &&
              sHi.get(c).forall(h =>
                UTF8String.fromString(mn).compareTo(h) <= 0) })
          case _ => fs
        }
      }
      // Bloom probes only the stats survivors; absent sidecars no-op.
      // A key SET keeps the union of per-key survivors (a file may
      // serve any member). The sidecar is read ONCE per column and
      // probe positions are driver-side arithmetic (BloomIndex
      // .covers) — an N-key IN list costs one read + N·K bit tests
      // inside pushFilters, never a Spark job at plan time.
      val pruned = keySets.foldLeft(afterStats) { case (fs, (c, ks)) =>
        BloomIndex.loadSidecar(root, v, c) match {
          case None => fs
          case Some(blooms) => fs.filter(p =>
            blooms.get(p).forall(bits => ks.exists(BloomIndex.covers(bits, _))))
        }
      }
      if (pruned.size != all.size)
        inner = mk(if (pruned.nonEmpty) pruned else all.take(1))
          .newScanBuilder(options)
      inner.pushFilters(filters)
    }

    override def pushedFilters()
        : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
      inner.pushedFilters

    override def pruneColumns(
        requiredSchema: org.apache.spark.sql.types.StructType): Unit =
      inner.pruneColumns(requiredSchema)

    override def build(): org.apache.spark.sql.connector.read.Scan =
      inner.build()
  }
}
