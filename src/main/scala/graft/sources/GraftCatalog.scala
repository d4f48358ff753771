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
    new GraftCatalog.SnapshotTable(ParquetTable(
      s"$catalogName.${ident.toString}@v$v",
      SparkSession.active,
      new CaseInsensitiveStringMap(Collections.emptyMap()),
      files.toIndexedSeq,
      None,
      classOf[ParquetFileFormat]))
  }

  private def checkExists(ident: Identifier): String = {
    val root = rootOf(ident)
    if (SnapshotStore.versions(root).isEmpty)
      throw new NoSuchTableException(ident)
    root
  }

  override def loadTable(ident: Identifier): Table =
    tableAt(ident, SnapshotStore.latestVersion(checkExists(ident)))

  /** `VERSION AS OF <v>` — an integer version or a tag name. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = checkExists(ident)
    val v = version.toIntOption.getOrElse(
      SnapshotStore.tags(root).getOrElse(version,
        throw new NoSuchTableException(ident)))
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
    * not at runtime. */
  private final class SnapshotTable(underlying: ParquetTable)
      extends Table with SupportsRead {
    override def name(): String = underlying.name
    override def schema(): org.apache.spark.sql.types.StructType =
      underlying.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.Collections.singleton(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = underlying.newScanBuilder(options)
  }
}
