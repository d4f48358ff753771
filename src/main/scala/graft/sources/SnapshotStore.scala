package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot isolation over plain parquet — the
  * time-travel core of a lakehouse table format (Delta/Iceberg's
  * essential mechanism) built from two primitives Spark already has:
  * immutable data files and an explicit file list per version.
  *
  *  - data files live under `<root>/data/c<N>/part-*.parquet` and are
  *    NEVER mutated or deleted by a commit;
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
  * rely on. Single-writer by design (the driver serializes commits);
  * multi-writer CAS is a metastore concern, out of scope here. */
object SnapshotStore {

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

  private def filesAt(root: String, v: Int): Seq[String] = {
    val f = manifestFile(root, v)
    require(f.isFile, s"no manifest for version $v under $root")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def writeManifest(root: String, v: Int,
      files: Seq[String]): Unit = {
    val dir = manifestDir(root)
    dir.mkdirs()
    val tmp = Paths.get(dir.getPath, s".v$v.list.tmp")
    Files.write(tmp,
      files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile(root, v).toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeData(df: DataFrame, root: String, v: Int)
      : Seq[String] = {
    val dir = new File(new File(root, "data"), s"c$v")
    df.write.parquet(dir.getPath)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq.sorted
  }

  /** Append commit: the new version sees every previous file plus the
    * incoming frame's files. Returns the new version number. */
  def commitAppend(df: DataFrame, root: String): Int = {
    val prev = latestVersion(root)
    val v = prev + 1
    val fresh = writeData(df, root, v)
    val base = if (prev == 0) Seq.empty else filesAt(root, prev)
    writeManifest(root, v, base ++ fresh)
    v
  }

  /** Replace commit (full rewrite / compaction): the new version sees
    * ONLY the incoming frame's files; older versions keep reading the
    * files they always listed. Returns the new version number. */
  def commitReplace(df: DataFrame, root: String): Int = {
    val v = latestVersion(root) + 1
    writeManifest(root, v, writeData(df, root, v))
    v
  }

  /** Snapshot read at a version (defaults to latest). */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(root))
    spark.read.parquet(filesAt(root, v): _*)
  }
}
