package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter sidecar over a point-lookup key — the file-
  * skipping index for needle queries the min/max stats sidecar
  * (s21) cannot serve: a `trade_id` is uniformly distributed, so
  * every file's [min, max] straddles every probe and zone maps prune
  * NOTHING; a 2 KiB Bloom per file prunes almost everything
  * (Iceberg/Delta ship exactly this as parquet bloom columns /
  * data-skipping indexes).
  *
  * Scale shape: the index is file-count-sized metadata (MBits/8 bytes
  * per file — ~2 KiB at the default), read on the DRIVER before
  * planning, like the manifest itself. The build is one distributed
  * pass over the snapshot: per (file, key) the K probe positions,
  * collapsed per file with `collect_set` — bounded state because the
  * set is capped by MBits, NOT by row count. Lookup evaluates the
  * SAME Catalyst hash expression on the driver (`XxHash64.eval` over
  * literals — bit-identical with the build pass, zero jobs; parity
  * property-pinned), keeps the files whose bitset covers all K
  * positions, and scans only those.
  *
  * Guarantees: no false negatives EVER (a key's file always survives
  * — Round15dSpec property-pins it); false positives cost one extra
  * file scan and shrink with bits-per-key (default 16384 bits ≈ 19
  * bits/key at 833 keys/file → ~1e-4). Size MBits ≥ ~10× expected
  * distinct keys per file when row groups grow. */
object BloomIndex {

  val MBits = 1 << 14
  val K = 7

  private def bloomFile(root: String, v: Int, keyCol: String) =
    new File(new File(root, "_manifests"), s"v$v.bloom.$keyCol")

  /** The K probe positions of `key` via double hashing — Spark
    * expressions so build and lookup share one hash codepath. */
  private def posCols(key: Column): Seq[Column] = {
    // reduce both hashes below MBits BEFORE combining — ANSI mode
    // (Spark 4 default) throws on the wrapped h1 + i*h2 long add
    val h1 = pmod(xxhash64(key), lit(MBits.toLong))
    val h2 = pmod(xxhash64(key, lit(0x9E3779B9L)), lit(MBits.toLong - 1)) +
      lit(1L) // never a zero step
    (0 until K).map(i => pmod(h1 + lit(i.toLong) * h2, lit(MBits.toLong))
      .cast("int"))
  }

  /** [[posCols]] for ONE key, evaluated on the driver through the
    * SAME Catalyst expression the build pass runs (`XxHash64.eval`
    * over literals) — bit-identical hashing with ZERO Spark jobs, so
    * a probe inside query PLANNING (the catalog's `pushFilters`)
    * costs arithmetic, not a scheduled job per key. Round17Props pins
    * driver positions == expression-codepath positions. */
  private[graft] def positions(key: Long): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    def pmodL(a: Long, n: Long): Long = { val r = a % n; if (r < 0) r + n else r }
    val m = MBits.toLong
    val h1 = pmodL(
      XxHash64(Seq(Literal(key)), 42L).eval().asInstanceOf[Long], m)
    val h2 = pmodL(
      XxHash64(Seq(Literal(key), Literal(0x9E3779B9L)), 42L)
        .eval().asInstanceOf[Long], m - 1L) + 1L
    (0 until K).map(i => pmodL(h1 + i.toLong * h2, m).toInt)
  }

  /** Does `bits` cover every probe position of `key`? */
  private[sources] def covers(bits: Array[Byte], key: Long): Boolean =
    positions(key).forall(pos => (bits(pos >> 3) & (1 << (pos & 7))) != 0)

  /** The whole sidecar for (`v`, `keyCol`), read ONCE: path → bitset.
    * None when no sidecar exists (probes then keep every file). */
  private[sources] def loadSidecar(root: String, v: Int, keyCol: String)
      : Option[Map[String, Array[Byte]]] = {
    val f = bloomFile(root, v, keyCol)
    if (!f.isFile) None
    else Some(new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).map { l =>
        val Array(p, b) = l.split("\t")
        p -> Base64.getDecoder.decode(b)
      }.toMap)
  }

  /** Build the sidecar for the CURRENT version's manifest. One
    * distributed pass; driver state is files × MBits/8 bytes.
    *
    * Hash-parity contract: probes ([[positions]]) hash a LONG literal
    * through `XxHash64`, so the build MUST hash the key column through
    * the same long codepath — `xxhash64` over an INT column takes the
    * int-hash path and yields DIFFERENT positions than the probe
    * (false negatives: files wrongly skipped, rows silently dropped).
    * Integral sub-long columns are therefore widened to LONG before
    * hashing (value-preserving); LONG hashes as-is; TIMESTAMP hashes
    * its epoch-micros long internally, matching the micros the probe
    * literal carries. Any other type refuses loudly — a sidecar that
    * can never be probed correctly must not exist. */
  def build(spark: SparkSession, root: String, keyCol: String): Int = {
    import org.apache.spark.sql.types._
    val v = SnapshotStore.latestVersion(root)
    val files = SnapshotStore.filesAt(root, v)
    val base = spark.read.parquet(files: _*)
    val key = base.schema(keyCol).dataType match {
      case LongType | TimestampType => col(keyCol)
      case IntegerType | ShortType | ByteType => col(keyCol).cast("long")
      case other => throw new graft.QueryError(
        s"bloom key column $keyCol has unsupported type $other " +
          "(supported: integral, timestamp — probes hash long values)")
    }
    val perFile = base
      .select(input_file_name().as("f"), key.as("k"))
      .select(col("f"), explode(array(posCols(col("k")): _*)).as("pos"))
      .groupBy(col("f"))
      .agg(collect_set(col("pos")).as("ps"))
      .collect()
    val lines = perFile.map { r =>
      val path = new java.net.URI(r.getString(0)).getPath
      val bits = new Array[Byte](MBits / 8)
      r.getSeq[Int](1).foreach(p => bits(p >> 3) = (bits(p >> 3) |
        (1 << (p & 7))).toByte)
      s"$path\t${Base64.getEncoder.encodeToString(bits)}"
    }
    Files.write(bloomFile(root, v, keyCol).toPath,
      lines.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    v
  }

  /** Files of version `v` whose Bloom covers every probe position of
    * `key`; files absent from the sidecar (e.g. appended after the
    * build) are conservatively kept. */
  def survivors(spark: SparkSession, root: String, keyCol: String,
      key: Long, version: Option[Int] = None): (Seq[String], Int) = {
    val v = version.getOrElse(SnapshotStore.latestVersion(root))
    val files = SnapshotStore.filesAt(root, v)
    (survivorsAmong(root, keyCol, key, v, files), files.size)
  }

  /** [[survivors]] restricted to an explicit candidate list — the
    * composable piece [[SnapshotRead]] stacks on top of stats
    * pruning (a file already skipped by min/max never needs a Bloom
    * probe). One sidecar read, driver-side probe arithmetic, zero
    * Spark jobs. */
  private[sources] def survivorsAmong(root: String,
      keyCol: String, key: Long, v: Int, files: Seq[String])
      : Seq[String] =
    loadSidecar(root, v, keyCol) match {
      case None => files
      case Some(blooms) =>
        files.filter(p => blooms.get(p).forall(covers(_, key)))
    }

  /** Point lookup: scan only the surviving files. Returns a frame
    * with the snapshot's schema even when nothing survives. */
  def lookup(spark: SparkSession, root: String, keyCol: String,
      key: Long, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(SnapshotStore.latestVersion(root))
    val (keep, _) = survivors(spark, root, keyCol, key, Some(v))
    val all = SnapshotStore.filesAt(root, v)
    if (keep.isEmpty)
      spark.read.parquet(all.head).limit(0).filter(col(keyCol) === key)
    else spark.read.parquet(keep: _*).filter(col(keyCol) === key)
  }
}
