package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve data-layout audit — the continuity upgrade over
  * [[ZOrderLayout]] (x7). Both curves produce identical square files
  * at power-of-4 code boundaries, but real writers split on the
  * TARGET FILE SIZE, not on quadrant-aligned code widths; at a
  * half-quadrant split (odd `fileShift`) a Z-order file is two
  * DISJOINT squares (the Morton curve jumps diagonally between
  * quadrant halves), so its min/max footer spans both and a stripe
  * query hits it twice as often. The Hilbert curve is continuous —
  * every file is one connected region with a tight bounding box —
  * which is exactly why Delta/Iceberg expose Hilbert ordering next
  * to Z-order for their OPTIMIZE layouts.
  *
  * Encoding: the canonical per-level reflect-and-rotate walk
  * (d += s²·((3·rx) XOR ry), then reflect about n−1 and swap when
  * ry = 0), unrolled to `bits` chained projections over named
  * columns (hx, hy, hd). The SAME generated SQL text drives Spark
  * (`expr`) and the DuckDB oracle (a chained CTE per level) — one
  * spelling, two parsers, exact BIGINT arithmetic in both, so the
  * gate pins the encoding bit-for-bit. XOR is spelled arithmetically
  * (3·rx + ry − 2·rx·ry — identical on {0,1}²) so no engine-specific
  * xor builtin is involved. Chained projections keep the expression
  * tree LINEAR in `bits`; textual substitution would go exponential
  * (each level reads hx/hy three times).
  *
  * Scale shape (100 TB): identical to x7 — one 4-value global
  * min/max broadcast, `bits` narrow map-side projections (no
  * shuffle), then one hash aggregate per layout keyed by file id.
  * The real writer range-partitions on the Hilbert code with these
  * boundaries; `bits` sizes the grid, `fileShift` sizes files.
  * HilbertLayoutSpec pins bijection + unit-step adjacency (the
  * space-filling-curve property) on the full bits=4 grid.
  */
object HilbertLayout {

  /** One reflect-rotate level: SQL rewrite expressions for (hx, hy,
    * hd) at level k (s = 2^k), referencing the PREVIOUS level's
    * columns. Shared verbatim by Spark and DuckDB. */
  def stepSql(bits: Int, k: Int): (String, String, String) = {
    val n = 1L << bits
    val s = 1L << k
    val rx = s"((hx >> $k) & 1)"
    val ry = s"((hy >> $k) & 1)"
    val hd = s"hd + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry)"
    val hx = s"CASE WHEN $ry = 1 THEN hx WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END"
    val hy = s"CASE WHEN $ry = 1 THEN hy WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END"
    (hx, hy, hd)
  }

  /** Append column `out` = Hilbert code of (b1, b2) on the 2^bits
    * grid; `bits` chained narrow projections, no shuffle. */
  def withHilbert(df: DataFrame, out: String, bits: Int): DataFrame = {
    val keep = df.columns.filterNot(Set("hx", "hy", "hd")).map(col).toSeq
    val start = df.select(keep :+ col("b1").as("hx") :+ col("b2").as("hy")
      :+ lit(0L).as("hd"): _*)
    val walked = (bits - 1 to 0 by -1).foldLeft(start) { (cur, k) =>
      val (hx, hy, hd) = stepSql(bits, k)
      cur.select(keep :+ expr(hx).as("hx") :+ expr(hy).as("hy")
        :+ expr(hd).as("hd"): _*)
    }
    walked.select(keep :+ col("hd").as(out): _*)
  }

  /** DuckDB CTE chain `h0 .. h<bits>` computing the identical walk
    * from a relation `from`(b1, b2); the last CTE exposes hd. */
  def duckHilbertCtes(from: String, bits: Int): String = {
    val h0 = s"h0 AS (SELECT b1, b2, b1 AS hx, b2 AS hy, " +
      s"CAST(0 AS BIGINT) AS hd FROM $from)"
    val levels = (bits - 1 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val (hx, hy, hd) = stepSql(bits, k)
      s"h${i + 1} AS (SELECT b1, b2, $hx AS hx, $hy AS hy, $hd AS hd FROM h$i)"
    }
    (h0 +: levels).mkString(",\n")
  }

  /** Three-row audit frame: layout ∈ {hilbert, zorder, linear} with
    * file counts, stripe-query hits and the scanned-row fraction.
    * The stripe (full-width half-range in dim1 × a 2·(cells/64)-cell
    * band straddling the center of dim2) is the shape where Z-order's
    * disjoint half-quadrant files pay double — the honest case FOR
    * Hilbert, as x7's straddling box is the honest case for Z. */
  def audit(df: DataFrame, dim1: Column, dim2: Column,
      bits: Int = 8, fileShift: Int = 11): DataFrame = {
    require(bits > 0 && 2 * bits + 1 < 63, s"bits out of range: $bits")
    val cells = 1L << bits
    val (lo1, hi1) = (cells / 4, cells * 3 / 4 - 1)
    val (lo2, hi2) = (cells / 2 - cells / 64, cells / 2 + cells / 64 - 1)

    val base = df
      .select(dim1.cast("long").as("v1"), dim2.cast("long").as("v2"))
      .where(col("v1").isNotNull && col("v2").isNotNull)
    val stats = base.agg(
      min("v1").as("mn1"), max("v1").as("mx1"),
      min("v2").as("mn2"), max("v2").as("mx2"))
    val quant = base.crossJoin(broadcast(stats))
      .select(
        expr(s"(v1 - mn1) * ${cells}L div (mx1 - mn1 + 1)").as("b1"),
        expr(s"(v2 - mn2) * ${cells}L div (mx2 - mn2 + 1)").as("b2"))
    // snapshot: three per-layout summaries re-read this frame — the
    // barrier keeps the audit at ONE quantize+walk pass over the
    // table instead of six scans (and stays out of the session cache
    // manager, per the materialize-vs-snapshot contract)
    val coded = graft.util.Caches.snapshot(
      withHilbert(quant, "h_code", bits)
        .select(col("b1"), col("b2"),
          shiftright(col("h_code"), fileShift).as("f_h"),
          shiftright(ZOrderLayout.mortonCol(col("b1"), col("b2"), bits),
            fileShift).as("f_z"),
          shiftright(col("b1") * cells + col("b2"), fileShift)
            .as("f_lin")))

    val inBox = col("b1").between(lo1, hi1) && col("b2").between(lo2, hi2)
    def summarize(fileCol: String, name: String): DataFrame = {
      val hit = col("f_mn1") <= hi1 && col("f_mx1") >= lo1 &&
        col("f_mn2") <= hi2 && col("f_mx2") >= lo2
      coded.groupBy(col(fileCol))
        .agg(
          min("b1").as("f_mn1"), max("b1").as("f_mx1"),
          min("b2").as("f_mn2"), max("b2").as("f_mx2"),
          count(lit(1)).as("f_rows"),
          sum(when(inBox, 1L).otherwise(0L)).as("f_box"))
        .agg(
          count(lit(1)).as("n_files"),
          sum("f_rows").as("n_rows"),
          sum("f_box").as("box_rows"),
          sum(when(hit, 1L).otherwise(0L)).as("files_hit"),
          sum(when(hit, col("f_rows")).otherwise(0L)).as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_files"), col("files_hit"),
          col("n_rows"), col("box_rows"), col("rows_scanned"),
          (col("rows_scanned").cast("double") / col("n_rows"))
            .as("scan_frac"))
    }
    summarize("f_h", "hilbert")
      .unionAll(summarize("f_z", "zorder"))
      .unionAll(summarize("f_lin", "linear"))
  }
}
