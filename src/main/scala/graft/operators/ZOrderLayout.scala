package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data-layout audit — the multi-dimensional
  * file-skipping story the reference gets from ClickHouse's primary
  * key only in ONE dimension (`clickhouse/schema.py` orders the table
  * by `(instrument_name, timestamp)`, so a time-range × strike-range
  * box query still scans every instrument granule in the time range).
  * Interleaving the bits of two quantized dimensions gives files
  * whose (min,max) footer ranges are tight in BOTH dimensions, so a
  * 2-D box query prunes ~|box|/|space| of the files instead of the
  * ~|box₁| stripe a single-dimension sort layout reads.
  *
  * The audit quantizes two numeric columns onto a 2^bits × 2^bits
  * grid, codes every row under (a) the Morton curve and (b) the
  * lexicographic (dim1-major) curve, assigns files as contiguous
  * code ranges (`code >> fileShift` — exactly how a z-range writer
  * splits output), computes per-file min/max footers, and replays a
  * centered box query (the middle quarter of each dimension, chosen
  * to STRADDLE the top-level quadrant boundary — the z-curve's worst
  * alignment, so the measured win is the honest lower bound) against
  * those footers. Emitted: per-layout occupied-file count, files hit,
  * rows scanned (footer pruning granularity) and the exact box rows.
  *
  * Scale shape (100 TB): one 4-value global min/max aggregate
  * (broadcast back as a 1-row join), then ONE hash aggregate per
  * layout keyed by file id — no sort, no window, no per-key skew
  * (file populations are grid-cell unions). The real writer would
  * range-partition on the z-code with these same boundaries; the
  * audit proves the skipping ratio that layout buys. `bits` and
  * `fileShift` are the scale levers: bits sizes the grid to data
  * cardinality, fileShift sizes files (code-range width) to the
  * target file size.
  */
object ZOrderLayout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * long columns: dim1 occupies odd bit positions, dim2 even. */
  def mortonCol(b1: Column, b2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** The identical interleave spelled in DuckDB SQL (same bit ops,
    * same operand order — exact integer arithmetic on both engines). */
  def duckMorton(b1: String, b2: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($b1 >> $i) & 1) << ${2 * i + 1}) + ((($b2 >> $i) & 1) << ${2 * i})"
    }.mkString("(", " + ", ")")

  /** Two-row audit frame: layout ∈ {zorder, linear} with file counts,
    * box-query hit counts and the scanned-row fraction. `dim1`/`dim2`
    * must cast losslessly to long (epoch seconds, integer prices). */
  def audit(df: DataFrame, dim1: Column, dim2: Column,
      bits: Int = 8, fileShift: Int = 10): DataFrame = {
    require(bits > 0 && 2 * bits + 1 < 63, s"bits out of range: $bits")
    val cells = 1L << bits
    val (lo, hi) = (cells * 3 / 8, cells * 5 / 8 - 1)

    val base = df
      .select(dim1.cast("long").as("v1"), dim2.cast("long").as("v2"))
      .where(col("v1").isNotNull && col("v2").isNotNull)
    val stats = base.agg(
      min("v1").as("mn1"), max("v1").as("mx1"),
      min("v2").as("mn2"), max("v2").as("mx2"))
    // grid cell = floor((v - min) * cells / (max - min + 1)); operands
    // are non-negative so Spark's truncating `div` == floor == DuckDB //
    val coded = base.crossJoin(broadcast(stats))
      .select(
        expr(s"(v1 - mn1) * ${cells}L div (mx1 - mn1 + 1)").as("b1"),
        expr(s"(v2 - mn2) * ${cells}L div (mx2 - mn2 + 1)").as("b2"))
      .select(col("b1"), col("b2"),
        shiftright(mortonCol(col("b1"), col("b2"), bits), fileShift)
          .as("f_z"),
        shiftright(col("b1") * cells + col("b2"), fileShift).as("f_lin"))

    val inBox = col("b1").between(lo, hi) && col("b2").between(lo, hi)
    def summarize(fileCol: String, name: String): DataFrame = {
      val hit = col("f_mn1") <= hi && col("f_mx1") >= lo &&
        col("f_mn2") <= hi && col("f_mx2") >= lo
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
    summarize("f_z", "zorder").unionAll(summarize("f_lin", "linear"))
  }
}
