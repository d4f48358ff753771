package graft.validation

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

import graft.operators.DataQuality
import graft.schema._

/** Human-readable validation / coverage reporting and the capability
  * probe — the reference's `validation/reporter.py:32-130` report
  * format and `probe.py:47-139` `describe()` surface, re-expressed
  * over the engine's own operators: the Data Quality section renders
  * A10 (`DataQuality.qualityMetrics`), the Gap Analysis section W1
  * (`DataQuality.gapAnalysis`), and the Infrastructure section the
  * S10 schema diff (`SchemaIntrospector.diff`). The metric collects
  * are driver-sized by construction (one A10 row; gaps capped by the
  * operator's top-k limit). */
object Reporter {

  val ReportWidth = 60
  val MaxGapsDisplayed = 5

  final case class InfraStatus(
      valid: Boolean,
      tableExists: Boolean,
      errors: Seq[String],
      sortColumns: Seq[String],
      partitionColumns: Seq[String])

  /** S10-backed infrastructure status: spec vs an observed schema
    * (None = table missing entirely). */
  def infraStatus(spec: SchemaSpec, actual: Option[StructType]): InfraStatus =
    actual match {
      case None => InfraStatus(valid = false, tableExists = false,
        errors = Seq(s"table ${spec.qualified} does not exist"),
        sortColumns = spec.sortBy, partitionColumns = spec.partitionBy)
      case Some(st) =>
        val errs = SchemaIntrospector.diff(spec, st).map {
          case MissingColumn(c) => s"missing column: $c"
          case ExtraColumn(c) => s"unexpected column: $c"
          case TypeMismatch(c, e, a) =>
            s"type mismatch on $c: expected ${e.sql}, found ${a.sql}"
          case NullabilityMismatch(c, e, _) =>
            s"nullability mismatch on $c: expected nullable=$e"
        }
        InfraStatus(errs.isEmpty, tableExists = true, errs,
          spec.sortBy, spec.partitionBy)
    }

  private def epDate(ep: Long): String =
    java.time.LocalDate.ofEpochDay(ep / 86400).toString

  /** The reference report layout: header with mode indicator,
    * Infrastructure, Data Quality, optional Gap Analysis (top
    * [[MaxGapsDisplayed]] with an overflow line), footer. */
  def formatValidationReport(
      infra: InfraStatus,
      quality: Row,
      modeIndicator: String,
      gaps: Option[Seq[Row]]): String = {
    val bar = "=" * ReportWidth
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += bar
    lines += s"E2E Validation Report $modeIndicator"
    lines += bar

    lines += ""
    lines += "Infrastructure:"
    if (infra.valid) lines += "  [OK] Schema validated"
    else {
      lines += "  [!!] Schema validation failed"
      infra.errors.foreach(e => lines += s"       - $e")
    }
    if (infra.tableExists) lines += "  [OK] Table exists"
    if (infra.sortColumns.nonEmpty)
      lines += s"  [OK] Sort keys: ${infra.sortColumns.mkString(", ")}"
    if (infra.partitionColumns.nonEmpty)
      lines += s"  [OK] Partitioned by: ${infra.partitionColumns.mkString(", ")}"

    lines += ""
    lines += "Data Quality:"
    val total = quality.getAs[Long]("total_rows")
    val unique = quality.getAs[Long]("unique_trades")
    lines += f"  Total rows: $total%,d"
    lines += f"  Unique trades: $unique%,d " +
      f"(${quality.getAs[Double]("dedup_rate") * 100}%.1f%% deduped)"
    if (total > 0) {
      lines += s"  Date range: ${epDate(quality.getAs[Long]("earliest_ep"))}" +
        s" to ${epDate(quality.getAs[Long]("latest_ep"))}"
      lines += s"  Date span: ${quality.getAs[Int]("date_span_days")} days"
    }
    lines += f"  Avg trades/hour: ${quality.getAs[Double]("avg_trades_per_hour")}%.1f"
    lines += f"  Null IV: ${quality.getAs[Long]("null_iv_count")}%,d " +
      f"(${quality.getAs[Double]("null_iv_rate") * 100}%.2f%%)"
    lines += f"  Null index: ${quality.getAs[Long]("null_index_count")}%,d " +
      f"(${quality.getAs[Double]("null_index_rate") * 100}%.2f%%)"

    gaps.foreach { gs =>
      lines += ""
      lines += "Gap Analysis:"
      if (gs.nonEmpty) {
        lines += s"  Gaps found: ${gs.length}"
        gs.take(MaxGapsDisplayed).foreach { g =>
          lines += s"    ${epDate(g.getAs[Long]("gap_start"))}" +
            s" - ${epDate(g.getAs[Long]("gap_end"))}" +
            s" (${g.getAs[Long]("gap_hours")}h)"
        }
        if (gs.length > MaxGapsDisplayed)
          lines += s"    ... and ${gs.length - MaxGapsDisplayed} more"
      } else lines += "  No significant gaps found"
    }

    lines += ""
    lines += bar
    lines.mkString("\n")
  }

  /** One-call summary over a trades DataFrame: compute A10 + (when
    * verbose) W1, diff the observed schema against the spec, render. */
  def validationSummary(
      trades: DataFrame,
      spec: SchemaSpec = TradesSchema.spec,
      modeIndicator: String = "[parquet:local]",
      verbose: Boolean = false,
      gapThresholdHours: Int = 4): String = {
    val infra = infraStatus(spec, Some(trades.schema))
    val quality = DataQuality.qualityMetrics(trades).collect().head
    val gaps =
      if (verbose)
        Some(DataQuality.gapAnalysis(trades, gapThresholdHours).collect().toSeq)
      else None
    formatValidationReport(infra, quality, modeIndicator, gaps)
  }

  /** Capability probe (`probe.py:47-139`): what data this engine
    * serves and the entry points a discovering client can call,
    * rendered from the live schema spec so it never drifts. */
  def describe(): String = {
    val spec = TradesSchema.spec
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += "Data Sources:"
    lines += s"  ${spec.qualified}: historical BTC/ETH options trades"
    lines += s"    partitioned by ${spec.partitionBy.mkString(", ")};" +
      s" sorted by ${spec.sortBy.mkString(", ")}"
    lines += ""
    lines += "Capabilities:"
    lines += "  fetch_trades — graft.api.TradesApi.fetchTrades(...)"
    lines += "    filters: underlying, start/end date, option_type," +
      " expiry, strike, limit; FINAL dedup toggle"
    lines += "  collect_trades — graft.sources.Backfill.collect(...)"
    lines += "    paged history backfill with checkpointed resume and" +
      " idempotent batch inserts"
    lines += "  streaming_ingest — graft.streaming.StreamingIngest" +
      ".startIngestTo(...)"
    lines += "    watermarked dedup into a mode-dispatched BatchSink"
    lines += ""
    lines += "Schema:"
    spec.columns.foreach { c =>
      val comment = if (c.comment.nonEmpty) s" — ${c.comment}" else ""
      lines += s"  ${c.name}: ${c.dataType.sql}" +
        s"${if (c.nullable) "" else " NOT NULL"}$comment"
    }
    lines += ""
    lines += "Instrument format: {UNDERLYING}-{DDMMMYY}-{STRIKE}-{C|P}"
    lines += "  examples: BTC-27DEC24-100000-C, ETH-28MAR25-5000-P"
    lines.mkString("\n")
  }
}
