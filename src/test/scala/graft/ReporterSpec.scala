package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.schema.{ColumnSpec, SchemaSpec, TradesSchema}
import graft.validation.Reporter

/** Structural tests for the validation report + capability probe:
  * sections present, rates formatted, gap list truncated, schema
  * drift surfaced. (No oracle: this is a rendering surface over
  * already-gated metrics.) */
class ReporterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 8 trades 6 hours apart -> 7 gaps above the 4 h threshold. */
  private lazy val trades: DataFrame = {
    import spark.implicits._
    (0 until 8).map { i =>
      (s"t$i", new java.sql.Timestamp(1700000000000L + i * 6 * 3600 * 1000L),
        if (i % 4 == 0) None else Some(0.5), Some(50000.0), "BTC")
    }.toDF("trade_id", "timestamp", "iv", "index_price", "underlying")
  }

  /** A spec that exactly matches the fixture schema (valid path). */
  private lazy val matchingSpec = SchemaSpec(
    database = "t", table = "trades",
    columns = trades.schema.fields.toSeq
      .map(f => ColumnSpec(f.name, f.dataType, f.nullable)),
    sortBy = Seq("timestamp"))

  test("report renders header, infra OK, and formatted quality rates") {
    val r = Reporter.validationSummary(trades, matchingSpec)
    assert(r.contains("E2E Validation Report [parquet:local]"))
    assert(r.contains("[OK] Schema validated"))
    assert(r.contains("[OK] Table exists"))
    assert(r.contains("[OK] Sort keys: timestamp"))
    assert(r.contains("Total rows: 8"))
    assert(r.contains("Unique trades: 8 (100.0% deduped)"))
    assert(r.contains("Date range: 2023-11-14 to 2023-11-16"))
    assert(r.contains("Null IV: 2 (25.00%)"))
    assert(!r.contains("Gap Analysis:")) // only under verbose
  }

  test("verbose report truncates the gap list at MaxGapsDisplayed") {
    val r = Reporter.validationSummary(trades, matchingSpec, verbose = true)
    assert(r.contains("Gap Analysis:"))
    assert(r.contains("Gaps found: 7"))
    assert(r.contains("(6h)"))
    assert(r.contains("... and 2 more"))
  }

  test("schema drift flips the infra section to failure with details") {
    val r = Reporter.validationSummary(trades, TradesSchema.spec)
    assert(r.contains("[!!] Schema validation failed"))
    assert(r.contains("missing column: instrument_name"))
  }

  test("a missing table reports invalid without collecting anything") {
    val s = Reporter.infraStatus(TradesSchema.spec, None)
    assert(!s.valid && !s.tableExists)
    assert(s.errors.exists(_.contains("does not exist")))
  }

  test("describe() probe lists sources, capabilities, and the schema") {
    val d = Reporter.describe()
    assert(d.contains("Data Sources:"))
    assert(d.contains("deribit.options_trades"))
    assert(d.contains("Capabilities:"))
    assert(d.contains("fetch_trades"))
    assert(d.contains("collect_trades"))
    assert(d.contains("streaming_ingest"))
    assert(d.contains("Schema:"))
    assert(d.contains("instrument_name: STRING NOT NULL"))
    assert(d.contains("Instrument format:"))
  }
}
