package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.api.{FetchParams, TradesApi}

class TradesApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 6 trades, one duplicated trade_id, two underlyings. */
  private lazy val trades: DataFrame = {
    import spark.implicits._
    Seq(
      ("t1", "BTC", "C", "2024-01-01 10:00:00", 9000.0, 1.0),
      ("t2", "BTC", "P", "2024-01-01 11:00:00", 9100.0, 2.0),
      ("t2", "BTC", "P", "2024-01-01 11:00:00", 9100.0, 2.0), // dup
      ("t3", "ETH", "C", "2024-01-02 09:00:00", 500.0, 3.0),
      ("t4", "BTC", "C", "2024-01-02 10:00:00", 9200.0, 4.0),
      ("t5", "BTC", "C", "2024-01-03 10:00:00", 9300.0, 5.0))
      .map { case (id, u, ot, t, k, amt) =>
        (id, u, ot, ts(t), k, amt, java.sql.Date.valueOf("2024-02-01"))
      }
      .toDF("trade_id", "underlying", "option_type", "timestamp",
        "strike", "amount", "expiry")
  }

  // ---- F2 fail-fast validation: every violation raises the typed
  // QueryError (reference exceptions.py), catchable via the
  // GraftException root ----
  test("unbounded fetch refused") {
    intercept[QueryError] {
      TradesApi.fetch(trades, FetchParams(underlying = Some("BTC")))
    }
  }
  test("malformed date-only input raises QueryError") {
    intercept[QueryError] {
      TradesApi.fetch(trades, FetchParams(start = Some("2024-13-01"),
        limit = Some(10)))
    }
  }

  test("empty-string params refused") {
    intercept[QueryError] {
      TradesApi.fetch(trades, FetchParams(underlying = Some("  "),
        limit = Some(10)))
    }
  }
  test("start after end refused") {
    intercept[QueryError] {
      TradesApi.fetch(trades, FetchParams(
        start = Some("2024-02-01"), end = Some("2024-01-01")))
    }
  }
  test("negative limit refused") {
    intercept[QueryError] {
      TradesApi.fetch(trades, FetchParams(limit = Some(-1)))
    }
  }
  test("validation errors are catchable at the GraftException root") {
    val e = intercept[GraftException] {
      TradesApi.fetch(trades, FetchParams(limit = Some(-7)))
    }
    assert(e.isInstanceOf[QueryError])
    assert(e.getMessage.contains("limit must be >= 0"))
  }

  // ---- F3 normalization ----
  test("date-only end expands to next-day midnight") {
    assert(TradesApi.normalizeTimestamp("2024-01-04", isEnd = true)
      == "2024-01-05 00:00:00.000")
    assert(TradesApi.normalizeTimestamp("2024-01-04", isEnd = false)
      == "2024-01-04 00:00:00.000")
    assert(TradesApi.normalizeTimestamp("2024-01-04 13:30:00", isEnd = true)
      == "2024-01-04 13:30:00.000")
    assert(TradesApi.normalizeTimestamp("2024-01-04T13:30:00", isEnd = true)
      == "2024-01-04 13:30:00.000")
  }

  // ---- S8 composition ----
  test("filters + FINAL dedup + desc order + limit") {
    val out = TradesApi.fetch(trades, FetchParams(
      underlying = Some("BTC"),
      start = Some("2024-01-01"),
      end = Some("2024-01-02"), // inclusive day via next-midnight expansion
      limit = Some(10)))
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("trade_id")).toSeq
      == Seq("t4", "t2", "t1")) // newest first, t5 outside range, t2 deduped
  }

  test("useFinal=false keeps duplicates") {
    val out = TradesApi.fetch(trades, FetchParams(
      underlying = Some("BTC"), limit = Some(100), useFinal = false))
    assert(out.count() == 5) // 4 distinct BTC + 1 dup
  }

  test("strike and option_type filters compose") {
    val out = TradesApi.fetch(trades, FetchParams(
      optionType = Some("C"), strike = Some(9200.0), limit = Some(10)))
    assert(out.collect().map(_.getAs[String]("trade_id")).toSeq == Seq("t4"))
  }

  test("fetch plans a top-k, not a global sort") {
    val out = TradesApi.fetch(trades, FetchParams(
      underlying = Some("BTC"), limit = Some(2)))
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$physical")
  }
}
