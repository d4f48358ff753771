package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BlocklistScan, HoltLinear, MarketBasket}

/** Round-15 second wave: market-basket mining, Holt linear smoothing,
  * and the Aho–Corasick blocklist scan. */
class Round15bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- MarketBasket ----

  private def lines(rows: (Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey")

  test("association rules: planted pair has exact support/conf/lift") {
    // 10 baskets: item 1 in 6 of them, item 2 in 4, together in 3.
    val rows =
      (1L to 6L).map(b => (b, 1L)) ++
        Seq((1L, 2L), (2L, 2L), (3L, 2L), (7L, 2L)) ++
        (7L to 10L).map(b => (b, 99L + b)) // singleton fillers
    val out = MarketBasket.rules(lines(rows: _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("item_a") == 1L && r.getAs[Long]("item_b") == 2L)
    assert(r.getAs[Long]("pair_supp") == 3L)
    assert(r.getAs[Long]("supp_a") == 6L && r.getAs[Long]("supp_b") == 4L)
    assert(r.getAs[Double]("conf_ab") == 0.5)
    assert(r.getAs[Double]("conf_ba") == 0.75)
    // lift = 3*10 / (6*4) = 1.25
    assert(r.getAs[Double]("lift") == 1.25)
  }

  test("basket-width cap drops mega-basket pairs but keeps its item supports") {
    // basket 1 has 5 items (over a cap of 4) and would alone push the
    // (1,2) pair over threshold; three clean baskets carry it instead
    val mega = (1L to 5L).map(i => (1L, i))
    val clean = Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L))
    val out = MarketBasket.rules(lines(mega ++ clean: _*), maxBasket = 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("pair_supp") == 3L, "mega-basket pairs excluded")
    // supports still count the mega basket (supp is per-item, linear)
    assert(r.getAs[Long]("supp_a") == 4L && r.getAs[Long]("supp_b") == 4L)
  }

  test("cosine similarity: identical item pair scores 1.0, ordering deterministic") {
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), // 1,2 always together
      (3L, 3L), (3L, 1L)) // 1,3 weaker
    val out = MarketBasket.similarity(lines(rows: _*), k = 10).collect()
    assert(out.head.getAs[Long]("item_a") == 1L &&
      out.head.getAs[Long]("item_b") == 2L)
    // sim(1,2) = 2/sqrt(3*2); sim(1,3) = 1/sqrt(3*1)
    assert(out.head.getAs[Double]("cosine") == 2.0 / math.sqrt(6.0))
    assert(out.length == 2)
  }

  // ---- HoltLinear ----

  private def daily(rows: (String, Long, Double)*) =
    rows.toDF("underlying", "day_start", "y")

  test("Holt on a constant series: level = c, trend = 0, sse = 0") {
    val out = HoltLinear.fit(daily(
      (1L to 8L).map(d => ("BTC", d * 86400L, 7.25)): _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("level") == 7.25)
    assert(r.getAs[Double]("trend") == 0.0)
    assert(r.getAs[Double]("fc5") == 7.25)
    assert(r.getAs[Double]("sse") == 0.0)
  }

  test("Holt two-point update matches hand algebra exactly") {
    // init on y1=0 (t1=0, b=0); step y2=1: e=1, b=1/8, l=1/4,
    // t1=3/8, sse=1 — all exact binary fractions
    val r = HoltLinear.fit(daily(("X", 0L, 0.0), ("X", 86400L, 1.0)))
      .collect().head
    assert(r.getAs[Double]("trend") == 0.125)
    assert(r.getAs[Double]("level") == 0.25)
    assert(r.getAs[Double]("sse") == 1.0)
    assert(r.getAs[Double]("fc5") == 0.25 + 5.0 * 0.125)
  }

  test("Holt tracks a linear trend: trend converges to the slope") {
    val slope = 0.5
    val out = HoltLinear.fit(daily(
      (1L to 60L).map(d => ("BTC", d * 86400L, d * slope)): _*))
      .collect().head
    assert(math.abs(out.getAs[Double]("trend") - slope) < 0.05)
    // 5-step forecast continues the line
    val expected = 60L * slope + 5 * slope
    assert(math.abs(out.getAs[Double]("fc5") - expected) < 0.6)
  }

  // ---- BlocklistScan ----

  test("automaton matches the classic he/she/his/hers example") {
    val ac = new BlocklistScan.Automaton(Seq("he", "she", "his", "hers"))
    val c = ac.scan("ushers")
    assert(c.toSeq == Seq(1L, 1L, 0L, 1L)) // he, she, hers
  }

  test("automaton counts equal brute force on random texts") {
    val pats = Seq("ab", "abc", "bca", "c", "cab")
    val ac = new BlocklistScan.Automaton(pats)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val t = (1 to 50).map(_ => "abc" (rnd.nextInt(3))).mkString
      val brute = pats.map { p =>
        (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong
      }
      assert(ac.scan(t).toSeq == brute, s"text=$t")
    }
  }

  test("default patterns are all borderless (oracle replace-count equivalence)") {
    BlocklistScan.Patterns.foreach { p =>
      (1 until p.length).foreach { l =>
        assert(p.take(l) != p.takeRight(l),
          s"pattern '$p' has a border of length $l — AC count would " +
            "diverge from the oracle's non-overlapping replace count")
      }
    }
  }

  test("audit surfaces zero-hit patterns and exact counts") {
    val docs = Seq(
      (1L, "spark spark vector"),
      (2L, "big table scan slow"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = BlocklistScan.audit(spark, docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("spark") == ((1L, 2L)))
    assert(out("vector") == ((1L, 1L)))
    assert(out("big table") == ((1L, 1L)))
    assert(out("scan slow") == ((1L, 1L)))
    assert(out("merge batch") == ((0L, 0L)))
    assert(out.size == BlocklistScan.Patterns.size)
  }
}
