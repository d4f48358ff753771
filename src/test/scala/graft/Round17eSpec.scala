package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextUnigramLm

/** Round-17 fifth wave: the soft-EM forward-backward E-step. */
class Round17eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def microLn(p: Double): Long =
    math.floor(math.log(p) * 1e6 + 0.5).toLong

  test("posteriors match the hand-computed two-path lattice") {
    // word "ab": paths [a,b] (0.4*0.4 = 0.16) and [ab] (0.2);
    // Z = 0.36, P(ab edge) = 5/9, P(a) = P(b) = 4/9
    val model = Map("a" -> microLn(0.4), "b" -> microLn(0.4),
      "ab" -> microLn(0.2))
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    val edges = TextUnigramLm.softEdges(words, model)
      .collect().map(r => (r.getString(2), r.getLong(3))).toMap
    def closeTo(got: Long, p: Double): Boolean =
      math.abs(got - p * 1e6) <= 20 // micro-nat quantization of the lps
    assert(closeTo(edges("ab"), 5.0 / 9), s"got ${edges("ab")}")
    assert(closeTo(edges("a"), 4.0 / 9))
    assert(closeTo(edges("b"), 4.0 / 9))
  }

  test("every char position carries total posterior mass 1") {
    // whatever the lattice, each path covers each position exactly
    // once, so edges covering a position must sum to Z/Z = 1 — the
    // flat-out correctness invariant of forward-backward
    val model = Map("a" -> microLn(0.2), "b" -> microLn(0.2),
      "c" -> microLn(0.1), "ab" -> microLn(0.2), "bc" -> microLn(0.1),
      "abc" -> microLn(0.1), "ca" -> microLn(0.1))
    val words = Seq(("abcab", 1L), ("cab", 1L), ("aaaa", 1L))
      .toDF("word", "freq")
    val rows = TextUnigramLm.softEdges(words, model)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (word, es) =>
      // each path covers each position exactly once, so
      // Σ_edges posterior·len(piece) = Σ_positions 1 = len(word);
      // tolerance = the per-edge half-micro quantization
      val totalMass = es.map { case (_, p, w) => p.length * w }.sum
      assert(math.abs(totalMass - word.length * 1000000L) <=
        4L * word.length,
        s"$word: edge mass $totalMass != ${word.length} positions")
    }
  }

  test("a dominant path makes soft counts converge to hard counts") {
    val model = Map("x" -> microLn(0.001), "y" -> microLn(0.001),
      "xy" -> microLn(0.99))
    val words = Seq(("xyxy", 7L)).toDF("word", "freq")
    val soft = TextUnigramLm.softCounts(words, model)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // hard path is [xy, xy]: soft expected count ≈ 2 per word × 7
    assert(math.abs(soft("xy") - 14L * 1000000L) <= 14 * 1000,
      s"got ${soft("xy")}")
    assert(soft.getOrElse("x", 0L) < 20000L * 7)
  }

  test("trainSoft respects the vocab budget and the singles floor") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the quick brown fox ${i % 5} jumps"))
      .toDF("doc_id", "text")
    val (model, stats, seg) =
      TextUnigramLm.trainSoft(docs, targetMultis = 6)
    assert(model.count(_._1.length > 1) <= 6)
    val chars = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .flatMap(_.toCharArray).map(_.toString).toSet
    assert(chars.forall(model.contains), "every single char stays priced")
    assert(stats.size == TextUnigramLm.Iterations)
    assert(seg.count() > 0)
    // the returned table is the Viterbi E-step under the FINAL model
    val ll = seg.agg(sum(col("freq") * col("score_micro")).cast("long"))
      .head().getLong(0)
    assert(ll == stats.last.loglik_micro)
  }
}
