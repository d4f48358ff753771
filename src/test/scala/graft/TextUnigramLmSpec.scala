package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextUnigramLm

/** Golden tests for the unigram-LM tokenizer: the Viterbi DP's argmax
  * and tie-breaks on a hand-checkable model (the same cases were run
  * through the DuckDB oracle fold while authoring it — both engines
  * produce these exact rows), and hard-EM's likelihood ascent on a
  * tiny corpus. */
class TextUnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def words(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toDF("word", "freq")
  }

  private val model = Map(
    "a" -> -1000000L, "b" -> -2000000L, "ab" -> -1500000L,
    "c" -> -2500000L, "abc" -> -2400000L)

  test("viterbiBest picks the max-likelihood segmentation (golden vs DuckDB fold)") {
    val seg = TextUnigramLm.segment(
      words("abcab" -> 3L, "ba" -> 2L, "abab" -> 1L, "x" -> 1L), model)
      .select(col("word"), col("score_micro"),
        concat_ws(" ", col("pieces")).as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(seg == Seq(
      ("abab", -3000000L, "ab ab"),       // beats a·b·a·b (-6e6), ab·a·b (-4.5e6)
      ("abcab", -3900000L, "abc ab"),     // abc(-2.4e6)+ab(-1.5e6)
      ("ba", -3000000L, "b a"),
      ("x", TextUnigramLm.MinLpMicro, "x"))) // unseen char: floor fallback, never a crash
  }

  test("score ties break toward the longer piece") {
    val m = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    val seg = TextUnigramLm.segment(words("ab" -> 1L), m)
      .select(concat_ws(" ", col("pieces"))).head().getString(0)
    assert(seg == "ab", "a·b and ab score equal; the longer piece wins")
  }

  test("hard-EM ascends the corpus likelihood after the prune and counts reconcile") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat ate the rat", "en"),
      (3L, "a rat sat on a cat", "en"),
      (4L, "the the the cat cat", "en"))
      .toDF("doc_id", "text", "lang")
    val (m, stats, seg) = TextUnigramLm.train(docs)
    assert(stats.size == TextUnigramLm.Iterations)
    val post = stats.drop(1).map(_.loglik_micro)
    post.zip(post.drop(1)).foreach { case (a, b) =>
      assert(a <= b, s"post-prune loglik must ascend: $stats")
    }
    // every single char of the corpus stays in the model (coverage)
    val chars = docs.select(explode(split(
      graft.operators.TextDedup.normText(col("text")), "")).as("ch"))
      .filter(col("ch") =!= " ")
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.forall(m.contains), "all corpus chars stay in the model")
    // piece-count mass equals segmented token mass
    val tokMass = seg.agg(sum(col("freq") * size(col("pieces"))))
      .head().getLong(0)
    val cntMass = TextUnigramLm.pieceCounts(seg)
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(tokMass == cntMass)
    // high-frequency words compress below char-level
    val the = seg.filter(col("word") === "the")
      .select(size(col("pieces"))).head().getInt(0)
    assert(the < 3, "frequent word 'the' must merge below its char count")
  }

  test("quantizer matches the oracle spelling floor(ln(c/t)*1e6 + 0.5)") {
    assert(TextUnigramLm.quantLn(1, math.E.toLong) < 0)
    assert(TextUnigramLm.quantLn(5, 10) ==
      math.floor(math.log(0.5) * 1e6 + 0.5).toLong)
    assert(TextUnigramLm.quantLn(7, 7) == 0L)
  }
}
