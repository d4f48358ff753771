package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextUnigramLm

/** Pins the prune-loss machinery: the driver-side self-exclusion DP
  * must equal the distributed Viterbi expression run under the
  * piece-removed model — the identity the loss ranking and its SQL
  * oracle both stand on. */
class UnigramLossSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sparkScore(word: String, model: Map[String, Long]): Long =
    spark.range(1)
      .select(TextUnigramLm.viterbiBest(lit(word), model)
        .getField("sc").as("sc"))
      .head.getLong(0)

  test("altScoreMicro == Spark Viterbi under the piece-removed model") {
    val model = Map("a" -> -100L, "b" -> -200L, "c" -> -300L,
      "ab" -> -150L, "ba" -> -90L, "aba" -> -50L, "bc" -> -120L)
    for (p <- Seq("ab", "ba", "aba", "bc")) {
      assert(TextUnigramLm.altScoreMicro(p, model, p)
        == sparkScore(p, model - p), s"piece $p")
    }
  }

  test("alt-score identity holds on random lattices") {
    val rnd = new scala.util.Random(16)
    val chars = "abc"
    for (_ <- 1 to 60) {
      val pieces = (for {
        len <- 1 to TextUnigramLm.MaxPieceLen
        _ <- 1 to 3
      } yield (1 to len).map(_ => chars(rnd.nextInt(3))).mkString).distinct
      // some singles priced at the floor — the regime where the
      // floored whole-piece candidate can beat a path through
      // floored singles (the round-16 driver-DP bug's trigger)
      val model = (chars.map(_.toString) ++ pieces).distinct
        .map(p => p -> (if (rnd.nextInt(4) == 0)
          graft.operators.TextUnigramLm.MinLpMicro
        else -(100L + rnd.nextInt(900)))).toMap
      val excl = pieces(rnd.nextInt(pieces.size))
      val word = (1 to (2 + rnd.nextInt(4)))
        .map(_ => chars(rnd.nextInt(3))).mkString
      assert(TextUnigramLm.altScoreMicro(word, model, excl)
        == sparkScore(word, model - excl),
        s"word=$word excl=$excl model=$model")
    }
  }

  test("a piece with no viable alternate outranks a cheap-alt piece") {
    // 'xy' has no alternate (no x/y singles priced) vs 'ab' whose
    // split costs almost the same as the piece itself
    val model = Map("a" -> -100L, "b" -> -100L, "ab" -> -190L,
      "x" -> TextUnigramLm.MinLpMicro, "y" -> TextUnigramLm.MinLpMicro,
      "xy" -> -500L)
    val lossAb = TextUnigramLm.pruneLossMicro("ab", 10L, model)
    val lossXy = TextUnigramLm.pruneLossMicro("xy", 10L, model)
    assert(lossXy > lossAb,
      "the irreplaceable piece must carry the larger prune loss")
    assert(lossAb == 10L * (-190L - (-200L)))
  }
}
