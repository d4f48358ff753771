package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BoundedLevenshtein, TextMath}
import org.apache.spark.unsafe.types.UTF8String

/** Round-15 fifth wave: the banded edit-distance kernel. */
class Round15eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("boundedLev == min(levenshtein, k+1) on random word pairs") {
    val rnd = new scala.util.Random(7)
    val words = Vector("small", "ring", "cold", "old", "red", "rod",
      "gizmo", "widget", "plate", "anvil", "", "a", "ab")
    for (_ <- 1 to 3000; k <- 0 to 4) {
      def mk() = (1 to (1 + rnd.nextInt(3)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      val (a, b) = (mk(), mk())
      val got = TextMath.boundedLev(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      val want = math.min(lev(a, b), k + 1)
      assert(got == want, s"a='$a' b='$b' k=$k")
    }
  }

  test("multi-byte input takes the char-exact path, not byte distance") {
    // 'é' is 2 UTF-8 bytes: a byte-level DP would count 2 edits where
    // the char-level distance is 1 — pins the ASCII fast path's guard
    for (k <- 0 to 4) {
      val got = TextMath.boundedLev(
        UTF8String.fromString("café"), UTF8String.fromString("cafe"), k)
      assert(got == math.min(1, k + 1), s"k=$k")
      val mixed = TextMath.boundedLev(
        UTF8String.fromString("éé"), UTF8String.fromString("ee"), k)
      assert(mixed == math.min(2, k + 1), s"mixed k=$k")
    }
  }

  test("the expression agrees with Spark's levenshtein inside the bound") {
    val pairs = Seq(("cold ring", "old ring"), ("old rod", "red rod"),
      ("small gizmo", "small gizmo"), ("anvil", "widget"))
      .toDF("a", "b")
    val out = pairs.select(
      BoundedLevenshtein(col("a"), col("b"), 3).as("bl"),
      least(levenshtein(col("a"), col("b")), lit(4)).as("full"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
