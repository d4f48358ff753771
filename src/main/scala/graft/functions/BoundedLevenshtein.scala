package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) edit distance kernel: exact Levenshtein for
  * distances ≤ k, the sentinel k+1 otherwise. Built-in `levenshtein`
  * fills the full O(n·m) matrix no matter how different the strings
  * are; an ER/fuzzy-join filter only ever asks "is it within k?", so
  * the band restricts work to the 2k+1 diagonal cells per row —
  * O(k·n) — and the row-saturation early-exit abandons hopeless pairs
  * after a few rows. At a fuzzy-join's candidate volume this is the
  * difference between the distance filter being free and being the
  * bottleneck. */
object TextMath {

  /** min(levenshtein(s, t), k+1), in O(k·min(n,m)) time.
    * ASCII inputs (numBytes == numChars — the fuzzy-join's lowercase
    * part names always are) run the DP straight over the UTF8String
    * bytes via `getByte` — ZERO allocation per candidate pair, where
    * the first cut built two `String`s (decode + copy) per pair in
    * the join's hot loop. Multi-byte inputs take the char-exact
    * fallback (byte-level distance ≠ char-level there). */
  def boundedLev(sU: UTF8String, tU: UTF8String, k: Int): Int =
    if (sU.numBytes == sU.numChars && tU.numBytes == tU.numChars)
      boundedLevAscii(sU, tU, k)
    else boundedLevChars(sU.toString, tU.toString, k)

  private def boundedLevAscii(s: UTF8String, t: UTF8String,
      k: Int): Int = {
    val n = s.numBytes
    val m = t.numBytes
    val inf = k + 1
    if (Math.abs(n - m) > k) return inf
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= Math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = Math.max(1, i - k)
      val hi = Math.min(m, i + k)
      if (lo == 1 && i <= k) cur(0) = i
      var best = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s.getByte(i - 1) == t.getByte(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return inf // whole band saturated — hopeless
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    Math.min(prev(m), inf)
  }

  private def boundedLevChars(s: String, t: String, k: Int): Int = {
    val n = s.length
    val m = t.length
    val inf = k + 1
    if (Math.abs(n - m) > k) return inf
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= Math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = Math.max(1, i - k)
      val hi = Math.min(m, i + k)
      if (lo == 1 && i <= k) cur(0) = i
      var best = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return inf // whole band saturated — hopeless
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    Math.min(prev(m), inf)
  }
}

/** Codegen'd banded edit distance — stays inside whole-stage codegen
  * (a Scala UDF would box both strings per candidate pair and break
  * the join's codegen pipeline). `k` is a plan-time literal, baked
  * into the generated call. */
case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bounded_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && k >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bounded_levenshtein requires (STRING, STRING) and k >= 0")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextMath.boundedLev(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextMath.boundedLev($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {
  def apply(a: Column, b: Column, k: Int): Column =
    GraftBridge.column(new BoundedLevenshtein(
      GraftBridge.expression(a), GraftBridge.expression(b), k))
}
