package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel (see
  * [[graft.operators.CdcChunking]] for the algorithm and its
  * cross-engine contract): one compiled pass per document — gear
  * values, the 6-char-window cut test, and the chunk substrings —
  * semantically identical to the transform/filter Column spelling
  * the DuckDB oracle replays, but with none of its costs: HOFs do
  * not participate in whole-stage codegen, so the declarative form
  * pays interpreted-eval boxing PER CHARACTER (measured ~21 s at sf1
  * for ~15M chars; this kernel is ~50x cheaper). The TextHash
  * shingle kernel set the precedent. ASCII-only input by contract
  * (CdcChunking.cdcText reduces to [a-z0-9 ] first). */
object CdcKernel {

  private val Mod59 = (1L << 59) - 1 // (h*2) % 2^59 == (h<<1) & Mod59
  private val Mask = 64L

  /** CDC chunk substrings of `nt` — bit-identical to the SQL window
    * spelling for ASCII input. */
  def chunks(nt: UTF8String): ArrayData = {
    val s = nt.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](4)
    var h = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val g = (s.charAt(i).toLong * 2654435761L) % 4294967296L
      h = ((h << 1) & Mod59) + g
      if (h % Mask == 0L) {
        // cut after position i+1 (1-based end == i+1)
        if (i + 1 > prev) out.add(UTF8String.fromString(
          s.substring(prev, i + 1)))
        prev = i + 1
      }
      i += 1
    }
    if (prev < n) out.add(UTF8String.fromString(s.substring(prev, n)))
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd CDC chunker — stays inside whole-stage codegen; the
  * per-char work compiles to a JVM loop instead of interpreted
  * expression-tree eval. */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    CdcKernel.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKernel.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  def apply(c: Column): Column =
    GraftBridge.column(new CdcChunks(GraftBridge.expression(c)))
}
