package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd embedding dot product — the hot kernel under every
  * cosine in the ANN/near-dup family. Semantically IDENTICAL to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold it replaces
  * (strict left-to-right double accumulation, so the DuckDB
  * `list_reduce` oracles keep hash-matching; null element or
  * length mismatch → null, exactly as the zip_with null pads
  * propagate through the fold) — but higher-order functions are
  * CodegenFallback: every row pays an interpreted closure per
  * element. This expression compiles to one virtual call into a
  * tight primitive loop.
  */
object VectorMath {

  /** Left-to-right double fold of the element products; null on
    * length mismatch or any null element (the zip_with+aggregate
    * contract). */
  def dotOrNull(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc + x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column API: `arrDot(a, b)` over float/double array columns. */
  def arrDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** `graft_arr_dot(a, b)` — see [[VectorMath]]. Accepts any mix of
  * ARRAY<FLOAT> and ARRAY<DOUBLE> children. */
case class ArrDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_arr_dot"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.functions.VectorMath.dotOrNull(
         |  $a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrDot =
    copy(left = newLeft, right = newRight)
}
