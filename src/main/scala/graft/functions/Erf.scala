package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst `erf` (SURVEY §2.10): the one scalar the Greeks need
  * that Spark lacks. A codegen'd UnaryExpression — stays inside
  * whole-stage codegen with zero serialization, unlike a Scala UDF
  * (which would box every row and break codegen fusion). */
case class Erf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_erf"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_erf requires DOUBLE input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    GraftMath.erf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftMath.erf($c)")

  override protected def withNewChildInternal(newChild: Expression): Erf =
    copy(child = newChild)
}

/** Column-level wrappers for the native expressions. */
object GraftColumns {
  def erf(c: Column): Column =
    GraftBridge.column(Erf(GraftBridge.expression(c.cast("double"))))

  /** Φ(x) = (1 + erf(x/√2))/2 — composed at the Column layer so the
    * oracle can spell the identical arithmetic. */
  def normCdf(c: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lit(0.5) * (lit(1.0) + erf(c / math.sqrt(2.0)))
  }
}
