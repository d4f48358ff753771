package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so a pure-SQL user gets the
  * same codegen'd kernels the DataFrame API uses:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * spark.sql("SELECT graft_erf(x), graft_ngram_hash32(text, 3) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_erf"),
      new ExpressionInfo(classOf[Erf].getName, "graft_erf"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_erf takes exactly 1 argument")
        Erf(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_hash32"),
      new ExpressionInfo(classOf[NgramHash32].getName, "graft_ngram_hash32"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_ngram_hash32 takes (text, n) arguments")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_ngram_hash32 n must be an integer literal, got $other")
        }
        NgramHash32(args.head, n)
      }))
  }
}
