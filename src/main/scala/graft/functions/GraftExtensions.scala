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

  /** Optional literal risk-free-rate tail argument (default 2%). */
  private def rateArg(args: Seq[Expression], i: Int): Double =
    if (args.length <= i) graft.operators.Greeks.DefaultRiskFreeRate
    else args(i) match {
      case Literal(v: Double, _) => v
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"rate must be a numeric literal, got $other")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_erf"),
      new ExpressionInfo(classOf[Erf].getName, "graft_erf"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_erf takes exactly 1 argument")
        Erf(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bs_call"),
      new ExpressionInfo(classOf[BsCallPrice].getName, "graft_bs_call"),
      (args: Seq[Expression]) => {
        require(args.length == 4 || args.length == 5,
          "graft_bs_call takes (spot, strike, t, sigma[, r])")
        BsCallPrice(args(0), args(1), args(2), args(3), rateArg(args, 4))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_implied_vol"),
      new ExpressionInfo(classOf[ImpliedVolBisect].getName,
        "graft_implied_vol"),
      (args: Seq[Expression]) => {
        require(args.length == 4 || args.length == 5,
          "graft_implied_vol takes (price, spot, strike, t[, r])")
        ImpliedVolBisect(args(0), args(1), args(2), args(3),
          rateArg(args, 4))
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
    ext.injectFunction((
      FunctionIdentifier("graft_arr_dot"),
      new ExpressionInfo(classOf[ArrDot].getName, "graft_arr_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_arr_dot takes (a, b) arguments")
        ArrDot(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bounded_levenshtein"),
      new ExpressionInfo(classOf[BoundedLevenshtein].getName,
        "graft_bounded_levenshtein"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_bounded_levenshtein takes (a, b, k) arguments")
        val k = args(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_bounded_levenshtein k must be an integer literal, " +
              s"got $other")
        }
        new BoundedLevenshtein(args(0), args(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_cdc_chunks takes (text)")
        new CdcChunks(args.head)
      }))
  }
}
