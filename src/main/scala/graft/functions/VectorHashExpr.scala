package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Banded sign-projection LSH (random-hyperplane family) for cosine
  * similarity over embedding vectors — the scalable replacement for
  * any fixed-key-space bucketing: the bucket space is
  * `bands * 2^bits`, so selectivity is a PARAMETER that grows with
  * the corpus (bits ~ 2 log2 n keeps expected random collisions flat)
  * instead of a constant the data outgrows. Two vectors share a band
  * bucket iff all `bits` projection signs in that band agree;
  * P(bit agrees) = 1 - angle/pi, so near-duplicates (cos >= 0.95)
  * survive some band with p ~ 0.96 at 16x16 while random pairs
  * collide at ~2^-16 per band.
  *
  * The hyperplanes are +/-1 coefficient rows derived from sha256 over
  * the (plane, coordinate) grid — data-independent, seedless, and
  * reproducible bit-for-bit in ANY engine with a sha256 function (the
  * same portability contract as the sha-based minhash family in
  * [[graft.operators.TextDedup]]); a multiplicative integer hash is
  * NOT enough here (sequential lattice points under one multiplier
  * give correlated planes — measured 80x the candidate volume of
  * independent signs).
  *
  * Computed as a native codegen'd expression: 256 projections x dim
  * multiply-adds per row stay a tight JVM loop over a precomputed
  * coefficient table; the HOF-lambda formulation evaluates an
  * interpreted closure per element (~16k per row) and is two orders
  * slower.
  */
object VectorHash {

  /** coefficient(plane p, 1-based coordinate i) = -1.0 when the first
    * hex character of sha256("p:i") is odd, else +1.0 — mirrored
    * verbatim by the DuckDB oracle CTE. */
  private def coef(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s"$p:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 1) -1.0 else 1.0
  }

  /** Coefficient table grown on demand; immutable snapshots swapped
    * atomically so hot-path reads are a plain array index. */
  @volatile private var table: Array[Array[Double]] = Array.empty

  private def coefs(planes: Int, dim: Int): Array[Array[Double]] = {
    val t = table
    if (t.length >= planes && (t.length == 0 || t(0).length >= dim)) t
    else synchronized {
      val cur = table
      if (cur.length >= planes && (cur.length == 0 || cur(0).length >= dim)) cur
      else {
        val np = math.max(planes, cur.length)
        val nd = math.max(dim, if (cur.isEmpty) 0 else cur(0).length)
        val nt = Array.tabulate(np, nd)((p, i0) => coef(p, i0 + 1))
        table = nt
        nt
      }
    }
  }

  /** All-band signatures for one float vector: element b is the
    * bucket key `b * 2^bits + sig_b`, where bit j of `sig_b` is set
    * iff the left-to-right fold of coef(b*bits+j, i) * v_i is >= 0 —
    * the exact summation order the SQL mirror uses. */
  def signLsh(vec: ArrayData, bands: Int, bits: Int): ArrayData = {
    val n = vec.numElements()
    val cs = coefs(bands * bits, n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val c = cs(b * bits + j)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += c(i) * vec.getFloat(i).toDouble; i += 1 }
        if (acc >= 0) sig |= 1L << j
        j += 1
      }
      out(b) = (b.toLong << bits) + sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `sign_lsh_keys(vec)` — array of `bands` bucket keys (long) for a
  * float-vector column; see [[VectorHash.signLsh]]. */
case class SignLshKeys(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_lsh_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorHash.signLsh(input.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorHash.signLsh($c, $bands, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SignLshKeys =
    copy(child = newChild)
}
