package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextPii, VectorOps}

/** Property layer for the round-8 curation operators.
  *
  * The load-bearing PII property is CLOSURE: after one scrub pass, no
  * pattern matches the redacted text — which is exactly idempotence
  * (redact ∘ redact = redact). It must hold for any interleaving of
  * PII tokens and filler, including the adversarial adjacencies a
  * unit test wouldn't enumerate (digit runs touching masked tokens,
  * emails chained with '@' leftovers, 5-octet IP runs). */
object CurationProps extends Properties("Curation") {
  private lazy val spark = TestSpark.spark

  // filler: letters/digits but never '@' (emails are injected, not
  // accidental); digit runs may legitimately read as phones — the
  // scrub must mask those too, closure still holds
  private val fillerGen = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaLowerChar, Gen.numChar)).map(_.mkString)
  private val emailGen = for {
    l <- Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar,
      Gen.oneOf('.', '_', '+'))).map(_.mkString)
    d <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    t <- Gen.oneOf("com", "org", "io", "net")
  } yield s"$l@$d.$t"
  private val ipGen = for {
    a <- Gen.choose(0, 999); b <- Gen.choose(0, 999)
    c <- Gen.choose(0, 999); d <- Gen.choose(0, 999)
  } yield s"$a.$b.$c.$d"
  private val phoneGen = for {
    plus <- Gen.oneOf("", "+")
    cc <- Gen.choose(1, 99)
    mid <- Gen.listOfN(8, Gen.oneOf(Gen.numChar, Gen.const(' '),
      Gen.const('-'), Gen.const('('), Gen.const(')'))).map(_.mkString)
    last <- Gen.numChar
  } yield s"$plus$cc$mid$last"
  private val tokenGen: Gen[String] =
    Gen.frequency(4 -> fillerGen, 2 -> emailGen, 1 -> ipGen, 1 -> phoneGen)
  private val sepGen = Gen.oneOf(" ", ", ", "; ", " x ", "\n")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 10)
    toks <- Gen.listOfN(n, tokenGen)
    seps <- Gen.listOfN(n, sepGen)
  } yield toks.zip(seps).map { case (t, s) => t + s }.mkString

  property("pii scrub is closed: nothing matches the redacted text") =
    forAll(Gen.listOfN(16, textGen)) { texts: List[String] =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (e, i, p) = TextPii.countPii(col("redacted"))
      TextPii.scrub(df)
        .select(e.as("e2"), i.as("i2"), p.as("p2"))
        .filter(col("e2") > 0 || col("i2") > 0 || col("p2") > 0)
        .count() == 0L
    }

  property("pii scrub redacts every injected email") =
    forAll(Gen.listOfN(8, emailGen)) { emails: List[String] =>
      import spark.implicits._
      val df = emails.zipWithIndex
        .map { case (t, i) => (i.toLong, s"reach me at $t thanks") }
        .toDF("doc_id", "text")
      val out = TextPii.scrub(df).collect()
      out.forall(r => r.getAs[Int]("n_emails") >= 1 &&
        !r.getAs[String]("redacted").contains("@"))
    }

  property("corpus shuffle is a bijection onto shard positions") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)),
      Gen.choose(1, 9), Gen.choose(0L, 99L)) {
      (rawIds: List[Long], nShards: Int, seed: Long) =>
        import spark.implicits._
        val ids = rawIds.distinct
        val out = TextAnalysis.corpusShuffle(
          ids.toDF("doc_id"), seed, nShards)
          .select("doc_id", "shard", "pos_in_shard")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        val byShard = out.groupBy(_._2)
        out.length == ids.length &&
          out.map(_._1).toSet == ids.toSet &&
          byShard.keys.forall(s => s >= 0 && s < nShards) &&
          byShard.values.forall(g =>
            g.map(_._3).sorted.toSeq == (1 to g.length))
    }

  private val vecGen: Gen[Array[Float]] = for {
    n <- Gen.choose(1, 32)
    xs <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
  } yield xs.toArray

  property("int8 quantization: |q| <= 127, err <= scale/2, mse <= (scale/2)^2") =
    forAll(Gen.nonEmptyListOf(vecGen)) { vecs: List[Array[Float]] =>
      import spark.implicits._
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      VectorOps.int8Quantize(df).collect().forall { r =>
        val scale = r.getAs[Double]("scale")
        val half = scale / 2 + 1e-12
        math.abs(r.getAs[Int]("q_first")) <= 127 &&
          math.abs(r.getAs[Int]("q_last")) <= 127 &&
          r.getAs[Double]("max_err") <= half &&
          r.getAs[Double]("mse") <= half * half
      }
    }
}
