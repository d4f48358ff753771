package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.functions.{GraftExtensions, GraftMath, TextHash}

/** The SQL-surface registration: a session built with GraftExtensions
  * can call the custom expressions from pure SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes codegen'd kernels to pure SQL") {
    val base = TestSpark.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_erf(0.5d) AS e, graft_ngram_hash32('A  b c', 2) AS h")
        .head()
      assert(math.abs(r.getDouble(0) - GraftMath.erf(0.5)) < 1e-15)
      val hs = r.getSeq[Long](1)
      assert(hs.length == 2) // ["a b", "b c"]
      assert(hs.contains(TextHash.hash32("a b")))
      assert(hs.contains(TextHash.hash32("b c")))
      // BS pricer + IV solver round-trip through the SQL surface,
      // including the optional literal rate tail argument
      val iv = s2.sql(
        """SELECT graft_implied_vol(
          |  graft_bs_call(5e4d, 5.2e4d, 0.5d, 0.7d), 5e4d, 5.2e4d, 0.5d)
          |  AS iv,
          |  graft_bs_call(5e4d, 5.2e4d, 0.5d, 0.7d, 0.05d) AS px5
          |""".stripMargin).head()
      assert(math.abs(iv.getDouble(0) - 0.7) < 1e-9)
      assert(iv.getDouble(1) ==
        graft.functions.ImpliedVol.bsCall(5e4, 5.2e4, 0.5, 0.05, 0.7))
      // arr_dot: left-to-right fold parity with the HOF formulation,
      // null on length mismatch (the zip_with contract)
      val d = s2.sql(
        """SELECT
          |  graft_arr_dot(array(1.0f, 2.0f), array(3.0d, 4.0d)) AS dt,
          |  graft_arr_dot(array(1.0f), array(1.0f, 2.0f)) AS mismatch,
          |  graft_arr_dot(
          |    array(1.0f, 2.0f),
          |    aggregate(array(1), array(2.0f, 3.0f), (a, x) -> a)) AS mixed
          |""".stripMargin).head()
      assert(d.getDouble(0) == 11.0)
      assert(d.isNullAt(1))
      assert(d.getDouble(2) == 8.0)
      // non-literal n is rejected with a clear message
      val e = intercept[Exception](
        s2.sql("SELECT graft_ngram_hash32('x', length('ab'))").head())
      assert(e.getMessage.contains("integer literal") ||
        e.getMessage.contains("graft_ngram_hash32"))
      // round-15 kernels: banded edit distance + CDC chunker
      val k = s2.sql(
        """SELECT graft_bounded_levenshtein('cold ring', 'old ring', 2)
          |  AS d1,
          |  graft_bounded_levenshtein('anvil', 'widget', 2) AS capped,
          |  graft_cdc_chunks('small ring red widget blue bolt') AS cks
          |""".stripMargin).head()
      assert(k.getInt(0) == 1)
      assert(k.getInt(1) == 3) // sentinel k+1
      val cks = k.getSeq[String](2)
      assert(cks.mkString == "small ring red widget blue bolt")
      assert(cks.length == 2) // ground-truth cut at 24
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
