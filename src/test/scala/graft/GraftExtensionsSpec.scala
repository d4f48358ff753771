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
      // non-literal n is rejected with a clear message
      val e = intercept[Exception](
        s2.sql("SELECT graft_ngram_hash32('x', length('ab'))").head())
      assert(e.getMessage.contains("integer literal") ||
        e.getMessage.contains("graft_ngram_hash32"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
