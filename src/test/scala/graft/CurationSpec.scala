package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextDedup, TextPii}

/** Unit semantics of the round-8 curation operators: PII scrub,
  * incremental snapshot-delta dedup, deterministic corpus shuffle,
  * temperature mixture weights. The DuckDB oracles pin cross-engine
  * parity; these pin the SEMANTICS on handcrafted inputs. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- TextPii ----

  private def scrubOne(text: String): (Int, Int, Int, String) = {
    val r = TextPii.scrub(Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
    (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"),
      r.getAs[Int]("n_phones"), r.getAs[String]("redacted"))
  }

  test("pii scrub counts and redacts each pattern family") {
    val (e, i, p, red) = scrubOne(
      "mail a.b+c@host-1.org and x%y@sub.example.com, " +
        "server 192.168.0.1, call +44 (0) 20-7946-0958 now")
    assert(e == 2 && i == 1 && p == 1)
    assert(red ==
      "mail [EMAIL] and [EMAIL].com, server [IP], call [PHONE] now")
    // x%y@sub.example.com: the tld class stops at 'example'; the
    // trailing '.com' stays — over-masking is bounded and deterministic
  }

  test("pii scrub leaves clean text untouched with zero counts") {
    val (e, i, p, red) = scrubOne("no personal data in this sentence")
    assert(e == 0 && i == 0 && p == 0)
    assert(red == "no personal data in this sentence")
  }

  test("pii redaction order: masked emails/ips never re-match as phones") {
    // counts are per-pattern over the RAW text, so the email's long
    // digit run legitimately counts as a phone too — but redaction
    // masks emails first, so the output never leaks a partial match
    val (e, _, p, red) = scrubOne("user20255500421@example.com 10.20.30.40")
    assert(e == 1 && p == 1)
    assert(red == "[EMAIL] [IP]")
  }

  test("pii phone needs >= 8 span and digit bounds") {
    val (_, _, p1, _) = scrubOne("call 5551234")      // 7 chars: too short
    val (_, _, p2, _) = scrubOne("call 555-12345")    // 9 with separator
    assert(p1 == 0 && p2 == 1)
  }

  // ---- incremental dedup ----

  test("incremental dedup flags exact snapshot matches only") {
    val snapshot = Seq((10L, "Alpha  Beta"), (11L, "gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta"),        // dup: normalization folds case/space
      (2L, "gamma delta"),       // dup: exact
      (3L, "epsilon zeta"),      // novel
      (4L, "alpha beta"))        // dup again (batch-internal repeat ok)
      .toDF("doc_id", "text")
    val out = TextDedup.incrementalDedup(batch, snapshot)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  test("incremental dedup emits exactly one row per batch doc") {
    // snapshot multiplicity must not fan out the probe join
    val snapshot = Seq((1L, "same text"), (2L, "same text"), (3L, "same text"))
      .toDF("doc_id", "text")
    val batch = Seq((9L, "same text")).toDF("doc_id", "text")
    assert(TextDedup.incrementalDedup(batch, snapshot).count() == 1)
  }

  // ---- corpus shuffle ----

  test("corpus shuffle is a partitioning-independent permutation") {
    val docs = spark.range(0, 300).select(col("id").as("doc_id"))
    val a = TextAnalysis.corpusShuffle(docs, seed = 7, nShards = 8)
    val b = TextAnalysis.corpusShuffle(docs.repartition(13), 7, 8)
    assert(a.collect().toSet == b.collect().toSet)
    val rows = a.select("shard", "pos_in_shard").as[(Int, Int)]
      .collect().groupBy(_._1)
    assert(rows.keys.forall(s => s >= 0 && s < 8))
    // positions within each shard are exactly 1..n_shard
    rows.foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length))
    }
    assert(rows.values.map(_.length).sum == 300)
  }

  test("corpus shuffle: different seeds give different orders") {
    val docs = spark.range(0, 100).select(col("id").as("doc_id"))
    val k7 = TextAnalysis.corpusShuffle(docs, 7, 4)
      .select("doc_id", "shard", "pos_in_shard").collect().toSet
    val k8 = TextAnalysis.corpusShuffle(docs, 8, 4)
      .select("doc_id", "shard", "pos_in_shard").collect().toSet
    assert(k7 != k8)
  }

  // ---- int8 quantization ----

  test("int8 quantize: scale, bounds, exact reconstruction stats") {
    import graft.operators.VectorOps
    val df = Seq(
      (1L, Array(12.7f, -6.35f, 0.0f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: no NaNs
      .toDF("vec_id", "embedding")
    val out = VectorOps.int8Quantize(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val v1 = out(1L)
    assert(v1.getAs[Int]("n_dims") == 4)
    assert(math.abs(v1.getAs[Double]("scale") - 0.1) < 1e-7) // 12.7f is inexact
    assert(v1.getAs[Int]("q_first") == 127)   // max|x| maps to exactly 127
    assert(v1.getAs[Int]("q_last") == 10)
    assert(v1.getAs[Double]("max_err") <= v1.getAs[Double]("scale") / 2 + 1e-12)
    val v2 = out(2L)
    assert(v2.getAs[Double]("scale") == 0.0 && v2.getAs[Int]("q_first") == 0
      && v2.getAs[Double]("mse") == 0.0)
  }

  test("int8 quantize error is bounded by half a step across real vectors") {
    import graft.operators.VectorOps
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = VectorOps.int8Quantize(emb)
      .filter(col("max_err") > col("scale") / 2).count()
    assert(bad == 0)
  }

  // ---- dataset card ----

  test("dataset card: counts, dup rate, and language entropy") {
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "s1", 16L),
      (2L, "Alpha  beta GAMMA", "en", "s1", 17L), // exact dup after norm
      (3L, "uno dos tres", "es", "s2", 12L),
      (4L, "eins zwei", "de", "s2", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.TextAnalysis.datasetCard(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4 && r.getAs[Long]("n_sources") == 2
      && r.getAs[Long]("n_langs") == 3)
    assert(r.getAs[Long]("n_distinct_texts") == 3)
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.25) < 1e-12)
    assert(r.getAs[Long]("total_words") == 11)
    // entropy of (2,1,1)/4 = 1.5 ln-bits = 1.0397 nats
    assert(math.abs(r.getAs[Double]("lang_entropy") - 1.039720) < 1e-4)
  }

  // ---- temperature mixture ----

  test("temperature mixture: weights normalize and damp dominance") {
    val docs = Seq.tabulate(90)(i => (i.toLong, "s_big", 400L)) ++
      Seq.tabulate(10)(i => ((100 + i).toLong, "s_small", 100L))
    val out = TextAnalysis.temperatureMixture(
      docs.toDF("doc_id", "source", "n_chars"), budgetDocs = 1000)
      .select("source", "n_docs", "n_chars", "mix_weight", "expected_docs")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val wBig = out("s_big")._4
    val wSmall = out("s_small")._4
    assert(math.abs(wBig + wSmall - 1.0) < 1e-12)
    // sqrt damping: big keeps the larger weight, but less than its
    // raw 97.3% char share; small is upsampled above its 2.7% share
    val shareBig = 36000.0 / 37000.0
    assert(wBig > wSmall && wBig < shareBig)
    assert(wSmall > 1.0 - shareBig)
    assert(math.abs(out("s_big")._5 + out("s_small")._5 - 1000.0) < 1e-9)
  }

  // ---- span scrub ----

  test("span scrub removes every word covered by a corpus-frequent span") {
    // "a b c" appears in docs 1 and 2 (df=2 >= 2): all covered words
    // drop; doc 3 shares no 3-gram, unchanged.
    val docs = Seq(
      (1L, "a b c x y"),
      (2L, "p q a b c"),
      (3L, "u v w x y")).toDF("doc_id", "text")
    val out = TextAnalysis.spanScrub(docs, n = 3, minDf = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((5, 3, "x y")))
    assert(out(2L) == ((5, 3, "p q")))
    assert(out(3L) == ((5, 0, "u v w x y")))
  }

  test("span scrub: overlapping frequent spans union their coverage") {
    // both 2-grams "a b" and "b c" are frequent; coverage of words
    // 0..2 in doc 1 is the union, not double-counted
    val docs = Seq(
      (1L, "a b c z"),
      (2L, "a b q r"),
      (3L, "s b c t")).toDF("doc_id", "text")
    val out = TextAnalysis.spanScrub(docs, n = 2, minDf = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((3, "z")))
  }

  test("span scrub: doc shorter than n words is untouched") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanScrub(docs, n = 5, minDf = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 0)
  }

  test("span scrub can empty a document entirely") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.spanScrub(docs, n = 3, minDf = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((3, "")) && out(2L) == ((3, "")))
  }

  // ---- deterministic split ----

  test("split assignment is deterministic and respects percent bounds") {
    val docs = (0L until 400L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = TextAnalysis.splitAssign(docs, seed = 7, trainPct = 90,
      valPct = 5).collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getString(2))).toMap
    val b = TextAnalysis.splitAssign(docs.repartition(7), seed = 7,
      trainPct = 90, valPct = 5).collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getString(2))).toMap
    assert(a == b) // partitioning-independent
    a.values.foreach { case (pct, split) =>
      assert(pct >= 0 && pct < 100)
      val want = if (pct < 90) "train" else if (pct < 95) "val" else "test"
      assert(split == want)
    }
    // roughly proportional (sha uniformity; generous bounds)
    val n = a.values.count(_._2 == "train")
    assert(n > 320 && n < 392, s"train count $n far from 360")
  }

  test("split assignment is stable under corpus growth") {
    val small = (0L until 100L).map(i => (i, "t")).toDF("doc_id", "text")
    val large = (0L until 300L).map(i => (i, "t")).toDF("doc_id", "text")
    val a = TextAnalysis.splitAssign(small, 7, 90, 5).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = TextAnalysis.splitAssign(large, 7, 90, 5).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }
}
