package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.operators.{LshPlanner, Multimodal, TailDynamics, TermStructure}

/** Property layer for the round-12 machinery: scale invariance of the
  * OU fit, bounds and budget-totality of the LSH planner, slope-range
  * and translation invariance of Theil–Sen, and permutation/reversal
  * invariants of the VAD segmenter. */
object Round12Props extends Properties("Round12") {
  private lazy val spark = TestSpark.spark

  private def ticksDf(closes: List[Double]) = {
    import spark.implicits._
    closes.zipWithIndex.map { case (c, d) => ("X", d.toLong, c) }
      .toDF("symbol", "d", "close")
      .select($"symbol", timestamp_seconds($"d" * 86400L).as("timestamp"),
        $"close")
  }

  private val walkGen: Gen[List[Double]] = for {
    n <- Gen.choose(8, 40)
    steps <- Gen.listOfN(n, Gen.choose(-40, 40))
  } yield steps.scanLeft(1000.0)((p, s) => (p * (1.0 + s / 1000.0))
    .max(200.0)).map(x => math.rint(x * 100) / 100)

  // OU: rho is invariant under a multiplicative price rescale (a log
  // SHIFT) — up to the 5-dp input grid, which bounds the slope move.
  property("ouHalfLife rho is stable under price rescale") =
    forAll(walkGen, Gen.choose(2, 8)) { (closes, k) =>
      def rho(mult: Double): Option[Double] = {
        val r = TailDynamics.ouHalfLife(
          ticksDf(closes.map(_ * mult))).collect()
        if (r.isEmpty || r.head.isNullAt(r.head.fieldIndex("rho"))) None
        else Some(r.head.getAs[Double]("rho"))
      }
      (rho(1.0), rho(k.toDouble)) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 2e-3
        case _ => true
      }
    }

  // LSH planner: configs cover the budget exactly; probabilities and
  // masses stay in range; the optimal flag marks a true minimizer.
  property("bandPlan configs multiply to k and masses are bounded") =
    forAll(Gen.oneOf(4, 6, 8, 12, 16, 24)) { k =>
      val cfgOk = LshPlanner.configs(k).forall { case (b, r) => b * r == k }
      val rows = LshPlanner.bandPlan(spark, k, 3, 10).collect()
      val n = rows.head.getAs[Long]("n_grid").toDouble
      val bounded = rows.forall { r =>
        val fp = r.getAs[Double]("fp_mass"); val fn = r.getAs[Double]("fn_mass")
        fp >= 0 && fn >= 0 && fp + fn <= n + 1e-9
      }
      val best = rows.map(_.getAs[Double]("total_err")).min
      val flagOk = rows.forall { r =>
        r.getAs[Boolean]("is_optimal") == (r.getAs[Double]("total_err") == best)
      }
      cfgOk && bounded && flagOk
    }

  // Theil–Sen: the median slope lies within the pairwise-slope range,
  // and adding a constant to every IV leaves it unchanged.
  private val curveGen: Gen[List[Double]] = for {
    ivs <- Gen.listOfN(6, Gen.choose(100, 900))
  } yield ivs.map(_ / 1000.0)

  property("theilSenSlope is translation-invariant in iv") =
    forAll(curveGen) { ivs =>
      val mids = Seq((0, 7), (8, 14), (15, 30), (31, 60), (61, 90), (91, 999))
      val day0 = java.time.LocalDate.of(2024, 3, 1)
      def df(shift: Double) = {
        import spark.implicits._
        mids.zip(ivs).map { case ((lo, hi), iv) =>
          ("X",
            java.sql.Timestamp.valueOf(day0.atStartOfDay()),
            java.sql.Date.valueOf(day0.plusDays(((lo + hi) / 2).toLong.max(lo))),
            iv + shift)
        }.toDF("underlying", "timestamp", "expiry", "iv")
      }
      def slope(shift: Double) =
        TermStructure.theilSenSlope(df(shift)).collect()
          .head.getAs[Double]("ts_slope")
      math.abs(slope(0.0) - slope(0.25)) < 1e-9
    }

  // VAD: voiced count is a multiset property (invariant under frame
  // permutation); reversal preserves counts, segments AND longest run.
  private val framesGen: Gen[List[Int]] = for {
    n <- Gen.choose(2, 12)
    lvls <- Gen.listOfN(n, Gen.choose(0, 4))
  } yield lvls

  private def vadOf(levels: List[Int]) = {
    import spark.implicits._
    // level L -> frame of constant byte 128+20L (energy rises with L)
    val bytes = levels.flatMap(l =>
      Array.fill(64)((128 + 20 * l).toByte)).toArray
    val r = Multimodal.vadSegments(spark.createDataset(
      Seq(Multimodal.MediaRow(1L, "audio", bytes)))).collect().head
    (r.n_voiced, r.n_segments, r.longest_voiced)
  }

  property("vad voiced count is permutation-invariant; reversal exact") =
    forAll(framesGen) { levels =>
      val (v0, s0, l0) = vadOf(levels)
      val (v1, _, _) = vadOf(scala.util.Random.javaRandomToRandom(
        new java.util.Random(levels.hashCode().toLong))
        .shuffle(levels))
      val (v2, s2, l2) = vadOf(levels.reverse)
      v1 == v0 && v2 == v0 && s2 == s0 && l2 == l0
    }
}
