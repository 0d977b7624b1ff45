package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-5 robust-statistics and sketch-algebra
  * gauges on sf0.001 — oracle parity re-checks full values at sf0.01;
  * these recompute the estimators independently (driver-side Scala
  * over the collected base tables) and assert the invariants a hash
  * can't name (median selection rule, Benford expectation algebra,
  * HLL register monotonicity). */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  test("q_theil_sen: median pairwise slope matches a driver-side recompute") {
    import spark.implicits._
    val Array((nMonths, nPairs, tsMicro, ols)) = q("q_theil_sen").run(spark, dir)
      .select(col("n_months"), col("n_pairs"), col("ts_slope_micro"),
        col("ols_slope"))
      .as[(Long, Long, Long, Double)].collect()
    // independent base: monthly cents straight off the orders table
    val monthly = Tables.orders(spark, dir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("idx"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("cents"))
      .as[(Int, Long)].collect()
    assert(nMonths == monthly.length)
    assert(nPairs == monthly.length.toLong * (monthly.length - 1) / 2)
    // all pairwise slopes, the query's exact ordering and median pick
    val pairs = for {
      a <- monthly; b <- monthly; if b._1 > a._1
    } yield (b._2 - a._2, (b._1 - a._1).toLong)
    val sorted = pairs.sortBy { case (num, den) =>
      (num.toDouble / den, num, den)
    }
    val (mNum, mDen) = sorted(((pairs.length - 1) * 5000 / 10000).toInt)
    assert(tsMicro == mNum * 1000000L / mDen,
      s"median slope $tsMicro != ${mNum * 1000000L / mDen}")
    // OLS is a plain finite double beside the robust figure
    assert(!ols.isNaN && !ols.isInfinite)
    // robustness smoke: the median slope is inside the slope range
    val slopes = pairs.map { case (n, d) => n.toDouble / d }
    assert(tsMicro / 1e6 >= slopes.min - 1 && tsMicro / 1e6 <= slopes.max + 1)
  }

  test("q_benford: digit counts, expectation and deviation tie out exactly") {
    import spark.implicits._
    val rows = q("q_benford").run(spark, dir)
      .select(col("d"), col("n_obs"), col("exp_milli"), col("dev_ppm"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 1 && r._1 <= 9))
    // independent recount of leading digits from exact cents
    val cents = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
        .as("c")).filter(col("c") > 0).as[Long].collect()
    val n = cents.length.toLong
    val obs = cents.groupBy(_.toString.head.asDigit)
      .map { case (d, v) => d -> v.length.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == obs)
    assert(rows.map(_._2).sum == n)
    rows.foreach { case (d, nObs, expMilli, devPpm) =>
      val p = math.log(1.0 + 1.0 / d) / math.log(10.0)
      assert(expMilli == math.floor(n * p * 1000).toLong, s"digit $d exp")
      assert(devPpm == math.floor((nObs - n * p) / n * 1000000).toLong,
        s"digit $d dev")
    }
    // the nine floor'd expectations cover n within flooring loss
    val expSum = rows.map(_._3).sum
    assert(expSum <= n * 1000 && expSum >= n * 1000 - 9)
  }

  test("q_sketch_hll_overlap: union dominates singles; I-E algebra ties") {
    import spark.implicits._
    val rows = q("q_sketch_hll_overlap").run(spark, dir)
      .select(col("pa"), col("pb"), col("est_a_milli"), col("est_b_milli"),
        col("est_union_milli"), col("est_inter_milli"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (pa, pb, a, b, u, i) =>
      assert(pa < pb, s"pair order $pa,$pb")
      // register-wise max only grows registers, and the estimator is
      // monotone in them (±1 milli flooring slack)
      assert(u >= math.max(a, b) - 1, s"$pa|$pb union $u < max($a,$b)")
      // inclusion-exclusion is computed from the same three doubles;
      // independent flooring differs by at most 2 milli
      assert(math.abs(i - (a + b - u)) <= 2, s"$pa|$pb I-E mismatch")
    }
    // the report is the top-10 by intersection, descending
    assert(rows.map(_._6).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
  }

  test("q_winsorize: fences ordered, clamped mean between fences, counts tie") {
    import spark.implicits._
    val rows = q("q_winsorize").run(spark, dir)
      .select(col("event_type"), col("n"), col("n_samp"), col("lo_cents"),
        col("hi_cents"), col("mean_micro"), col("wins_mean_micro"),
        col("n_clamped_lo"), col("n_clamped_hi"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // independent base for recount
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (g, n, nS, lo, hi, mean, wmean, nLo, nHi) =>
      val cents = base(g).map(_._2)
      assert(n == cents.length && nS > 0 && lo <= hi)
      // exact means tie to a driver-side recompute
      assert(mean == cents.sum * 1000000L / n)
      val clamped = cents.map(c => math.min(math.max(c, lo), hi))
      assert(wmean == clamped.sum * 1000000L / n)
      assert(nLo == cents.count(_ < lo) && nHi == cents.count(_ > hi))
      // the winsorized mean sits inside the fences
      assert(wmean >= lo * 1000000L && wmean <= hi * 1000000L)
    }
  }

  test("q_bootstrap_ci: exact point mean, ordered CI, positive SE") {
    import spark.implicits._
    val rows = q("q_bootstrap_ci").run(spark, dir)
      .select(col("event_type"), col("n"), col("point_mean_micro"),
        col("b_eff"), col("boot_lo_micro"), col("boot_hi_micro"),
        col("boot_se_micro"))
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (g, n, point, bEff, lo, hi, se) =>
      val cents = base(g).map(_._2)
      assert(n == cents.length)
      assert(point == cents.sum * 1000000L / n)
      // every replicate resamples the same population: the CI band is
      // ordered and the point estimate lands inside (Poisson weights
      // are unbiased; with B=40 and n≈200 the band is many SEs wide)
      assert(bEff == 40L && lo <= hi)
      assert(point >= lo - 1 && point <= hi + 1,
        s"$g point $point outside [$lo, $hi]")
      assert(se > 0 && !se.isNaN)
      // the percentile band is consistent with the SE scale: the
      // trimmed band (≈ ±2σ) cannot be wildly wider than 6σ
      assert((hi - lo).toDouble <= 8 * se + 1, s"$g band vs se")
    }
  }

  test("q_mannwhitney: U matches a driver-side average-rank recompute") {
    import spark.implicits._
    val rows = q("q_mannwhitney").run(spark, dir)
      .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
        col("ties"), col("z"))
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val base = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("a"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .as[(String, Boolean, Long)].collect().groupBy(_._1)
    rows.foreach { case (g, nA, nB, u2A, ties, z) =>
      val evs = base(g)
      assert(nA == evs.count(_._2) && nB == evs.count(!_._2))
      // textbook average ranks over the combined sample
      val sorted = evs.map(e => (e._3, e._2)).sortBy(_._1)
      val rank2: Seq[(Boolean, Long)] =
        sorted.zipWithIndex.groupBy(_._1._1).toSeq.flatMap {
          case (_, grp) =>
            val r2 = grp.head._2 + 1 + grp.last._2 + 1 // doubled avg rank
            grp.toSeq.map(e => (e._1._2, r2.toLong))
        }
      val r2A = rank2.collect { case (true, r) => r }.sum
      assert(u2A == r2A - nA * (nA + 1), s"$g U mismatch")
      // tie term recount
      val tieSum = sorted.groupBy(_._1).values
        .map(v => v.length.toLong).map(t => t * t * t - t).sum
      assert(ties == tieSum)
      // U is bounded by its domain and z is finite
      assert(u2A >= 0 && u2A <= 2 * nA * nB)
      assert(!z.isNaN && !z.isInfinite)
    }
  }

  test("q_psi_drift: PSI ties to a driver-side decile-bin recompute") {
    import spark.implicits._
    val rows = q("q_psi_drift").run(spark, dir)
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        col("psi_nanos"), col("alert"))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"))
      .as[(String, Long, Long)].collect()
    val eds = base.map(_._3)
    val split = eds.min + (eds.max - eds.min + 1) / 2
    val byG = base.groupBy(_._1)
    rows.foreach { case (g, nRef, nCur, psi, alert) =>
      val refV = byG(g).filter(_._3 < split).map(_._2).sorted
      val curV = byG(g).filter(_._3 >= split).map(_._2)
      assert(nRef == refV.length && nCur == curV.length)
      // decile edges by the query's rank rule over the ref histogram
      val edges = (1 to 9).map { k =>
        val target = refV.length.toLong * k / 10
        // smallest value whose cumulative count reaches the target
        val cum = refV.groupBy(identity).toSeq.sortBy(_._1)
          .scanLeft((Long.MinValue, 0L)) { case ((_, c), (v, g2)) =>
            (v, c + g2.length)
          }.drop(1)
        cum.find(_._2 >= target).get._1
      }
      def bin(v: Long): Int = edges.count(v > _)
      def cnt(vs: Seq[Long]): Map[Int, Long] =
        vs.groupBy(bin).map { case (b, v) => b -> v.length.toLong }
      val (rc, cc) = (cnt(refV.toSeq), cnt(curV.toSeq))
      val expected = (0 to 9).map { b =>
        val pr = (rc.getOrElse(b, 0L) + 1).toDouble / (nRef + 10)
        val pc = (cc.getOrElse(b, 0L) + 1).toDouble / (nCur + 10)
        math.floor((pc - pr) * math.log(pc / pr) * 1e9).toLong
      }.sum
      assert(psi == expected, s"$g psi $psi != $expected")
      assert(psi >= 0 && alert == (psi >= 200000000L))
    }
  }

  test("q_survival_km: product ties to a driver-side KM recompute") {
    import spark.implicits._
    // sf0.01 has a multi-step curve (sf0.001 has a single churn day)
    val d01 = "/root/testdata/sf0.01"
    val rows = q("q_survival_km").run(spark, d01)
      .select(col("day"), col("n_risk"), col("d_churn"), col("c_cens"),
        col("survival_ppm"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // independent spans straight off the events table
    val span = Tables.events(spark, d01)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .groupBy("user_id")
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .select(col("f").cast("string"), col("l").cast("string"))
      .as[(String, String)].collect()
      .map { case (f, l) =>
        (java.time.LocalDate.parse(f), java.time.LocalDate.parse(l))
      }
    val obsEnd = span.map(_._2).max(Ordering.by((d: java.time.LocalDate) =>
      d.toEpochDay))
    import java.time.temporal.ChronoUnit.DAYS
    val obs = span.map { case (f, l) =>
      val cens = DAYS.between(l, obsEnd) <= 0
      (if (cens) DAYS.between(f, obsEnd) else DAYS.between(f, l), cens)
    }
    var surv = 1.0
    rows.foreach { case (day, nRisk, dChurn, cCens, ppm) =>
      assert(nRisk == obs.count(_._1 >= day), s"day $day risk set")
      assert(dChurn == obs.count(o => o._1 == day && !o._2))
      assert(cCens == obs.count(o => o._1 == day && o._2))
      surv *= (nRisk - dChurn).toDouble / nRisk
      // nano-flooring of the log-steps can undershoot by a few ppm
      assert(math.abs(ppm - surv * 1e6) <= 3, s"day $day S=$surv vs $ppm")
    }
    // survival only ever decreases
    assert(rows.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q_embed_effrank: PR bounded by [1, d], trace positive") {
    import spark.implicits._
    val Array((n, d, tr, er, share)) = q("q_embed_effrank").run(spark, dir)
      .select(col("n_vectors"), col("d"), col("tr"), col("eff_rank_milli"),
        col("eff_rank_share_milli"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(n > 1 && d == 64)
    // total variance is positive unless all vectors are identical
    assert(tr > 0)
    // Cauchy-Schwarz bounds the participation ratio by [1, d]
    assert(er >= 1000 - 1 && er <= d * 1000 + 1, s"PR $er out of range")
    assert(share == er * 1000 / (d * 1000) || math.abs(share - er / d) <= 1)
    assert(share >= 0 && share <= 1000)
  }

  test("q_text_burstiness: VMR ties to a driver-side moment recompute") {
    import spark.implicits._
    val rows = q("q_text_burstiness").run(spark, dir)
      .select(col("tok"), col("n_occ"), col("df"), col("vmr_milli"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length > 5)
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("x"))
      .as[(Long, String, Long)].collect()
    val nd = Tables.documents(spark, dir).count()
    rows.foreach { case (tok, nOcc, df, vmr) =>
      val xs = perDoc.filter(_._2 == tok).map(_._3)
      assert(nOcc == xs.sum && df == xs.length)
      val sxx = xs.map(x => x * x).sum
      assert(vmr == (nd * sxx - nOcc * nOcc) * 1000 / (nd * nOcc),
        s"$tok vmr")
      // a term absent from some docs with multi-occurrence in others
      // is over-dispersed; VMR can never go below 0
      assert(vmr >= 0)
    }
    // the cut is the global top-20 by occurrence
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q_embed_fisher: ratios non-negative, report is the top-10 cut") {
    import spark.implicits._
    val rows = q("q_embed_fisher").run(spark, dir)
      .select(col("dim"), col("b"), col("w"), col("fisher_milli"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { case (dim, b, w, f) =>
      assert(dim >= 0 && dim < 64)
      // between/within masses are sums of floored non-negative terms
      assert(b >= -10 && w > 0, s"dim $dim masses")
      assert(math.abs(f - math.floor(b.toDouble / w * 1000).toLong) <= 0)
    }
    assert(rows.map(_._4).sliding(2).forall(v => v.length < 2 || v(0) >= v(1)))
    assert(rows.map(_._1).distinct.length == 10)
  }

  test("q_broken_stick: the chosen split beats the single fit") {
    import spark.implicits._
    val Array((n, brk, sl, sr, sse1, sse2, gain)) =
      q("q_broken_stick").run(spark, dir)
        .select(col("n_months"), col("break_idx"), col("slope_left"),
          col("slope_right"), col("sse_single"), col("sse_two"),
          col("gain_ppm"))
        .as[(Long, Long, Double, Double, Double, Double, Long)].collect()
    assert(n > 10)
    // the break is interior (>= 2 months on each side)
    val months = Tables.orders(spark, dir)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("i")).distinct().as[Long].collect().sorted
    assert(n == months.length)
    assert(brk >= months(1) && brk <= months(months.length - 3))
    // a two-segment fit can never do worse than one line through all
    assert(sse2 <= sse1 + 1e-6, s"two-fit SSE $sse2 above single $sse1")
    assert(gain >= 0 && gain <= 1000000)
    assert(!sl.isNaN && !sr.isNaN)
  }

  test("q_seasonal_decompose: indices tie to a driver-side decomposition") {
    import spark.implicits._
    val rows = q("q_seasonal_decompose").run(spark, dir)
      .select(col("moy"), col("n_obs"), col("seasonal_kd"),
        col("mean_abs_resid_kd"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 11L))
    rows.foreach { case (_, n, _, mar) => assert(n >= 2 && mar >= 0) }
    // full recompute: monthly kilodollars, centered MA-12 trend on
    // complete frames, month-of-year means of the detrended series
    val monthly = Tables.orders(spark, dir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("i"))
      .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))"
        + " div 100000").as("y"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val det = monthly.indices.flatMap { k =>
      val lo = k - 5; val hi = k + 6
      if (lo >= 0 && hi < monthly.length) {
        val trend = (lo to hi).map(monthly(_)._2).sum / 12
        Some((monthly(k)._1 % 12, monthly(k)._2 - trend))
      } else None
    }
    val expected = det.groupBy(_._1).map { case (m, v) =>
      m -> (v.length.toLong, v.map(_._2).sum / v.length)
    }
    rows.foreach { case (moy, n, s, _) =>
      val (en, es) = expected(moy)
      assert(n == en && s == es, s"moy $moy ($n,$s) != ($en,$es)")
    }
  }

  test("q_acf: coefficients bounded, lag-0 ties to the variance") {
    import spark.implicits._
    val rows = q("q_acf").run(spark, dir)
      .select(col("lag"), col("n_pairs"), col("acf"), col("significant"))
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 12L))
    val monthly = Tables.orders(spark, dir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("i"))
      .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))"
        + " div 100000").as("y"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = monthly.length
    val ys = monthly.map(_._2)
    rows.foreach { case (k, nPairs, acf, sig) =>
      assert(nPairs == n - k)
      // |r_k| <= 1 up to rounding; the recompute ties exactly
      assert(math.abs(acf) <= 1.000001, s"lag $k acf $acf")
      val s = ys.sum
      val c = ys.map(y => BigInt(n) * y - s)
      val num = (0 until n - k.toInt).map(t => c(t) * c(t + k.toInt)).sum
      val den = c.map(x => x * x).sum
      val expected = math.rint(
        num.toDouble / den.toDouble * 1e6) / 1e6
      assert(math.abs(acf - expected) <= 2e-6, s"lag $k $acf vs $expected")
      assert(sig == (math.abs(num.toDouble / den.toDouble)
        > 2.0 / math.sqrt(n.toDouble)))
    }
  }

  test("q_abtest_srm: all-integer chi-square ties and pools correctly") {
    import spark.implicits._
    val rows = q("q_abtest_srm").run(spark, dir)
      .select(col("event_type"), col("n_a"), col("n_b"), col("chi2_milli"),
        col("srm_alert"))
      .as[(String, Long, Long, Long, Boolean)].collect()
    val (all, per) = rows.partition(_._1 == "_ALL_")
    assert(all.length == 1 && per.nonEmpty)
    assert(all.head._2 == per.map(_._2).sum && all.head._3 == per.map(_._3).sum)
    val base = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("a"))
      .as[(String, Boolean)].collect()
    rows.foreach { case (g, nA, nB, chi, alert) =>
      if (g != "_ALL_") {
        assert(nA == base.count(e => e._1 == g && e._2))
        assert(nB == base.count(e => e._1 == g && !e._2))
      }
      assert(chi == (nA - nB) * (nA - nB) * 1000 / (nA + nB))
      assert(alert == ((nA - nB) * (nA - nB) * 1000 > 3841 * (nA + nB)))
    }
  }

  test("q_pareto_cells: exactly the undominated cells survive") {
    import spark.implicits._
    val frontier = q("q_pareto_cells").run(spark, dir)
      .select(col("source"), col("lang"), col("n_docs"), col("len_milli"),
        col("qual_micro"))
      .as[(String, String, Long, Long, Long)].collect()
    assert(frontier.nonEmpty)
    // rebuild the full cell table via the query's own metric columns
    // (same engine, independent of the skyline machinery)
    val cells = Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        floor(graft.operators.TextAnalysis.qualityScore(col("text")) * 1e6
          + lit(0.5)).cast("long").as("q"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
        sum(col("q")).as("sq"))
      .select(col("source"), col("lang"), col("n"),
        expr("sc * 1000 div n"), expr("sq div n"))
      .as[(String, String, Long, Long, Long)].collect()
    def dominates(b: (String, String, Long, Long, Long),
                  a: (String, String, Long, Long, Long)): Boolean =
      b._3 >= a._3 && b._4 >= a._4 && b._5 >= a._5 &&
        (b._3 > a._3 || b._4 > a._4 || b._5 > a._5)
    val expected = cells.filter(a => !cells.exists(b => dominates(b, a)))
      .map(c => (c._1, c._2)).toSet
    assert(frontier.map(c => (c._1, c._2)).toSet == expected)
  }

  test("q_bandit_ucb: bonus positive, order matches the UCB score") {
    import spark.implicits._
    val rows = q("q_bandit_ucb").run(spark, dir)
      .select(col("source"), col("n"), col("mean_micro"), col("ucb_micro"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val totalN = rows.map(_._2).sum
    rows.foreach { case (s, n, mean, ucb) =>
      assert(n > 0 && mean >= 0 && mean <= 1000000)
      // exploration bonus is strictly positive: UCB > mean
      assert(ucb > mean, s"$s ucb $ucb <= mean $mean")
      val expected = math.floor((mean / 1e6
        + math.sqrt(2.0 * math.log(totalN.toDouble) / n)) * 1e6).toLong
      // mean_micro is the floored integer mean; the query's double path
      // uses the unfloored ratio, so allow 1 micro of slack
      assert(math.abs(ucb - expected) <= 1, s"$s ucb $ucb vs $expected")
    }
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q_quantile_norm: normalized means contract toward the pooled mean") {
    import spark.implicits._
    val rows = q("q_quantile_norm").run(spark, dir)
      .select(col("source"), col("n_docs"), col("mean_before_micro"),
        col("mean_after_micro"), col("max_shift"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val pooledMean = docs.map(_._2).sum.toDouble / docs.length
    rows.foreach { case (s, n, before, _, shift) =>
      val mine = docs.filter(_._1 == s).map(_._2)
      assert(n == mine.length)
      assert(before == mine.sum * 1000000L / n)
      assert(shift >= 0)
    }
    // normalization contracts the spread of source means: the after
    // dispersion around the pooled mean is strictly below the before
    // dispersion (that is the transform's purpose)
    def disp(f: ((String, Long, Long, Long, Long)) => Long): Double =
      rows.map(r => math.abs(f(r) / 1e6 - pooledMean)).sum
    assert(disp(_._4) < disp(_._3), "normalization did not contract means")
  }

  test("q_gate_wilson: interval brackets p-hat and the algebra ties") {
    import spark.implicits._
    val rows = q("q_gate_wilson").run(spark, dir)
      .select(col("source"), col("n"), col("k"), col("p_milli"),
        col("wilson_lo_milli"), col("wilson_hi_milli"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    rows.foreach { case (s, n, k, p, lo, hi) =>
      val mine = docs.filter(_._1 == s)
      assert(n == mine.length && k == mine.count(_._2 >= 400))
      assert(p == k * 1000 / n)
      // Wilson recompute (z² = 3.8416)
      val z2 = 3.8416
      val centre = (k + z2 / 2) / (n + z2)
      val half = math.sqrt(z2) *
        math.sqrt(k * (n - k) / n.toDouble + z2 / 4) / (n + z2)
      assert(lo == math.floor((centre - half) * 1000).toLong, s"$s lo")
      assert(hi == math.floor((centre + half) * 1000).toLong, s"$s hi")
      // the band stays inside [0, 1000] and brackets p-hat
      assert(lo >= 0 && hi <= 1000 && lo <= p && p <= hi + 1)
    }
  }

  test("q_event_cond_entropy: bounds and recompute hold") {
    import spark.implicits._
    val Array((nTr, nSt, hNext, hCond, gain)) =
      q("q_event_cond_entropy").run(spark, dir)
        .select(col("n_transitions"), col("n_states"), col("h_next_nanos"),
          col("h_cond_nanos"), col("info_gain_nanos"))
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(nTr > 0 && nSt > 1)
    // entropy bounds: 0 <= H(next|cur) <= H(next) <= ln(#states),
    // each with nano-flooring slack proportional to the cell count
    val slack = nSt * nSt + nSt
    assert(hCond >= 0 && hNext >= 0)
    assert(hCond <= hNext + slack, s"conditioning increased entropy")
    assert(gain == hNext - hCond)
    assert(hNext <= math.ceil(math.log(nSt.toDouble) * 1e9).toLong + slack)
    // driver-side recompute from the raw transition counts
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .groupBy(_._1).values.flatMap { evs =>
        evs.sortBy(e => (e._2.getTime, e._3)).map(_._4).toList.sliding(2)
          .collect { case List(a, b) => (a, b) }
      }.toSeq
    assert(nTr == pairs.length)
    val nij = pairs.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val ni = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val expected = nij.map { case ((i, _), n) =>
      math.floor(n.toDouble / nTr * math.log(ni(i).toDouble / n) * 1e9).toLong
    }.sum
    assert(hCond == expected, s"hCond $hCond != $expected")
  }

  test("q_graph_modularity: contributions sum to the _ALL_ row, Q bounded") {
    import spark.implicits._
    val rows = q("q_graph_modularity").run(spark, dir)
      .select(col("brand"), col("e_c"), col("d_c"), col("contrib_nanos"))
      .as[(String, Long, Long, Long)].collect()
    val (all, brands) = rows.partition(_._1 == "_ALL_")
    assert(all.length == 1 && brands.nonEmpty)
    val (_, eAll, dAll, qNanos) = all.head
    assert(eAll == brands.map(_._2).sum)
    assert(dAll == brands.map(_._3).sum)
    assert(qNanos == brands.map(_._4).sum)
    // every edge endpoint is branded: degree mass = 2 * edge count is
    // an upper bound on intra-edge mass; Q sits in its theory range
    assert(brands.forall { case (_, e, d, _) => 2 * e <= d })
    assert(qNanos >= -500000000L && qNanos <= 1000000000L)
  }

  test("q_sample_priority: estimator ties to a driver-side DLT recompute") {
    import spark.implicits._
    val rows = q("q_sample_priority").run(spark, dir)
      .select(col("event_type"), col("n_total"), col("exact_cents"),
        col("n_samp"), col("est_cents"), col("err_ppm"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val base = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id").cast("string"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("w"),
        graft.operators.Sampling.hashBasisPoints(
          col("event_id").cast("string")).as("bp"))
      .as[(String, String, Long, Long)].collect()
    // the query's exact priority order and tau
    val pri = base.map { case (g, id, w, bp) =>
      (g, id, w, w.toDouble / ((bp + 0.5) / 10000.0))
    }.sortWith((a, b) => a._4 > b._4 || (a._4 == b._4 && a._2 < b._2))
    val k = 512
    assert(base.length > k)
    val tau = pri(k)._4
    val samp = pri.take(k)
    rows.foreach { case (g, nTot, exact, nSamp, est, err) =>
      assert(nTot == base.count(_._1 == g))
      assert(exact == base.filter(_._1 == g).map(_._3).sum)
      val mine = samp.filter(_._1 == g)
      assert(nSamp == mine.length, s"$g sample size")
      val expected = math.floor(
        mine.filter(_._3.toDouble > tau).map(_._3).sum.toDouble
          + mine.count(_._3.toDouble <= tau).toDouble * tau).toLong
      assert(est == expected, s"$g est $est != $expected")
      assert(err == (est - exact) * 1000000L / exact)
    }
    // the weighted sample skews toward heavy rows: its mean weight
    // dominates the population mean
    val sampMean = samp.map(_._3).sum.toDouble / samp.length
    val popMean = base.map(_._3).sum.toDouble / base.length
    assert(sampMean > popMean, "priority sample not weight-biased")
  }

  test("q_ks_test: D ties to a driver-side empirical-CDF recompute") {
    import spark.implicits._
    val rows = q("q_ks_test").run(spark, dir)
      .select(col("event_type"), col("n_a"), col("n_b"), col("d_num"),
        col("d_micro"), col("reject_05"))
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val base = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("a"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .as[(String, Boolean, Long)].collect().groupBy(_._1)
    rows.foreach { case (g, nA, nB, dNum, dMicro, reject) =>
      val evs = base(g)
      assert(nA == evs.count(_._2) && nB == evs.count(!_._2))
      // scaled sup-gap over every distinct value
      val values = evs.map(_._3).distinct.sorted
      val expected = values.map { v =>
        val ca = evs.count(e => e._2 && e._3 <= v).toLong
        val cb = evs.count(e => !e._2 && e._3 <= v).toLong
        math.abs(ca * nB - cb * nA)
      }.max
      assert(dNum == expected, s"$g D $dNum != $expected")
      assert(dMicro == dNum * 1000000L / (nA * nB))
      val crit = 1.844164 * nA * nB * (nA + nB)
      assert(reject == (dNum.toDouble * dNum > crit))
    }
  }

  test("q_text_heaps: fit ties to the per-source profile moments") {
    import spark.implicits._
    val Array((n, beta, kMilli)) = q("q_text_heaps").run(spark, dir)
      .select(col("n_sources"), col("beta"), col("k_milli"))
      .as[(Long, Double, Long)].collect()
    // one point per source, a defined fit, positive K
    assert(n > 1 && kMilli > 0)
    assert(!beta.isNaN && beta > -1 && beta < 1.2)
    // recompute the slope from the integer log coordinates
    val pts = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("v"), sum(col("c")).as("nt"))
      .as[(String, Long, Long)].collect()
      .map { case (_, v, nt) =>
        (math.floor(math.log(nt.toDouble) * 1e9).toLong,
          math.floor(math.log(v.toDouble) * 1e9).toLong)
      }
    assert(n == pts.length)
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val slope = (n * sxy.toDouble - sx.toDouble * sy) /
      (n * sxx.toDouble - sx.toDouble * sx)
    assert(math.abs(beta - slope) <= 1e-6, s"beta $beta vs $slope")
  }

  test("q_rank_fusion: RRF algebra and per-query ordering hold") {
    import spark.implicits._
    val rows = q("q_rank_fusion").run(spark, dir)
      .select(col("doc_id"), col("rnk"), col("neighbor"), col("fused_micro"),
        col("r_cos"), col("r_jac"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, _, fused, rCos, rJac) =>
      // at least one leg ranked the candidate, each within its top-20
      assert(rCos.nonEmpty || rJac.nonEmpty, s"q$qid no leg")
      rCos.foreach(r => assert(r >= 1 && r <= 20))
      rJac.foreach(r => assert(r >= 1 && r <= 20))
      val expected = rCos.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rJac.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(fused == expected, s"q$qid fused $fused != $expected")
    }
    rows.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      // dense ranks from 1, fused scores non-increasing
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)))
    }
  }

  test("q_chao_richness: estimator algebra ties to the frequency profile") {
    import spark.implicits._
    val rows = q("q_chao_richness").run(spark, dir)
      .select(col("source"), col("vocab"), col("n_tokens"), col("f1"),
        col("f2"), col("chao1_milli"), col("gt_coverage_ppm"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, v, n, f1, f2, chao, cov) =>
      assert(f1 + f2 <= v && f1 <= n, s"$s profile bounds")
      // bias-corrected Chao1 never estimates below the observed vocab
      assert(chao >= v * 1000, s"$s chao below vocab")
      assert(chao == v * 1000 + f1 * (f1 - 1) * 1000 / (2 * (f2 + 1)))
      assert(cov == 1000000 - f1 * 1000000 / n)
      assert(cov >= 0 && cov <= 1000000)
    }
  }
}
