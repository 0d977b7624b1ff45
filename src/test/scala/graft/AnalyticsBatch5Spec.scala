package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-4 batch-5 analytics queries
  * (sessionize, OHLC downsample, market basket, MoM growth) on
  * sf0.001 — the oracle parity harness re-checks full values at
  * sf0.01; these assert the internal invariants a hash can't name. */
class AnalyticsBatch5Spec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  test("q_sessionize: per-user session indices are dense and gap-consistent") {
    import spark.implicits._
    val rows = q("q_sessionize").run(spark, dir)
      .select(col("user_id"), col("ts"), col("session_idx"), col("is_start"))
      .as[(Long, java.sql.Timestamp, Long, Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      // first event of every user starts session 1
      assert(sorted.head._4 && sorted.head._3 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b._2.getTime - a._2.getTime
          if (b._4) {
            // a start increments the index and must follow a >30min gap
            // (ms-floored view of the µs-exact test, hence >=)
            assert(b._3 == a._3 + 1 && gapMs >= 30L * 60 * 1000)
          } else {
            assert(b._3 == a._3 && gapMs <= 30L * 60 * 1000 + 1)
          }
        case _ => ()
      }
    }
  }

  test("q_downsample_ohlc: open/close bracketed by low/high, counts total") {
    import spark.implicits._
    val rows = q("q_downsample_ohlc").run(spark, dir)
      .select(col("n_events"), col("open_cents"), col("close_cents"),
        col("high_cents"), col("low_cents"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, o, c, hi, lo) =>
      assert(n >= 1 && lo <= hi)
      assert(o >= lo && o <= hi && c >= lo && c <= hi)
    }
    val total = rows.map(_._1).sum
    val events = Tables.events(spark, dir).count()
    assert(total == events)
  }

  test("q_market_basket: ordered pairs, support bounds, exact lift arithmetic") {
    import spark.implicits._
    val rows = q("q_market_basket").run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val nOrders = Tables.lineitem(spark, dir)
      .select(col("l_orderkey")).distinct().count()
    // result columns: pa, pb, support, fa, fb, lift_micros
    rows.foreach { case (pa, pb, sup, fa, fb, lift) =>
      assert(pa < pb && sup >= 2 && fa >= sup && fb >= sup)
      val denom = fa * fb
      assert(lift == (sup * nOrders * 1000000L + denom / 2) / denom)
    }
  }

  test("q_feature_hash: buckets in range, occurrence mass equals token count") {
    import spark.implicits._
    val rows = q("q_feature_hash").run(spark, dir)
      .select(col("bucket"), col("n_occurrences"), col("n_terms"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (b, occ, t) =>
      b >= 0 && b < 64 && t >= 1 && occ >= t
    })
    val totalTokens = Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").count()
    assert(rows.map(_._2).sum == totalTokens)
  }

  test("q_audience_overlap: inclusion-exclusion bounds hold on every pair") {
    import spark.implicits._
    val rows = q("q_audience_overlap").run(spark, dir)
      .select(col("n_a"), col("n_b"), col("n_union"), col("n_overlap"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (na, nb, nu, nov) =>
      assert(nov == na + nb - nu)
      assert(nov >= 0 && nov <= math.min(na, nb))
      assert(nu >= math.max(na, nb) && nu <= na + nb)
    }
  }

  test("q_zone_skip: pruned cells never contain a matching row; some prune") {
    import spark.implicits._
    val rows = q("q_zone_skip").run(spark, dir)
      .select(col("pruned"), col("n_matching"), col("n_rows"))
      .as[(Boolean, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the data-skipping soundness invariant
    assert(rows.filter(_._1).forall(_._2 == 0L))
    // and the layout actually earns its keep on this predicate
    assert(rows.exists(_._1) && rows.exists(r => !r._1 && r._2 > 0))
  }

  test("q_rolling_wau: WAU dominates DAU and any single-day audience") {
    import spark.implicits._
    val rows = q("q_rolling_wau").run(spark, dir)
      .select(col("day"), col("dau"), col("wau"), col("stickiness_bps"))
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().sortBy(_._1.getTime)
    assert(rows.length > 7)
    val dauByDay = rows.map(r => r._1.getTime -> r._2).toMap
    rows.foreach { case (d, dau, wau, bps) =>
      assert(dau >= 1 && wau >= dau)
      assert(bps == dau * 10000L / wau)
      // WAU can't exceed the sum of the window's DAUs
      val windowSum = (0 to 6).flatMap(k =>
        dauByDay.get(d.getTime - k * 86400000L)).sum
      assert(wau <= windowSum)
    }
  }

  test("q_delta_agg: merged partials equal the direct full aggregate") {
    import spark.implicits._
    val merged = q("q_delta_agg").run(spark, dir)
      .as[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._1)
    val direct = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)), sum(floor(col("value") * 100 + 0.5).cast("long")),
        min(col("ts")), max(col("ts")))
      .as[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._1)
    assert(merged.nonEmpty && merged.sameElements(direct))
  }

  test("q_column_stats: one row per column, NDV bounded by non-null rows") {
    import spark.implicits._
    val rows = q("q_column_stats").run(spark, dir)
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("ndv"))
      .as[(String, Long, Long, Long)].collect()
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("event_id", "event_type", "props", "user_id", "value"))
    rows.foreach { case (_, n, nulls, ndv) =>
      assert(n == total && nulls >= 0 && ndv >= 1 && ndv <= n - nulls)
    }
    // event_id is the row key: all-distinct, never null
    val id = rows.find(_._1 == "event_id").get
    assert(id._3 == 0 && id._4 == total)
  }

  test("q_mix_drift: shares nearly sum to 10000 bps, drift non-negative") {
    import spark.implicits._
    val rows = q("q_mix_drift").run(spark, dir)
      .select(col("day"), col("max_drift_bps"), col("total_bps"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
    val nDays = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts"))).distinct().count()
    assert(rows.length == nDays - 1) // first day has no predecessor
    val nTypes = Tables.events(spark, dir)
      .select(col("event_type")).distinct().count()
    rows.foreach { case (_, drift, total) =>
      assert(drift >= 0 && drift <= 10000)
      // per-type truncation loses < 1 bp each
      assert(total > 10000 - nTypes && total <= 10000)
    }
  }

  test("q_dedup_cluster_sizes: doc mass conserved, histogram arithmetic") {
    import spark.implicits._
    val rows = q("q_dedup_cluster_sizes").run(spark, dir)
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (size, nc, nd) =>
      assert(size >= 1 && nc >= 1 && nd == size * nc)
    }
    assert(rows.map(_._3).sum == Tables.documents(spark, dir).count())
  }

  test("q_small_qty_revenue: matches the naive correlated formulation") {
    import spark.implicits._
    val (rev, n) = q("q_small_qty_revenue").run(spark, dir)
      .as[(Double, Long)].collect().head
    // naive recompute: per-part avg via a window, float 20% threshold
    // with integral quantities (milli-unit compare == 0.2*avg compare)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = li.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(_._2).sum / rs.length
    }
    val small = li.filter { case (k, q2, _) => q2 < 0.2 * avg(k) }
    assert(n == small.length)
    val cents = small.map { case (_, _, p) => math.floor(p * 10000 + 0.5).toLong }.sum
    assert(math.abs(rev - cents / 10000.0) < 1e-9)
  }

  test("q_conversion_latency: counts consistent, percentiles ordered") {
    import spark.implicits._
    val (nUsers, nConv, p50, p90) = q("q_conversion_latency").run(spark, dir)
      .as[(Long, Long, Double, Double)].collect().head
    val totalUsers = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(nUsers == totalUsers && nConv <= nUsers)
    assert(p50 >= 0 && p90 >= p50)
  }

  test("q_argmin_join: one row per part, genuinely the minimum offer") {
    import spark.implicits._
    val rows = q("q_argmin_join").run(spark, dir)
      .select(col("l_partkey"), col("best_price"), col("s_suppkey"))
      .as[(Long, Double, Long)].collect()
    assert(rows.map(_._1).distinct.length == rows.length)
    val minByPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(min(floor(col("l_extendedprice") * 10000 + 0.5).cast("long")).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (pk, price, _) =>
      assert(math.abs(price - minByPart(pk) / 10000.0) < 1e-9)
    }
    assert(rows.length == minByPart.size)
  }

  test("q_mom_growth: delta ties to adjacent months, growth sign matches") {
    import spark.implicits._
    val rows = q("q_mom_growth").run(spark, dir)
      .select(col("month"), col("revenue_cents"), col("prev_cents"),
        col("delta_cents"), col("growth_bps"))
      .as[(java.sql.Timestamp, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1.getTime)
    assert(rows.length > 12)
    val byMonth = rows.map(r => r._1 -> r._2).toMap
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    rows.foreach { case (m, rev, prev, delta, bps) =>
      prev.foreach { p =>
        assert(delta.contains(rev - p))
        assert(bps.exists(b => (b >= 0) == (rev - p >= 0)))
        // prev really is the immediately preceding calendar month
        cal.setTimeInMillis(m.getTime); cal.add(java.util.Calendar.MONTH, -1)
        val pm = new java.sql.Timestamp(cal.getTimeInMillis)
        assert(byMonth.get(pm).contains(p), s"month $m prev $pm")
      }
    }
  }
}
