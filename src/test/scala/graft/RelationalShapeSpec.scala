package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the TPC-H-shape relational queries on sf0.001. */
class RelationalShapeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  test("q_cust_order_histogram: buckets account for every customer") {
    import spark.implicits._
    val hist = q("q_cust_order_histogram").run(spark, dir)
      .as[(Long, Long)].collect()
    val nCust = Tables.customer(spark, dir).count()
    assert(hist.map(_._2).sum == nCust, "histogram partitions the customers")
    // the left join must preserve the zero-order cohort if one exists
    val withOrders = Tables.orders(spark, dir)
      .select(col("o_custkey")).distinct().count()
    if (withOrders < nCust)
      assert(hist.exists(_._1 == 0L), "zero-order bucket missing")
  }

  test("q_promo_share: promo <= total and share arithmetic exact") {
    import spark.implicits._
    val rows = q("q_promo_share").run(spark, dir)
      .select(col("promo_cents"), col("total_cents"), col("share_micros"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, t, s) =>
      assert(p >= 0 && p <= t)
      assert(s == p * 1000000L / t)
    }
  }

  test("q_excess_stock: every reported supplier exceeds 2x fair share somewhere") {
    import spark.implicits._
    val res = q("q_excess_stock").run(spark, dir)
      .select(col("suppkey"), col("n_dominated_parts")).as[(Long, Long)].collect()
    assert(res.nonEmpty)
    // recompute one supplier's dominance imperatively
    val sp = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
      .as[(Long, Long, Long)].collect()
    val byPart = sp.groupBy(_._1)
    val dominated = sp.filter { case (pk, _, sq) =>
      val grp = byPart(pk)
      grp.length > 1 && sq * grp.length > 2 * grp.map(_._3).sum
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    res.foreach { case (sk, n) => assert(dominated(sk) == n) }
  }

  test("q_volume_shipping: only the two configured nations, both directions distinct") {
    import spark.implicits._
    // sf0.001 is too sparse for the nation-pair intersection; sf0.01
    // (the correctness-gate SF) is the smallest with nonempty output.
    val rows = q("q_volume_shipping").run(spark, "/root/testdata/sf0.01")
      .select(col("supp_nation"), col("cust_nation"), col("rev_cents"))
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    val nations = Set("NATION_1", "NATION_2")
    rows.foreach { case (s, c, rev) =>
      assert(nations(s) && nations(c) && s != c)
      assert(rev > 0)
    }
  }

  test("q_market_share: nation_cents <= total_cents and micro-share exact") {
    import spark.implicits._
    val rows = q("q_market_share").run(spark, dir)
      .select(col("nation_cents"), col("total_cents"), col("share_micros"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, t, s) =>
      assert(n >= 0 && n <= t)
      assert(s == n * 1000000L / t)
    }
  }

  test("q_top_supplier: reported revenue is the per-supplier maximum") {
    import spark.implicits._
    val res = q("q_top_supplier").run(spark, dir)
      .select(col("rev_cents")).as[Long].collect()
    assert(res.nonEmpty)
    assert(res.distinct.length == 1, "ties all report the same max revenue")
    val all = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100 + 0.5).cast("long")).as("rc"))
      .agg(max(col("rc"))).as[Long].head()
    assert(res.head == all)
  }

  test("q_large_orders: every order exceeds the 200-unit threshold") {
    import spark.implicits._
    val rows = q("q_large_orders").run(spark, dir)
      .select(col("orderkey"), col("total_qty")).as[(Long, Long)].collect()
    rows.foreach { case (_, qty) => assert(qty > 200) }
    // recompute one order imperatively
    rows.headOption.foreach { case (ok, qty) =>
      val expect = Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") === ok)
        .agg(sum(col("l_quantity").cast("long"))).as[Long].head()
      assert(expect == qty)
    }
  }

  test("q_late_sole_supplier: reported suppliers were sole late shippers") {
    import spark.implicits._
    val res = q("q_late_sole_supplier").run(spark, dir)
      .select(col("suppkey"), col("numwait")).as[(Long, Long)].collect()
    assert(res.nonEmpty)
    // imperative recompute on the small SF
    val pos = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((datediff(col("l_shipdate"), col("o_orderdate")) > 365)
        .cast("int")).as("late"))
      .as[(Long, Long, Int)].collect()
    val byOrder = pos.groupBy(_._1)
    val expect = pos.filter { case (ok, _, late) =>
      val grp = byOrder(ok)
      late == 1 && grp.length > 1 && grp.map(_._3).sum == 1
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    res.foreach { case (sk, n) => assert(expect(sk) == n) }
  }

  test("q_dormant_rich: every counted customer is above average and dormant") {
    import spark.implicits._
    val total = q("q_dormant_rich").run(spark, dir)
      .agg(sum(col("n_custs"))).as[Long].head()
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bc"))
      .as[(Long, Long)].collect()
    val pos = cust.map(_._2).filter(_ > 0)
    val avg = pos.sum / pos.length
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey")).distinct().as[Long].collect().toSet
    val expect = cust.count { case (ck, bc) => bc > avg && !recent(ck) }
    assert(total == expect)
  }

  test("q_ship_priority: bounded top-10, dates straddle the cutoff") {
    import spark.implicits._
    val rows = q("q_ship_priority").run(spark, dir)
      .select(col("orderkey"), col("rev_cents")).as[(Long, Long)].collect()
    assert(rows.length <= 10)
    assert(rows.map(_._2).sameElements(rows.map(_._2).sortBy(-_)),
      "revenue must be descending")
    assert(rows.map(_._2).forall(_ > 0))
  }

  test("q_priority_wait: matches a naive per-order late-exists recompute") {
    import spark.implicits._
    val res = q("q_priority_wait").run(spark, dir)
      .as[(String, Long)].collect().toMap
    val late = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-04-01") &&
        datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .select(col("o_orderpriority"), col("o_orderkey")).distinct()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)))
      .as[(String, Long)].collect().toMap
    assert(res == late)
  }

  test("q_local_volume: only EUROPE nations, positive revenue") {
    import spark.implicits._
    val rows = q("q_local_volume").run(spark, dir)
      .as[(String, Long)].collect()
    val eur = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).as[String].collect().toSet
    assert(rows.nonEmpty)
    rows.foreach { case (n, c) => assert(eur(n)); assert(c > 0) }
  }

  test("q_forecast_revenue: exact against a collected recompute") {
    import spark.implicits._
    val (cents, n) = q("q_forecast_revenue").run(spark, dir)
      .as[(Long, Long)].head()
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_shipdate").cast("string"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice"))
      .as[(String, Double, Double, Double)].collect()
    val sel = rows.filter { case (d, disc, qty, _) =>
      d >= "1997-01-01" && d < "1998-01-01" &&
        disc >= 0.04 && disc <= 0.06 && qty < 24 }
    assert(n == sel.length)
    assert(cents == sel.map { case (_, disc, _, ep) =>
      math.floor(ep * disc * 100 + 0.5).toLong }.sum)
  }

  test("q_returned_items: descending, only R-flag revenue counted") {
    import spark.implicits._
    val rows = q("q_returned_items").run(spark, dir)
      .select(col("custkey"), col("lost_cents")).as[(Long, Long)].collect()
    assert(rows.length <= 20)
    assert(rows.map(_._2).sameElements(rows.map(_._2).sortBy(-_)))
    assert(rows.forall(_._2 > 0))
  }

  test("q_lateness_priority: line accounting ties to the year's join") {
    import spark.implicits._
    val res = q("q_lateness_priority").run(spark, dir)
      .select(col("high_prio_lines") + col("low_prio_lines")).as[Long].collect()
    val totalLines = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(res.sum == totalLines, "every joined line lands in exactly one bucket")
  }

  test("q_supplier_breadth: counts bounded by total suppliers, brand excluded") {
    import spark.implicits._
    val rows = q("q_supplier_breadth").run(spark, dir)
      .select(col("p_brand"), col("supplier_cnt")).as[(String, Long)].collect()
    val nSupp = Tables.supplier(spark, dir).count()
    assert(rows.nonEmpty)
    rows.foreach { case (b, c) =>
      assert(b != "Brand#1")
      assert(c >= 1 && c <= nSupp)
    }
  }

  test("q_whale_share: whales are a minority holding an outsized share") {
    import spark.implicits._
    val rows = q("q_whale_share").run(spark, dir)
      .select(col("n_custs"), col("n_whales"), col("total_cents"),
        col("whale_cents"), col("whale_share_micros"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, w, tot, wc, share) =>
      assert(w < n, "the top decile is a strict minority")
      assert(w >= 1)
      assert(wc <= tot)
      assert(share == wc * 1000000L / tot)
      assert(share * 10 > 1000000L,
        "top decile must hold more than a uniform 10% share")
    }
  }

  test("q_cycle_time: percentiles ordered, mean within range") {
    import spark.implicits._
    val rows = q("q_cycle_time").run(spark, dir)
      .select(col("n_orders"), col("p50_days"), col("p90_days"),
        col("mean_micro_days")).as[(Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, p50, p90, mean) =>
      assert(n > 0)
      assert(p50 <= p90)
      assert(mean >= 0)
    }
  }

  test("q_brand_revenue: exact against a collected recompute") {
    import spark.implicits._
    val (cents, n) = q("q_brand_revenue").run(spark, dir)
      .as[(Long, Long)].head()
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .as[(Long, String, Int)].collect()
      .map(p => p._1 -> (p._2, p._3)).toMap
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount")).as[(Long, Double, Double, Double)].collect()
    val sel = rows.filter { case (pk, qty, _, _) =>
      parts.get(pk).exists { case (b, sz) =>
        (b == "Brand#12" && sz >= 1 && sz <= 15 && qty >= 1 && qty <= 11) ||
        (b == "Brand#23" && sz >= 1 && sz <= 25 && qty >= 10 && qty <= 20) ||
        (b == "Brand#34" && sz >= 1 && sz <= 35 && qty >= 20 && qty <= 30) } }
    assert(n == sel.length)
    assert(cents == sel.map { case (_, _, ep, disc) =>
      math.floor(ep * (1.0 - disc) * 100 + 0.5).toLong }.sum)
  }
}
