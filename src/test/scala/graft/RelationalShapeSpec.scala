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
}
