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
}
