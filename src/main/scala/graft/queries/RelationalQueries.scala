package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Classic warehouse-shape relational queries (TPC-H Q13/Q14/Q20
  * analogs) — the decision-support patterns a lakehouse engine must
  * plan well: outer-join count distributions, conditional-aggregate
  * shares, and correlated dominance thresholds. All money in integer
  * cents (single IEEE multiply then floor — bit-identical in both
  * engines), quantities as exact BIGINTs.
  */
object RelationalQueries {

  /** TPC-H Q13 shape: distribution of customers by order count,
    * INCLUDING zero-order customers (the left outer join is the whole
    * point — an inner join silently drops the largest cohort). One
    * shuffle on custkey for the join+count, then a tiny histogram
    * aggregate. At 100 TB both sides are large: this is the canonical
    * sort-merge join, and the count(o_orderkey) null-skip gives the
    * zero bucket for free. */
  val qCustOrderHistogram: Q = Q(
    "q_cust_order_histogram",
    (spark, dir) => {
      val perCust = Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      WITH pc AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      SELECT c_count, count(*) AS custdist
      FROM pc GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """.trim))

  /** TPC-H Q14 shape: monthly share of revenue from PROMO-type parts.
    * Conditional aggregation over the fact×dim join — part is the
    * broadcast side (dimension tables stay orders of magnitude smaller
    * than the fact at every scale), so the fact never shuffles; each
    * month contributes one partial row. Share reported in exact
    * micro-units of the cent ratio (single integer division). */
  val qPromoShare: Q = Q(
    "q_promo_share",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_partkey"),
          trunc(col("l_shipdate"), "month").as("month"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
            .cast("long").as("rev_cents"))
      li.join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey").as("l_partkey"), col("p_type"))),
          Seq("l_partkey"))
        .groupBy(col("month"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_cents"))
            .otherwise(lit(0L))).as("promo_cents"),
          sum(col("rev_cents")).as("total_cents"))
        .select(col("month"), col("promo_cents"), col("total_cents"),
          expr("promo_cents * 1000000L DIV total_cents").as("share_micros"))
        .orderBy(col("month"))
    },
    Some("""
      WITH li AS (
        SELECT l_partkey, CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
               CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                    AS BIGINT) AS rev_cents
        FROM lineitem),
      j AS (
        SELECT month,
               CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_cents ELSE 0 END)
                    AS BIGINT) AS promo_cents,
               CAST(sum(rev_cents) AS BIGINT) AS total_cents
        FROM li JOIN part ON l_partkey = p_partkey
        GROUP BY month)
      SELECT month, promo_cents, total_cents,
             promo_cents * 1000000 // total_cents AS share_micros
      FROM j ORDER BY month
    """.trim))

  /** TPC-H Q20 shape: suppliers who DOMINATE a part's supply — shipped
    * more than twice a fair (per-supplier average) share of that
    * part's total quantity. The correlated subquery becomes a
    * two-level aggregate joined back on partkey (per-(part,supplier)
    * partials reshuffle into per-part totals — no fact re-scan), and
    * the threshold is the exact integer cross product
    * sq * n_supp > 2 * pq. Reported per supplier with name, ordered
    * by dominated-part count. */
  val qExcessStock: Q = Q(
    "q_excess_stock",
    (spark, dir) => {
      val sp = Tables.lineitem(spark, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      val pt = sp.groupBy(col("l_partkey")).agg(sum(col("sq")).as("pq"),
        count(lit(1)).as("n_supp"))
      val dominant = sp.join(pt, Seq("l_partkey"))
        .filter(col("n_supp") > 1 && col("sq") * col("n_supp") > col("pq") * 2)
      dominant.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_dominated_parts"),
          sum(col("sq")).as("dominated_qty"))
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))), Seq("l_suppkey"))
        .select(col("l_suppkey").as("suppkey"), col("s_name"),
          col("n_dominated_parts"), col("dominated_qty"))
        .orderBy(col("n_dominated_parts").desc, col("suppkey"))
        .limit(100)
    },
    Some("""
      WITH sp AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem GROUP BY l_partkey, l_suppkey),
      pt AS (
        SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS pq,
               count(*) AS n_supp
        FROM sp GROUP BY l_partkey),
      dom AS (
        SELECT sp.l_suppkey, sp.sq
        FROM sp JOIN pt USING (l_partkey)
        WHERE pt.n_supp > 1 AND sp.sq * pt.n_supp > pt.pq * 2),
      agg AS (
        SELECT l_suppkey AS suppkey, count(*) AS n_dominated_parts,
               CAST(sum(sq) AS BIGINT) AS dominated_qty
        FROM dom GROUP BY l_suppkey)
      SELECT suppkey, s_name, n_dominated_parts, dominated_qty
      FROM agg JOIN supplier ON suppkey = s_suppkey
      ORDER BY n_dominated_parts DESC, suppkey LIMIT 100
    """.trim))

  def all: Seq[Q] = Seq(qCustOrderHistogram, qPromoShare, qExcessStock)
}
