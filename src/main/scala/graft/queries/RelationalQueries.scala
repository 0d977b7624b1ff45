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

  /** TPC-H Q7 shape: bilateral shipping volume between two nations by
    * ship year. The nation filter lands on BOTH dimension sides before
    * any fact join — supplier shrinks to a broadcast, customer shrinks
    * ~12.5× before its shuffle join with orders — and the fact×fact
    * lineitem⋈orders join is the one unavoidable sort-merge. Revenue
    * in exact integer cents. */
  val qVolumeShipping: Q = Q(
    "q_volume_shipping",
    (spark, dir) => {
      val nations = Seq("NATION_1", "NATION_2")
      val nat = Tables.nation(spark, dir)
        .filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey"), col("n_name"))
      val supp = broadcast(Tables.supplier(spark, dir)
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cust = Tables.customer(spark, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(spark, dir)
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100 + 0.5).cast("long")).as("rev_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS rev_cents,
             count(*) AS n_lines
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        AND cn.n_name IN ('NATION_1', 'NATION_2')
        AND sn.n_name <> cn.n_name
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """.trim))

  /** TPC-H Q8 shape: one supplier-nation's market share, per year, of
    * revenue delivered to customers in one region. Conditional
    * aggregation over the joined fact — the share numerator is a
    * CASE'd partial of the same pass, never a second scan. Share in
    * exact integer micro-units. */
  val qMarketShare: Q = Q(
    "q_market_share",
    (spark, dir) => {
      val natReg = broadcast(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey")))
      val cust = Tables.customer(spark, dir)
        .join(natReg, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = broadcast(Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation")))
      Tables.lineitem(spark, dir)
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(when(col("supp_nation") === "NATION_2",
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 100 + 0.5).cast("long")).otherwise(lit(0L))).as("nation_cents"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long")).as("total_cents"))
        .select(col("l_year"), col("nation_cents"), col("total_cents"),
          expr("nation_cents * 1000000L DIV total_cents").as("share_micros"))
        .orderBy(col("l_year"))
    },
    Some("""
      WITH f AS (
        SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year, sn.n_name AS supp_nation,
               CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                    AS BIGINT) AS cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA')),
      a AS (
        SELECT l_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN cents ELSE 0 END)
                    AS BIGINT) AS nation_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM f GROUP BY l_year)
      SELECT l_year, nation_cents, total_cents,
             nation_cents * 1000000 // total_cents AS share_micros
      FROM a ORDER BY l_year
    """.trim))

  /** TPC-H Q15 shape: the top supplier(s) by revenue in one quarter —
    * an argmax over an aggregate, ties kept. The max is a one-row
    * broadcast joined back against the per-supplier aggregate (never a
    * global sort), and exact integer cents make the equality join
    * safe. */
  val qTopSupplier: Q = Q(
    "q_top_supplier",
    (spark, dir) => {
      val rev = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100 + 0.5).cast("long")).as("rev_cents"))
      val top = broadcast(rev.agg(max(col("rev_cents")).as("max_cents")))
      rev.crossJoin(top)
        .filter(col("rev_cents") === col("max_cents"))
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))),
          Seq("l_suppkey"))
        .select(col("l_suppkey").as("suppkey"), col("s_name"), col("rev_cents"))
        .orderBy(col("suppkey"))
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                    + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT l_suppkey AS suppkey, s_name, rev_cents
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
      ORDER BY suppkey
    """.trim))

  /** TPC-H Q18 shape: large-volume orders (total quantity > 200) with
    * their customer. The quantity rollup happens BEFORE any dimension
    * join — the fact aggregates to per-order partials first, and only
    * the ~0.6% of orders over threshold ever touch the join — then
    * orders and customer attach by key. */
  val qLargeOrders: Q = Q(
    "q_large_orders",
    (spark, dir) => {
      val big = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 200)
      big.join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey").as("custkey"),
          col("l_orderkey").as("orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_cents"),
          col("total_qty"))
        .orderBy(col("price_cents").desc, col("orderkey"))
        .limit(100)
    },
    Some("""
      WITH big AS (
        SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 200)
      SELECT c_name, o_custkey AS custkey, l_orderkey AS orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
             total_qty
      FROM big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY price_cents DESC, orderkey LIMIT 100
    """.trim))

  /** TPC-H Q21 shape: suppliers who were the SOLE late shipper in
    * multi-supplier orders (late = shipped >365 days after the order
    * date). The exists/not-exists pair collapses into one
    * per-(order, supplier) aggregate plus one per-order rollup — the
    * fact is scanned once, and the "some other supplier, none of them
    * late" correlated subqueries become two integer columns
    * (n_supp > 1, n_late = 1) instead of two more fact scans. */
  val qLateSoleSupplier: Q = Q(
    "q_late_sole_supplier",
    (spark, dir) => {
      // one exchange on the ORDER key serves BOTH per-order aggregates:
      // hash(l_orderkey) satisfies the clustering requirement of the
      // (l_orderkey, l_suppkey) aggregate AND the per-order rollup, so
      // neither re-shuffles (the unhinted plan exchanged twice — once
      // on the pair key, once on the order key)
      val perOrderSupp = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max((datediff(col("l_shipdate"), col("o_orderdate")) > 365)
          .cast("int")).as("late"))
      // the sole-late condition (n_late = 1) makes the culprit unique,
      // so max(when(late, suppkey)) recovers it inside the SAME
      // per-order aggregate — no join back to the per-(order, supp)
      // table (the round-4 plan re-shuffled it on the order key and
      // joined; one exchange and the join are gone)
      perOrderSupp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"),
          max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .select(col("late_supp").as("l_suppkey"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))),
          Seq("l_suppkey"))
        .select(col("l_suppkey").as("suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("suppkey"))
        .limit(100)
    },
    Some("""
      WITH pos AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 365
                   THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey, l_suppkey),
      po AS (
        SELECT l_orderkey, count(*) AS n_supp,
               CAST(sum(late) AS BIGINT) AS n_late
        FROM pos GROUP BY l_orderkey)
      SELECT l_suppkey AS suppkey, s_name, count(*) AS numwait
      FROM pos JOIN po USING (l_orderkey)
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE late = 1 AND n_supp > 1 AND n_late = 1
      GROUP BY 1, 2
      ORDER BY numwait DESC, suppkey LIMIT 100
    """.trim))

  /** TPC-H Q22 shape: dormant high-balance customers — account balance
    * above the global positive-balance average, no order since
    * 2000-01-01 — counted per market segment. The global average is a
    * one-row broadcast (scalar subquery → crossJoin), the dormancy test
    * an anti join against the date-filtered order keys; the customer
    * table is scanned once. */
  val qDormantRich: Q = Q(
    "q_dormant_rich",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
      val avgPos = broadcast(cust.filter(col("bal_cents") > 0)
        .agg(expr("sum(bal_cents) DIV count(1)").as("avg_cents")))
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01"))
        .select(col("o_custkey"))
      cust.crossJoin(avgPos)
        .filter(col("bal_cents") > col("avg_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"), sum(col("bal_cents")).as("total_cents"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      WITH cust AS (
        SELECT c_custkey, c_mktsegment,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        FROM customer),
      avg_pos AS (
        SELECT CAST(sum(bal_cents) // count(*) AS BIGINT) AS avg_cents
        FROM cust WHERE bal_cents > 0)
      SELECT c_mktsegment, count(*) AS n_custs,
             CAST(sum(bal_cents) AS BIGINT) AS total_cents
      FROM cust, avg_pos
      WHERE bal_cents > avg_cents
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """.trim))

  /** TPC-H Q3 shape: shipping-priority report — the top-10 highest
    * revenue orders in one market segment that were ordered before the
    * cutoff but still have lines shipping after it. Both dimension
    * filters (segment on customer, date on orders) land before the
    * fact join, so the lineitem date filter is the only full-fact
    * predicate; the top-10 is a bounded TakeOrdered, never a global
    * sort. */
  val qShipPriority: Q = Q(
    "q_ship_priority",
    (spark, dir) => {
      val cutoff = "1998-06-01"
      val cust = Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") < lit(cutoff))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") > lit(cutoff))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100 + 0.5).cast("long")).as("rev_cents"))
        .select(col("l_orderkey").as("orderkey"), col("rev_cents"),
          col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("rev_cents").desc, col("orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey AS orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS rev_cents,
             o_orderdate, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY rev_cents DESC, orderkey LIMIT 10
    """.trim))

  /** TPC-H Q4 shape: order-priority checking — orders placed in one
    * quarter with at least one line shipped more than 90 days after
    * the order date, counted per priority. The EXISTS is a left-semi
    * join with the lateness predicate as the join condition; the
    * date filter prunes orders before the join so the semi probe side
    * is one quarter, not the whole table. */
  val qPriorityWait: Q = Q(
    "q_priority_wait",
    (spark, dir) => {
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      ord.join(Tables.lineitem(spark, dir)
            .select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey") &&
            datediff(col("l_shipdate"), col("o_orderdate")) > 90, "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND date_diff('day', o_orderdate, l_shipdate) > 90)
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """.trim))

  /** TPC-H Q5 shape: local-supplier volume — revenue per nation from
    * orders where the customer and the supplier share the nation, one
    * region, one order-year. The nation⨝region shrink broadcasts into
    * both dimension legs; the customer-nation = supplier-nation
    * equality rides the join keys (c_nationkey carried through the
    * orders join meets s_nationkey at the lineitem join) — no
    * post-join filter re-scan. */
  val qLocalVolume: Q = Q(
    "q_local_volume",
    (spark, dir) => {
      val natReg = broadcast(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
      val cust = Tables.customer(spark, dir)
        .join(natReg, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      val supp = broadcast(Tables.supplier(spark, dir)
        .join(natReg, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long").as("cents"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("cents")).as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS rev_cents
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY rev_cents DESC, n_name
    """.trim))

  /** TPC-H Q6 shape: forecast-revenue change — a pure scan-aggregate
    * with three pushable range predicates and no join at all. The
    * whole query should compile to one WholeStageCodegen span over the
    * parquet scan with every filter in PushedFilters; at 100 TB this
    * is the query that proves scan bandwidth isn't wasted. */
  val qForecastRevenue: Q = Q(
    "q_forecast_revenue",
    (spark, dir) => Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(sum(floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
          .cast("long")).as("forecast_cents"),
        count(lit(1)).as("n_lines")),
    Some("""
      SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS forecast_cents,
             count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.04 AND 0.06
        AND l_quantity < 24
    """.trim))

  /** TPC-H Q10 shape: returned-item reporting — the 20 customers who
    * lost the most revenue to returns in one quarter, with their
    * nation. The returnflag filter prunes the fact to a third before
    * the orders join; nation attaches by broadcast after the
    * aggregate, so only 20-ish rows ever see the dim join. */
  val qReturnedItems: Q = Q(
    "q_returned_items",
    (spark, dir) => {
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-07-01") &&
          col("o_orderdate") < lit("1997-10-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val perCust = Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100 + 0.5).cast("long")).as("lost_cents"))
      perCust.join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("o_custkey").as("custkey"), col("c_name"),
          col("n_name"), col("lost_cents"))
        .orderBy(col("lost_cents").desc, col("custkey"))
        .limit(20)
    },
    Some("""
      WITH pc AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                    + 0.5) AS BIGINT)) AS BIGINT) AS lost_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
        GROUP BY o_custkey)
      SELECT o_custkey AS custkey, c_name, n_name, lost_cents
      FROM pc
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY lost_cents DESC, custkey LIMIT 20
    """.trim))

  /** TPC-H Q12 shape (adapted: lateness bucket stands in for the
    * absent shipmode column): per shipping-lateness bucket, how many
    * lines belong to high-priority (1-URGENT / 2-HIGH) vs lower
    * priority orders, over one ship-year. One fact⨝orders join, the
    * CASE'd counts are partials of the same aggregate pass. */
  val qLatenessPriority: Q = Q(
    "q_lateness_priority",
    (spark, dir) => {
      val ord = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, "LATE")
            .otherwise("ONTIME").as("bucket"),
          col("o_orderpriority"))
        .groupBy(col("bucket"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_prio_lines"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_prio_lines"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                  THEN 'LATE' ELSE 'ONTIME' END AS bucket,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_prio_lines,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 0 ELSE 1 END) AS BIGINT) AS low_prio_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY bucket ORDER BY bucket
    """.trim))

  /** TPC-H Q16 shape: parts/supplier relationship — how many distinct
    * suppliers shipped parts of each (brand, size-band), excluding one
    * brand. The supplier set comes from the fact's distinct
    * (partkey, suppkey) pairs (the dataset has no partsupp table);
    * that dedup IS the first aggregate, and the count-distinct rides
    * the already-distinct pairs so the second aggregate is a plain
    * count. */
  val qSupplierBreadth: Q = Q(
    "q_supplier_breadth",
    (spark, dir) => {
      // no pre-distinct: countDistinct(l_suppkey) dedups inside its own
      // aggregate (map-side partial dedup on (group, suppkey)), so an
      // explicit distinct would add a full extra exchange for nothing
      val pairs = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey"))
      pairs.join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1")
          .select(col("p_partkey"), col("p_brand"),
            (floor(col("p_size") / 10) * 10).cast("long").as("size_band"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("size_band"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("size_band"))
        .limit(50)
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, CAST(floor(p_size / 10) * 10 AS BIGINT) AS size_band,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM pairs JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1'
      GROUP BY p_brand, size_band
      ORDER BY supplier_cnt DESC, p_brand, size_band LIMIT 50
    """.trim))

  /** TPC-H Q19 shape: discounted revenue under OR'd predicate triples
    * — three (brand, size-range, quantity-range) alternatives that
    * must evaluate as one disjunction AFTER the part join. The part
    * side pre-filters to the union of brands (a pushable superset
    * predicate) and broadcasts; the disjunction runs codegen'd over
    * the joined rows, never as three separate scans. */
  val qBrandRevenue: Q = Q(
    "q_brand_revenue",
    (spark, dir) => {
      val pt = broadcast(Tables.part(spark, dir)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5).cast("long").as("cents"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS rev_cents,
             count(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 30)
    """.trim))

  /** Whale concentration: per market segment, the revenue share of the
    * top decile of customers — how much of the book the whales carry.
    * Per-customer revenue is one rollup; the P90 cut per segment is an
    * exact interpolated percentile over that rollup, broadcast back as
    * a 5-row table; the conditional share is one more aggregate. No
    * ntile, no per-segment sort of the customer table. */
  val qWhaleShare: Q = Q(
    "q_whale_share",
    (spark, dir) => {
      val perCust = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("rev_cents"))
      val cuts = broadcast(perCust.groupBy(col("c_mktsegment"))
        .agg(expr("percentile(rev_cents, 0.9)").as("p90")))
      perCust.join(cuts, Seq("c_mktsegment"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("rev_cents")).as("total_cents"),
          sum(when(col("rev_cents").cast("double") > col("p90"),
            col("rev_cents")).otherwise(0L)).as("whale_cents"),
          sum(when(col("rev_cents").cast("double") > col("p90"), 1L)
            .otherwise(0L)).as("n_whales"))
        .select(col("c_mktsegment"), col("n_custs"), col("n_whales"),
          col("total_cents"), col("whale_cents"),
          expr("whale_cents * 1000000L DIV total_cents").as("whale_share_micros"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      WITH pc AS (
        SELECT c_mktsegment, o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey),
      cuts AS (
        SELECT c_mktsegment, quantile_cont(rev_cents, 0.9) AS p90
        FROM pc GROUP BY c_mktsegment)
      SELECT c_mktsegment, count(*) AS n_custs,
             CAST(sum(CASE WHEN CAST(rev_cents AS DOUBLE) > p90
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_whales,
             CAST(sum(rev_cents) AS BIGINT) AS total_cents,
             CAST(sum(CASE WHEN CAST(rev_cents AS DOUBLE) > p90
                  THEN rev_cents ELSE 0 END) AS BIGINT) AS whale_cents,
             CAST(sum(CASE WHEN CAST(rev_cents AS DOUBLE) > p90
                  THEN rev_cents ELSE 0 END) AS BIGINT) * 1000000
               // CAST(sum(rev_cents) AS BIGINT) AS whale_share_micros
      FROM pc JOIN cuts USING (c_mktsegment)
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """.trim))

  /** Supplier-concentration HHI per nation: the Herfindahl–Hirschman
    * index of supplier revenue shares (Σ shareᵢ², reported in exact
    * integer ppm — 10⁶ = monopoly) — the supply-risk gauge behind
    * "how captive is this market". All sums are 128-bit exact
    * (squared cents overflow BIGINT at the 100 TB posture, exactly
    * the q_abtest_stats hazard) and the single ratio is one integer
    * division, so the oracle replays bit-for-bit. Two hash
    * aggregates, dims broadcast, fact scanned once. */
  val qMarketHhi: Q = Q(
    "q_market_hhi",
    (spark, dir) => {
      val perSupp = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      perSupp.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("cents").cast("decimal(19,0)")).as("tot"),
          sum(col("cents").cast("decimal(19,0)") * col("cents")).as("ssq"))
        .select(col("n_name"), col("n_suppliers"),
          col("tot").cast("long").as("total_cents"),
          expr("CAST(ssq * 1000000 DIV (tot * tot) AS BIGINT)").as("hhi_ppm"))
        .orderBy(col("n_name"))
    },
    Some("""
      WITH ps AS (
        SELECT n_name, l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, l_suppkey)
      SELECT n_name, count(*) AS n_suppliers,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(sum(CAST(cents AS HUGEINT) * cents) * 1000000
                  // (sum(CAST(cents AS HUGEINT)) * sum(CAST(cents AS HUGEINT)))
                  AS BIGINT) AS hhi_ppm
      FROM ps GROUP BY n_name ORDER BY n_name
    """.trim))

  /** Order cycle time: order date → last line shipped, summarized per
    * priority class (count, exact interpolated P50/P90, exact integer
    * mean in micro-days). The per-order close date is one fact
    * aggregate joined to orders; durations are exact integer days so
    * every statistic derives from exact inputs. The operational SLA
    * readout. */
  val qCycleTime: Q = Q(
    "q_cycle_time",
    (spark, dir) => {
      val close = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("close_date"))
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .join(close, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("close_date"), col("o_orderdate")).cast("long")
            .as("days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          expr("percentile(days, 0.5)").as("p50_days"),
          expr("percentile(days, 0.9)").as("p90_days"),
          expr("sum(days) * 1000000L DIV count(1)").as("mean_micro_days"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH close AS (
        SELECT l_orderkey, max(l_shipdate) AS close_date
        FROM lineitem GROUP BY l_orderkey),
      d AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', o_orderdate, close_date) AS BIGINT) AS days
        FROM orders JOIN close ON o_orderkey = l_orderkey)
      SELECT o_orderpriority, count(*) AS n_orders,
             quantile_cont(days, 0.5) AS p50_days,
             quantile_cont(days, 0.9) AS p90_days,
             CAST(sum(days) AS BIGINT) * 1000000 // count(*) AS mean_micro_days
      FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
    """.trim))

  /** Bloom runtime join filter — Spark's runtime-filter/DPP pattern
    * made explicit and verifiable: the selective build side (urgent
    * orders) is sketched into a broadcastable 2^18-bit Bloom filter
    * ([[graft.operators.Bloom]]), the probe side's DISTINCT join keys
    * are screened against it BEFORE any shuffle, and only maybe-keys
    * rows reach the join. The report proves the two contracts that
    * make the pattern safe at 100 TB: revenue through the filtered
    * path EQUALS revenue through the plain join (no false negatives,
    * by construction), and the false-pass key count prices the
    * filter's one-sided cost (a few extra rows shuffled, never a
    * wrong result). One per-key aggregate + two broadcast flag joins
    * + one final fold — the probe side is scanned once. The oracle
    * rebuilds the identical sketch (md5-chunk positions, 32-bit
    * words, bit_or) in SQL. */
  val qBloomJoinFilter: Q = {
    val m = graft.operators.Bloom.NumBits
    val posList = (0 until graft.operators.Bloom.NumHashes)
      .map(i => s"${DedupQueries.chunkSql(i)} % $m").mkString(", ")
    Q(
      "q_bloom_join_filter",
      (spark, dir) => {
        import graft.operators.Bloom
        val urgent = Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        val sketch = Bloom.build(urgent, col("o_orderkey").cast("string"))
        val liKeys = Tables.lineitem(spark, dir)
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_li"),
            sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
              .as("cents"))
        val flagged = Bloom.probe(liKeys, "l_orderkey",
            col("l_orderkey").cast("string"), sketch)
          .join(broadcast(urgent.withColumn("is_urgent", lit(true))),
            col("l_orderkey") === col("o_orderkey"), "left")
        flagged.agg(
          sum(col("n_li")).as("n_lineitem"),
          sum(when(col("maybe"), col("n_li")).otherwise(0L)).as("n_bloom_pass"),
          sum(when(col("is_urgent").isNotNull, col("n_li")).otherwise(0L))
            .as("n_joined"),
          sum(when(col("maybe") && col("is_urgent").isNull, 1L).otherwise(0L))
            .as("n_false_pass_keys"),
          sum(when(col("maybe") && col("is_urgent").isNotNull, col("cents"))
            .otherwise(0L)).as("rev_bloom_cents"),
          sum(when(col("is_urgent").isNotNull, col("cents")).otherwise(0L))
            .as("rev_plain_cents"))
      },
      Some(s"""
      WITH urgent AS (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      upos AS (
        SELECT unnest([$posList]) AS pos
        FROM (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hx FROM urgent)),
      sketch AS (
        SELECT pos // 32 AS word,
               bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
        FROM upos GROUP BY pos // 32),
      lik AS (
        SELECT l_orderkey, count(*) AS n_li,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS cents
        FROM lineitem GROUP BY l_orderkey),
      kpos AS (
        SELECT l_orderkey, unnest([$posList]) AS pos
        FROM (SELECT l_orderkey, md5(CAST(l_orderkey AS VARCHAR)) AS hx
              FROM lik)),
      hits AS (
        SELECT l_orderkey, count(*) AS n_hits
        FROM kpos k JOIN sketch s ON k.pos // 32 = s.word
        WHERE (s.bits & (1::BIGINT << CAST(k.pos % 32 AS INT))) <> 0
        GROUP BY l_orderkey),
      flagged AS (
        SELECT l.n_li, l.cents,
               coalesce(h.n_hits, 0) = 4 AS maybe,
               l.l_orderkey IN (SELECT o_orderkey FROM urgent) AS is_urgent
        FROM lik l LEFT JOIN hits h USING (l_orderkey))
      SELECT CAST(sum(n_li) AS BIGINT) AS n_lineitem,
             CAST(sum(CASE WHEN maybe THEN n_li ELSE 0 END) AS BIGINT)
               AS n_bloom_pass,
             CAST(sum(CASE WHEN is_urgent THEN n_li ELSE 0 END) AS BIGINT)
               AS n_joined,
             CAST(sum(CASE WHEN maybe AND NOT is_urgent THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pass_keys,
             CAST(sum(CASE WHEN maybe AND is_urgent THEN cents ELSE 0 END)
               AS BIGINT) AS rev_bloom_cents,
             CAST(sum(CASE WHEN is_urgent THEN cents ELSE 0 END) AS BIGINT)
               AS rev_plain_cents
      FROM flagged
    """.trim))
  }

  def all: Seq[Q] = Seq(qCustOrderHistogram, qPromoShare, qExcessStock,
    qVolumeShipping, qMarketShare, qTopSupplier, qLargeOrders,
    qLateSoleSupplier, qDormantRich,
    qShipPriority, qPriorityWait, qLocalVolume, qForecastRevenue,
    qReturnedItems, qLatenessPriority, qSupplierBreadth, qBrandRevenue,
    qWhaleShare, qMarketHhi, qCycleTime, qBloomJoinFilter)
}
