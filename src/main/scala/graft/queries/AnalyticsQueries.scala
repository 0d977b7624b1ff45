package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Analytics closure queries (SURVEY.md §2.6): the operator families
  * the reference lacks but the harness + north star require — hash
  * aggregates, broadcast + shuffle joins, ranking/running windows,
  * rollup, time windows, session windows, approximate distinct.
  *
  * Determinism across engines: money aggregates are computed per-row in
  * double with a fixed expression order, rounded to 4 dp, cast to
  * DECIMAL(18,4) (exact, order-independent summation), then cast back
  * to double. Plain-double SUMs are never compared directly. */
object AnalyticsQueries {

  /** Engine-portable money rounding: floor(x*10000 + 0.5) in double is
    * bitwise-identical everywhere (SQL round() half-way rules differ
    * between engines); the BIGINT sum is exact and order-independent. */
  private def money(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000.0) + lit(0.5)).cast("bigint")

  /** TPC-H Q1-shaped pricing summary: wide hash aggregate with
    * map-side partial aggregation; one shuffle on the 2-column key. */
  val qAggPricing: Q = Q(
    "q_agg_pricing",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
          (sum(money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            / lit(10000.0)).as("sum_disc_price"),
          (sum(money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")))) / lit(10000.0)).as("sum_charge"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty", round(col("sum_qty") / col("n"), 6))
        .withColumn("avg_price", round(col("sum_base_price") / col("n"), 6))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                                 * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
             count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.trim))

  /** Star-schema broadcast join: fact (customer) against two broadcast
    * dims — no shuffle on the fact side beyond the final aggregate. */
  val qJoinBroadcast: Q = Q(
    "q_join_broadcast",
    (spark, dir) => Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name")),
    Some("""
      SELECT r_name, n_name, count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """.trim))

  /** Shuffle join + top-n: revenue per customer over orders⨝lineitem
    * (both large — sort-merge/shuffle-hash territory), then a global
    * ordered limit. */
  val qJoinRevenue: Q = Q(
    "q_join_revenue",
    (spark, dir) => Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg((sum(money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        / lit(10000.0)).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20),
    Some("""
      SELECT o_custkey,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey
      ORDER BY revenue DESC, o_custkey
      LIMIT 20
    """.trim))

  /** Ranking window: top-3 orders per customer by totalprice. */
  val qWindowTopn: Q = Q(
    "q_window_topn",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn
    """.trim))

  /** Top-3 orders per customer again — but via the native bounded
    * top-k AGGREGATE ([[graft.functions.TopKLongAgg]]) instead of a
    * ranking window. Same semantics as `q_window_topn` (modulo exact
    * cent scoring), different physical shape: the window formulation
    * shuffles every order row to its customer's reducer and sorts
    * there; the aggregate reduces each map task's slice to ≤3 entries
    * per customer BEFORE the exchange (partial aggregation), so
    * shuffle volume no longer scales with input rows — the difference
    * between a full-data exchange and a k·keys one at 100 TB. Ties
    * break on a zero-padded order key so string order = numeric order
    * and the result is deterministic under any partitioning. */
  val qTopkAgg: Q = Q(
    "q_topk_agg",
    (spark, dir) => {
      val scored = Tables.orders(spark, dir)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("score"),
          lpad(col("o_orderkey").cast("string"), 12, "0").as("item"))
      scored.groupBy(col("o_custkey"))
        .agg(graft.functions.TopKLongAgg(col("score"), col("item"), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.score").as("price_cents"),
          col("col.item").cast("long").as("o_orderkey"))
        .orderBy(col("o_custkey"), col("rnk"))
    },
    Some("""
      WITH s AS (
        SELECT o_custkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS score,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS item
        FROM orders),
      r AS (
        SELECT o_custkey, score, item,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY score DESC, item) AS rnk
        FROM s)
      SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk,
             score AS price_cents, CAST(item AS BIGINT) AS o_orderkey
      FROM r WHERE rnk <= 3 ORDER BY o_custkey, rnk
    """.trim))

  /** Running-sum window: cumulative quantity per supplier in
    * (shipdate, orderkey, linenumber) order — exact decimal running
    * totals. */
  val qWindowRunning: Q = Q(
    "q_window_running",
    (spark, dir) => {
      // (orderkey, linenumber) is not unique in the synthetic lineitem:
      // pre-aggregate to a unique (suppkey, shipdate, orderkey,
      // linenumber) grain so the running order is total.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(spark, dir)
        .groupBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          sum(col("qty")).over(w).cast("double").as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(sum(qty) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem
        GROUP BY l_suppkey, l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """.trim))

  /** Rollup over the region/nation hierarchy (grouping-sets family). */
  val qAggRollup: Q = Q(
    "q_agg_rollup",
    (spark, dir) => Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
    Some("""
      SELECT r_name, n_name, count(*) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """.trim))

  /** GROUPING SETS — the general form rollup/cube specialize: exactly
    * the (source), (lang) and () granularities in ONE Expand +
    * aggregate pass, no per-granularity rescan and none of cube's
    * unwanted (source, lang) cells. Exercises the SQL entry point
    * (`spark.sql` over a temp view) — the one public API surface the
    * DataFrame-built queries don't touch. */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    (spark, dir) => {
      Tables.documents(spark, dir).createOrReplaceTempView("documents_gs")
      spark.sql("""
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid
        FROM documents_gs
        GROUP BY GROUPING SETS ((source), (lang), ())
        ORDER BY gid, source NULLS FIRST, lang NULLS FIRST
      """)
    },
    Some("""
      SELECT source, lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(grouping(source) * 2 + grouping(lang) AS BIGINT) AS gid
      FROM documents
      GROUP BY GROUPING SETS ((source), (lang), ())
      ORDER BY gid, source NULLS FIRST, lang NULLS FIRST
    """.trim))

  /** CUBE over (status, priority) with grouping_id — all four grouping
    * combinations in one pass (Spark expands to a single Expand +
    * aggregate, no per-granularity rescans); `grouping_id` disambiguates
    * a real NULL group key from a rolled-up one. */
  val qAggCube: Q = Q(
    "q_agg_cube",
    (spark, dir) => Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping_id(col("o_orderstatus"), col("o_orderpriority")).as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """.trim))

  /** Tumbling event-time window (1 day) — the windowed-aggregation
    * family; window start aligns to the UTC epoch in both engines. */
  val qWindowTime: Q = Q(
    "q_window_time",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("wstart"), col("event_type")),
    Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS wstart, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY date_trunc('day', ts), event_type
      ORDER BY wstart, event_type
    """.trim))

  /** Session windows (30 min gap) per user — oracle via the
    * gaps-and-islands formulation (a session starts where the gap from
    * the previous event exceeds the timeout). */
  val qSessionWindow: Q = Q(
    "q_session_window",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_in_session"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_in_session")).as("n_events"))
      .orderBy(col("user_id")),
    Some("""
      SELECT user_id,
             CAST(sum(CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events)
      GROUP BY user_id ORDER BY user_id
    """.trim))

  /** Approximate distinct (HLL++). Sketch internals differ across
    * engines, so the raw estimate is not oracle-comparable; instead the
    * query emits the exact distinct counts PLUS booleans asserting the
    * HLL estimate (rsd 0.01) lands within 5% relative error of exact.
    * DuckDB computes the same exact counts and constant `true`s — a
    * hash-matchable contract that still fails if the sketch ever drifts
    * out of tolerance. */
  val qApproxDistinct: Q = Q(
    "q_approx_distinct",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"),
        countDistinct(col("event_id")).as("n_events_exact"),
        approx_count_distinct(col("user_id"), 0.01).as("au"),
        approx_count_distinct(col("event_id"), 0.01).as("ae"))
      .select(col("event_type"), col("n_users_exact"), col("n_events_exact"),
        (abs(col("au") - col("n_users_exact")).cast("double")
          <= col("n_users_exact") * lit(0.05)).as("users_within_tol"),
        (abs(col("ae") - col("n_events_exact")).cast("double")
          <= col("n_events_exact") * lit(0.05)).as("events_within_tol"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_events_exact,
             true AS users_within_tol,
             true AS events_within_tol
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Semi join (EXISTS): customers that placed at least one order. */
  val qJoinSemi: Q = Q(
    "q_join_semi",
    (spark, dir) => Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """.trim))

  /** Anti join (NOT EXISTS): customers with no orders. */
  val qJoinAnti: Q = Q(
    "q_join_anti",
    (spark, dir) => Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """.trim))

  /** INTERSECT / EXCEPT family over customer key sets by order status. */
  val qSetOps: Q = Q(
    "q_set_ops",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
      val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
      val both = f.intersect(op).agg(count(lit(1)).as("n")).withColumn("op", lit("both"))
      val onlyF = f.except(op).agg(count(lit(1)).as("n")).withColumn("op", lit("only_f"))
      both.unionByName(onlyF).select(col("op"), col("n")).orderBy(col("op"))
    },
    Some("""
      SELECT 'both' AS op, count(*) AS n FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      UNION ALL
      SELECT 'only_f' AS op, count(*) AS n FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      ORDER BY op
    """.trim))

  /** Aggregate + HAVING: market segments with enough customers. */
  val qAggHaving: Q = Q(
    "q_agg_having",
    (spark, dir) => Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_acctbal"))
      .filter(col("n_customers") >= 25)
      .orderBy(col("c_mktsegment")),
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
      FROM customer
      GROUP BY c_mktsegment
      HAVING count(*) >= 25
      ORDER BY c_mktsegment
    """.trim))

  /** Pivot: per-user event-type count matrix. Spark uses the pivot
    * relational op; the oracle uses conditional aggregation (same
    * result, independent formulation). */
  val qPivot: Q = Q(
    "q_pivot",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot(col("event_type"), Seq("signup", "purchase", "click", "view", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .toDF("user_id", "n_signup", "n_purchase", "n_click", "n_view", "n_error")
      .orderBy(col("user_id")),
    Some("""
      SELECT user_id,
             count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
      FROM events GROUP BY user_id ORDER BY user_id
    """.trim))

  /** Descriptive statistics via explicit moment sums (engine-native
    * stddev/corr differ in accumulation details; the moment formulation
    * in fixed-point is exactly portable). Values are scaled to
    * integer hundredths, so the moment sums are exact integers. */
  val qStatsMoments: Q = Q(
    "q_stats_moments",
    (spark, dir) => {
      val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("bigint")
      Tables.events(spark, dir)
        .select(col("event_type"), cents.as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
          sum(col("v") * col("v")).as("s2"))
        .select(col("event_type"), col("n"),
          round(col("s1") / lit(100.0) / col("n"), 6).as("mean"),
          round((col("s2") / lit(10000.0) -
            (col("s1") / lit(100.0)) * (col("s1") / lit(100.0)) / col("n")) /
            (col("n") - 1), 6).as("variance"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, n,
             round(s1 / 100.0 / n, 6) AS mean,
             round((s2 / 10000.0 - (s1 / 100.0) * (s1 / 100.0) / n) / (n - 1), 6)
               AS variance
      FROM (
        SELECT event_type, count(*) AS n,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s1,
               sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                   * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s2
        FROM events GROUP BY event_type)
      ORDER BY event_type
    """.trim))

  /** DuckDB expression for [[graft.operators.Sampling.hashBasisPoints]]:
    * first 8 md5 hex digits as a big-endian integer, mod 10⁴ — digit by
    * digit, exactly Spark's `conv(substring(md5(x), 1, 8), 16, 10)`. */
  private[queries] def bpSql(keyExpr: String): String =
    (0 until 8).map { k =>
      s"(strpos('0123456789abcdef', substring(md5(CAST($keyExpr AS VARCHAR)), ${k + 1}, 1)) - 1)" +
        s" * ${1L << (4 * (7 - k))}"
    }.mkString("(", " + ", s") % 10000")

  /** Deterministic stratified sampling: per-class hash-threshold keep
    * rates (click 5%, view 25%, rest 50%) — reproducible across
    * runs/engines, consistent per key, zero shuffle (the predicate
    * codegens into the scan). min/max ids prove the sample is spread
    * across the key space rather than a prefix. */
  val qSampleStratified: Q = Q(
    "q_sample_stratified",
    (spark, dir) => graft.operators.Sampling.stratifiedHashSample(
      Tables.events(spark, dir), col("event_id"), col("event_type"),
      Map("click" -> 0.05, "view" -> 0.25), defaultFraction = 0.5)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type")),
    Some(s"""
      SELECT event_type, count(*) AS n,
             min(event_id) AS min_id, max(event_id) AS max_id
      FROM events
      WHERE ${bpSql("event_id")} <
            CASE event_type WHEN 'click' THEN 500
                            WHEN 'view' THEN 2500 ELSE 5000 END
      GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Quality-weighted deterministic sampling: each document's keep
    * probability IS its quality score (the quality-weighted mixing
    * step of corpus prep) — acceptance is a pure scalar predicate on
    * hash basis points vs floor(quality·10⁴+0.5), zero shuffle,
    * reproducible across engines because the score itself is
    * hash-verified identical (q_text_quality). */
  val qSampleWeighted: Q = Q(
    "q_sample_weighted",
    (spark, dir) => graft.operators.Sampling.weightedHashSample(
      Tables.documents(spark, dir), col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("source")),
    Some(s"""
      SELECT source, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM (
        SELECT doc_id, source,
               round(least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.3 +
                     (1.0 - CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
                       / len(toks)) * 0.3 +
                     (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4,
                     6) AS q
        FROM (SELECT doc_id, source, string_split_regex(text, '\\s+') AS toks
              FROM documents))
      WHERE ${bpSql("doc_id")} < CAST(floor(q * 10000 + 0.5) AS BIGINT)
      GROUP BY source ORDER BY source
    """.trim))

  /** As-of (point-in-time) join: every event picks up the most recent
    * order of the same user at or before the event time. Spark has no
    * native as-of operator — [[graft.operators.AsofJoin]] interleaves
    * both sides into one keyed window (one shuffle, no range-join pair
    * blow-up); the oracle uses DuckDB's NATIVE `ASOF LEFT JOIN`, a
    * fully independent implementation of the same semantics. The right
    * side is pre-deduplicated per (key, ts) deterministically. */
  val qAsofJoin: Q = Q(
    "q_asof_join",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(spark, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsofJoin
        .asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("_asof").getField("o_orderkey").as("last_order_key"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH r AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id, r.o_orderkey AS last_order_key
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
      ORDER BY e.event_id
    """.trim))

  /** Hopping (sliding) time windows: 1-hour windows every 15 minutes,
    * so each event lands in 4 overlapping windows. The oracle
    * regenerates window membership arithmetically (starts aligned to
    * the slide, largest start = floor(t/slide)*slide) — integer-second
    * epoch math is exact because both window and slide are whole
    * seconds and a 900-multiple can never fall strictly between
    * floor(t) and t. */
  val qWindowSliding: Q = Q(
    "q_window_sliding",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("w.start").as("wstart"), col("n_events"), col("n_users"))
      .orderBy(col("wstart")),
    Some("""
      WITH e AS (
        SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec, user_id
        FROM events),
      w AS (
        SELECT unnest(generate_series((sec // 900) * 900 - 2700,
                                      (sec // 900) * 900, 900)) AS ws,
               user_id
        FROM e)
      SELECT make_timestamp(ws * 1000000) AS wstart,
             count(*) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM w GROUP BY ws ORDER BY wstart
    """.trim))

  /** Approximate quantiles, same contract shape as [[qApproxDistinct]]:
    * exact interpolated percentiles (identical linear-interpolation
    * definition in both engines, rounded to 6 dp) plus booleans
    * asserting the KLL/GK-style `percentile_approx` sketch lands within
    * tolerance of exact — the sketch itself differs per engine, the
    * tolerance contract does not. Tolerance is absolute-ized with a +1
    * floor so near-zero medians can't blow up the relative error. */
  val qApproxQuantile: Q = Q(
    "q_approx_quantile",
    (spark, dir) => {
      def withinTol(approx: org.apache.spark.sql.Column,
                    exact: org.apache.spark.sql.Column) =
        abs(approx - exact) <= (abs(exact) + lit(1.0)) * lit(0.05)
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.95)").as("p95"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("a50"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("a95"))
        .select(col("event_type"),
          round(col("p50"), 6).as("p50"), round(col("p95"), 6).as("p95"),
          withinTol(col("a50"), col("p50")).as("p50_within_tol"),
          withinTol(col("a95"), col("p95")).as("p95_within_tol"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.95), 6) AS p95,
             true AS p50_within_tol,
             true AS p95_within_tol
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Skew-salted shuffle join ([[graft.operators.SaltedJoin]]): events
    * × orders on the user key, 8 salts, merge-join hinted so the
    * salted exchange actually materializes. Salting must be
    * result-invisible, so the oracle is the PLAIN join — the physical
    * skew treatment is verified to change nothing logical. */
  val qJoinSalted: Q = Q(
    "q_join_salted",
    (spark, dir) => graft.operators.SaltedJoin.saltedEquiJoin(
      Tables.events(spark, dir), col("user_id"), col("event_id"),
      Tables.orders(spark, dir).hint("merge"), col("o_custkey"), nSalts = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("total_price"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n_pairs,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_price
      FROM events e JOIN orders o ON e.user_id = o.o_custkey
      GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Funnel analysis: per-user first-touch timestamps for
    * view → click → purchase, reduced to stage conversion counts — one
    * hash aggregate on user_id plus a single-row rollup, no window
    * pass. Strictly-increasing timestamps define stage progression. */
  val qFunnel: Q = Q(
    "q_funnel",
    (spark, dir) => {
      val f = Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("v"),
          min(when(col("event_type") === "click", col("ts"))).as("c"),
          min(when(col("event_type") === "purchase", col("ts"))).as("p"))
      f.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("v").isNotNull && col("c").isNotNull && col("c") > col("v"),
          1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("v").isNotNull && col("c").isNotNull && col("c") > col("v")
          && col("p").isNotNull && col("p") > col("c"), 1L).otherwise(0L))
          .as("n_full_funnel"))
    },
    Some("""
      WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS v,
               min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS c,
               min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS p
        FROM events GROUP BY user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
             CAST(sum(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND c > v
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
             CAST(sum(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND c > v
                            AND p IS NOT NULL AND p > c
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      FROM f
    """.trim))

  /** Join-key skew profile: the report read before choosing between a
    * plain shuffle join, AQE skew handling, or explicit salting
    * ([[graft.operators.SaltedJoin]]) — top-10 heaviest keys with their
    * share of all rows. One hash aggregate + a TakeOrdered. */
  val qSkewProfile: Q = Q(
    "q_skew_profile",
    (spark, dir) => {
      val counts = Tables.events(spark, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
      // total via a 1-row aggregate broadcast back over the counts: an
      // unpartitioned window here would funnel every distinct key's
      // count row through ONE partition before the top-10 cut — the
      // aggregate re-reads nothing (same shuffled counts feed both
      // sides) and keeps the profile scan-shaped at any key count
      val total = counts.agg(sum(col("n_rows")).as("total_rows"))
      counts.crossJoin(broadcast(total))
        .select(col("user_id"), col("n_rows"),
          round(col("n_rows").cast("double") / col("total_rows"), 6)
            .as("share"))
        .orderBy(col("n_rows").desc, col("user_id"))
        .limit(10)
    },
    Some("""
      SELECT user_id, count(*) AS n_rows,
             round(count(*)::DOUBLE / (SELECT count(*) FROM events), 6) AS share
      FROM events GROUP BY user_id
      ORDER BY n_rows DESC, user_id LIMIT 10
    """.trim))

  /** Column-completeness audit over the unified order stream — the data
    * quality gate a corpus passes before training: per event type, how
    * many rows carry each envelope field. Single wide aggregate. */
  val qCompletenessAudit: Q = Q(
    "q_completeness_audit",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNotNull, 1L).otherwise(0L)).as("n_user_id"),
        sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("n_value"),
        sum(when(col("props").isNotNull, 1L).otherwise(0L)).as("n_props"),
        countDistinct(col("user_id")).as("n_distinct_users"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n_rows,
             CAST(sum(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_user_id,
             CAST(sum(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_value,
             CAST(sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_props,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Referential-integrity audit: for each FK relationship in the
    * warehouse star, how many child rows point at a missing parent —
    * the DQ gate that catches a broken ingest before any join silently
    * drops rows. Scale shape: each check first collapses the child
    * side to DISTINCT keys with their row counts (one map-side-
    * combinable aggregate — the join input is key-cardinality-sized,
    * not fact-sized), then left-joins the parent key set; orphan mass
    * is recovered from the carried counts. On this corpus every count
    * is a verified zero — the audit proves cleanliness, like the
    * Bloom screen's pinned FN count. */
  val qReferentialAudit: Q = Q(
    "q_referential_audit",
    (spark, dir) => {
      def check(fk: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
        val keys = child.groupBy(col(childKey).as("k"))
          .agg(count(lit(1)).as("cnt"))
        keys.join(parent.select(col(parentKey).as("k"), lit(1L).as("hit"))
            .distinct(), Seq("k"), "left")
          .agg(sum(col("cnt")).as("n_child"),
            sum(when(col("hit").isNull, col("cnt")).otherwise(0L)).as("n_orphan"))
          .select(lit(fk).as("fk"), col("n_child"), col("n_orphan"))
      }
      val li = Tables.lineitem(spark, dir)
      check("customer.c_nationkey->nation", Tables.customer(spark, dir),
          "c_nationkey", Tables.nation(spark, dir), "n_nationkey")
        .unionAll(check("lineitem.l_orderkey->orders", li, "l_orderkey",
          Tables.orders(spark, dir), "o_orderkey"))
        .unionAll(check("lineitem.l_partkey->part", li, "l_partkey",
          Tables.part(spark, dir), "p_partkey"))
        .unionAll(check("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.supplier(spark, dir), "s_suppkey"))
        .unionAll(check("orders.o_custkey->customer",
          Tables.orders(spark, dir), "o_custkey",
          Tables.customer(spark, dir), "c_custkey"))
        .orderBy(col("fk"))
    },
    Some("""
      WITH checks AS (
        SELECT 'customer.c_nationkey->nation' AS fk, count(*) AS n_child,
               sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS n_orphan
        FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders', count(*),
               sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part', count(*),
               sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', count(*),
               sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
        FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        UNION ALL
        SELECT 'orders.o_custkey->customer', count(*),
               sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
      SELECT fk, n_child, CAST(n_orphan AS BIGINT) AS n_orphan
      FROM checks ORDER BY fk
    """.trim))

  /** Primary-key uniqueness audit: per table, total rows vs distinct
    * key values and the number of duplicated keys — the other half of
    * the DQ contract a warehouse load asserts (FKs resolve, PKs are
    * unique). One aggregate per table over the key column only. */
  val qKeyUniqueness: Q = Q(
    "q_key_uniqueness",
    (spark, dir) => {
      def check(table: String, df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_distinct_keys"),
            sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_keys"))
          .select(lit(table).as("table_name"), col("n_rows"),
            col("n_distinct_keys"), col("n_dup_keys"))
      check("customer", Tables.customer(spark, dir), "c_custkey")
        .unionAll(check("events", Tables.events(spark, dir), "event_id"))
        .unionAll(check("orders", Tables.orders(spark, dir), "o_orderkey"))
        .unionAll(check("part", Tables.part(spark, dir), "p_partkey"))
        .unionAll(check("supplier", Tables.supplier(spark, dir), "s_suppkey"))
        .orderBy(col("table_name"))
    },
    Some("""
      WITH u AS (
        SELECT 'customer' AS table_name, count(*) AS n_rows,
               count(DISTINCT c_custkey) AS n_distinct_keys,
               (SELECT count(*) FROM (
                  SELECT c_custkey FROM customer GROUP BY 1 HAVING count(*) > 1))
                 AS n_dup_keys
        FROM customer
        UNION ALL
        SELECT 'events', count(*), count(DISTINCT event_id),
               (SELECT count(*) FROM (
                  SELECT event_id FROM events GROUP BY 1 HAVING count(*) > 1))
        FROM events
        UNION ALL
        SELECT 'orders', count(*), count(DISTINCT o_orderkey),
               (SELECT count(*) FROM (
                  SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
        FROM orders
        UNION ALL
        SELECT 'part', count(*), count(DISTINCT p_partkey),
               (SELECT count(*) FROM (
                  SELECT p_partkey FROM part GROUP BY 1 HAVING count(*) > 1))
        FROM part
        UNION ALL
        SELECT 'supplier', count(*), count(DISTINCT s_suppkey),
               (SELECT count(*) FROM (
                  SELECT s_suppkey FROM supplier GROUP BY 1 HAVING count(*) > 1))
        FROM supplier)
      SELECT table_name, n_rows, CAST(n_distinct_keys AS BIGINT) AS n_distinct_keys,
             CAST(n_dup_keys AS BIGINT) AS n_dup_keys
      FROM u ORDER BY table_name
    """.trim))

  /** Forward as-of join: for every event, the FIRST order placed on or
    * after it by the same user — the attribution-window mirror of
    * [[qAsofJoin]]'s feature-store lookback. Oracle: DuckDB's native
    * ASOF with the `<=` inequality. */
  val qAsofForward: Q = Q(
    "q_asof_forward",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(spark, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.AsofJoin
        .asofJoinForward(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("_asof").getField("o_orderkey").as("next_order_key"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH r AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id, r.o_orderkey AS next_order_key
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
      ORDER BY e.event_id
    """.trim))

  /** Event-transition matrix: per-user event streams ordered by time,
    * reduced to (prev → next) type-pair counts and their global share.
    * One shuffle on user_id for the lag window (the sort never leaves
    * the user partition), then a |types|²-row aggregate; the share
    * total is a 1-row aggregate broadcast back — the same pattern as
    * `q_skew_profile`, so no global window exists anywhere in the
    * plan (even a bounded one costs a SinglePartition exchange). */
  val qEventTransitions: Q = Q(
    "q_event_transitions",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val total = pairs.agg(sum(col("n")).as("total_n"))
      pairs.crossJoin(broadcast(total))
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("total_n"), 6).as("share"))
        .orderBy(col("prev_type"), col("next_type"))
    },
    Some("""
      WITH pairs AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n FROM (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_type
          FROM events)
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type)
      SELECT prev_type, next_type, n,
             round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS share
      FROM pairs
      ORDER BY prev_type, next_type
    """.trim))

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event, distinct-user counts per (cohort week, week offset).
    * Two hash aggregates on user_id — first-touch, then the cohort
    * rollup; both engines truncate weeks to Monday so the day
    * difference is exactly divisible by 7. */
  val qCohortRetention: Q = Q(
    "q_cohort_retention",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
      ev.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      cohorts AS (
        SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id)
      SELECT cohort_week,
             CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
             count(DISTINCT user_id) AS n_users
      FROM ev JOIN cohorts USING (user_id)
      GROUP BY cohort_week, week_offset
      ORDER BY cohort_week, week_offset
    """.trim))

  /** Equi-depth histogram: ntile(10) per event type over a TOTAL order
    * (value, then event_id — ties broken deterministically so both
    * engines cut identical deciles), reporting each decile's count and
    * exact cent-rounded bounds. One shuffle on event_type; the
    * per-type sort is external and spill-safe. */
  val qEquidepthHist: Q = Q(
    "q_equidepth_hist",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(floor(col("value") * 100 + 0.5).cast("long")).as("lo_cents"),
          max(floor(col("value") * 100 + 0.5).cast("long")).as("hi_cents"))
        .orderBy(col("event_type"), col("decile"))
    },
    Some("""
      SELECT event_type, decile, count(*) AS n,
             min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS lo_cents,
             max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS hi_cents
      FROM (
        SELECT event_type, value,
               CAST(ntile(10) OVER (PARTITION BY event_type
                 ORDER BY value, event_id) AS BIGINT) AS decile
        FROM events)
      GROUP BY event_type, decile
      ORDER BY event_type, decile
    """.trim))

  /** Robust outlier screen per event type: median, MAD (median absolute
    * deviation — unlike stddev, a few extreme values cannot inflate the
    * yardstick that is supposed to catch them), and how many events sit
    * more than 3 MADs from the median. Median and MAD are both rounded
    * to 6dp before any comparison so the two engines threshold
    * identical doubles. Two percentile aggregates with a broadcast of
    * the 5-row stats table between them — the fact stream never
    * shuffles, so the screen stays scan-shaped at any event volume. */
  val qAnomalyMad: Q = Q(
    "q_anomaly_mad",
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", round(abs(col("value") - col("med")), 6))
      val mad = dev.groupBy(col("event_type"))
        .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          first(col("med")).as("med"), first(col("mad")).as("mad"),
          sum(when(col("adev") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        FROM events GROUP BY event_type),
      dev AS (
        SELECT e.event_type, round(abs(e.value - m.med), 6) AS adev, m.med
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
        FROM dev GROUP BY event_type)
      SELECT d.event_type, count(*) AS n_events,
             min(d.med) AS med, min(m.mad) AS mad,
             CAST(sum(CASE WHEN d.adev > m.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
      FROM dev d JOIN mad m USING (event_type)
      GROUP BY d.event_type ORDER BY d.event_type
    """.trim))

  /** Inter-event gap percentiles per user stream — the calibration
    * table a session-gap parameter is chosen FROM (q_session_window's
    * 30-minute gap is an input someone must justify; this query is the
    * justification). Gaps are exact BIGINT microseconds (`unix_micros`
    * / `epoch_us` — casting the timestamp to double would round away
    * sub-second precision), the lag window partitions by user (scales
    * with the key space, no global sort), and the final percentile
    * rollup sees one narrow integer column. */
  val qGapPercentiles: Q = Q(
    "q_gap_percentiles",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile(gap, 0.5)"), 6).as("p50_us"),
          round(expr("percentile(gap, 0.9)"), 6).as("p90_us"),
          round(expr("percentile(gap, 0.99)"), 6).as("p99_us"),
          max(col("gap")).as("max_us"),
          sum(when(col("gap") > 1800L * 1000000, 1L).otherwise(0L))
            .as("n_over_30m"))
    },
    Some("""
      WITH g AS (
        SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events QUALIFY gap IS NOT NULL)
      SELECT count(*) AS n_gaps,
             round(quantile_cont(gap, 0.5), 6) AS p50_us,
             round(quantile_cont(gap, 0.9), 6) AS p90_us,
             round(quantile_cont(gap, 0.99), 6) AS p99_us,
             max(gap) AS max_us,
             CAST(sum(CASE WHEN gap > 1800 * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_over_30m
      FROM g
    """.trim))

  /** Snowflake 6-table join (the TPC-H Q5 shape): region → nation →
    * customer → orders → lineitem → supplier, with the "local
    * supplier" condition (customer and supplier share a nation) and
    * revenue per nation in exact cents. Plan shape at scale: region
    * and nation BROADCAST (a few rows), the three fact-side joins
    * shuffle on their natural keys with AQE free to reorder, and the
    * per-row money term is floored to integer cents BEFORE the sum so
    * no float accumulation order can drift. */
  val qJoinSnowflake: Q = Q(
    "q_join_snowflake",
    (spark, dir) => {
      val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(spark, dir)
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(spark, dir)
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
            + 0.5).cast("long").as("rev_cents"))
      val supp = Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lineitems"), sum(col("rev_cents")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    },
    Some("""
      SELECT n_name, count(*) AS n_lineitems,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue_cents DESC, n_name
    """.trim))

  /** Per-event lag features — the feature-engineering table an ML
    * training job joins against the label stream: previous value,
    * delta, and the trailing-3 mean per user in event-time order.
    * Money-style values quantize to integer cents before the frame
    * sum so no float accumulation order can drift between engines.
    * One shuffle on user_id; every frame stays inside its user
    * partition. */
  val qLagFeatures: Q = Q(
    "q_lag_features",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w3 = w.rowsBetween(-2, Window.currentRow)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .withColumn("delta_cents", col("cents") - col("prev_cents"))
        .withColumn("trail3_mean_cents",
          floor(sum(col("cents")).over(w3) / count(lit(1)).over(w3))
            .cast("long"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, cents,
             lag(cents) OVER w AS prev_cents,
             cents - lag(cents) OVER w AS delta_cents,
             CAST(floor(CAST(sum(cents) OVER w3 AS DOUBLE)
                        / count(*) OVER w3) AS BIGINT) AS trail3_mean_cents
      FROM (SELECT event_id, user_id, ts,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts, event_id
    """.trim))

  /** OHLC-style downsampling: per user × hour bucket, the open/close
    * values (first/last event by (ts, event_id)) and the high/low —
    * the time-series compaction every metrics store runs. Open and
    * close are LEXICOGRAPHIC MIN/MAX-STRUCT aggregates, not window
    * sorts: the shuffle carries one partial per (user, bucket) per
    * input partition regardless of bucket depth — the same
    * map-side-compaction argument as `q_upsert_latest`. */
  val qDownsampleOhlc: Q = Q(
    "q_downsample_ohlc",
    (spark, dir) => Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("bucket"),
        col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"), col("cents")))
          .getField("cents").as("open_cents"),
        max(struct(col("ts"), col("event_id"), col("cents")))
          .getField("cents").as("close_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"))
      .orderBy(col("user_id"), col("bucket")),
    Some("""
      WITH e AS (
        SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               ts, event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      r AS (
        SELECT user_id, bucket, cents,
               row_number() OVER w AS rn_a,
               row_number() OVER (PARTITION BY user_id, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
        WINDOW w AS (PARTITION BY user_id, bucket ORDER BY ts, event_id))
      SELECT user_id, bucket, count(*) AS n_events,
             CAST(sum(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
             CAST(sum(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
             max(cents) AS high_cents, min(cents) AS low_cents
      FROM r GROUP BY user_id, bucket
      ORDER BY user_id, bucket
    """.trim))

  /** Gap-rule sessionization: a per-EVENT session index (new session
    * when >30 min since the user's previous event) via lag + a
    * running sum of session-start flags — the assignment table funnel
    * and attribution joins consume (q_session_window aggregates the
    * sessions; this labels the events). Both windows stay inside the
    * user partition. */
  val qSessionize: Q = Q(
    "q_sessionize",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        // microsecond-exact gap test: casting each timestamp to whole
        // seconds first would floor BEFORE the subtraction and disagree
        // with any fractional-second oracle arithmetic at the boundary
        .withColumn("is_start",
          (col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L)
            .cast("long"))
        .withColumn("session_idx",
          sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("session_idx"), col("is_start").cast("boolean").as("is_start"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""
      WITH flagged AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(CAST(ts AS TIMESTAMP))
                         - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT event_id, user_id, ts,
             CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx,
             CAST(is_start AS BOOLEAN) AS is_start
      FROM flagged
      ORDER BY user_id, ts, event_id
    """.trim))

  /** Retroactive SESSION-MERGE audit — the batch twin of the
    * state-store coalescing `SessionWindowSpec` pins on the live path
    * (streaming/SessionWindows.scala): two sessions that look separate
    * can be joined by one BRIDGING event that arrives later. Late
    * arrivals are modeled deterministically (`event_id % 7 = 0` —
    * events the stream would see after the rest); sessions (3 h gap)
    * are computed over the base stream alone and over the full stream,
    * and the merge count falls out of pure session accounting: each
    * full-stream session containing k base sessions merged k−1 of
    * them, so per user `n_merged = s_base + s_new − s_full` (s_new =
    * full sessions made ONLY of late events — genuinely new, not
    * merges). A positive n_merged is exactly a bridge event coalescing
    * state-store sessions; the DuckDB oracle replays the identical
    * accounting. Both windows stay inside the user partition
    * (q_sessionize's scale shape). */
  val qSessionMerge: Q = Q(
    "q_session_merge",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val gapMicros = 10800000000L // 3 h — sized so bridges are common
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          (pmod(col("event_id"), lit(7)) === 0).as("late"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      def starts(df: DataFrame): DataFrame = df
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_start",
          (col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros)
            .cast("long"))
      val sBase = starts(ev.filter(!col("late")))
        .groupBy(col("user_id")).agg(sum(col("is_start")).as("s_base"))
      val full = starts(ev)
        .withColumn("sid", sum(col("is_start"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val sFull = full
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"),
          sum(col("late").cast("long")).as("nl"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("s_full"),
          sum((col("n") === col("nl")).cast("long")).as("s_new"))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("late").cast("long")).as("n_late_events"))
        .join(sBase, Seq("user_id"), "left")
        .join(sFull, Seq("user_id"))
        .select(col("user_id"), col("n_events"), col("n_late_events"),
          coalesce(col("s_base"), lit(0L)).as("s_base"),
          col("s_full"), col("s_new"),
          (coalesce(col("s_base"), lit(0L)) + col("s_new") - col("s_full"))
            .as("n_merged"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               (event_id % 7 = 0) AS late
        FROM events),
      ff AS (
        SELECT user_id, event_id, ts, late,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 10800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      fs AS (
        SELECT user_id, late,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM ff),
      bf AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 10800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM ev WHERE NOT late
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sb AS (
        SELECT user_id, CAST(sum(is_start) AS BIGINT) AS s_base
        FROM bf GROUP BY user_id),
      fa AS (
        SELECT user_id, sid, count(*) AS n,
               sum(CASE WHEN late THEN 1 ELSE 0 END) AS nl
        FROM fs GROUP BY user_id, sid),
      sf AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS s_full,
               CAST(sum(CASE WHEN n = nl THEN 1 ELSE 0 END) AS BIGINT) AS s_new
        FROM fa GROUP BY user_id),
      cnt AS (
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late_events
        FROM ev GROUP BY user_id)
      SELECT c.user_id, c.n_events, c.n_late_events,
             coalesce(s.s_base, 0) AS s_base, f.s_full, f.s_new,
             coalesce(s.s_base, 0) + f.s_new - f.s_full AS n_merged
      FROM cnt c LEFT JOIN sb s USING (user_id) JOIN sf f USING (user_id)
      ORDER BY user_id
    """.trim))

  /** Market-basket pair mining: parts co-occurring in an order, with
    * support and exact integer-micro lift. The basket self-join is
    * co-partitioned on the order key (both sides shuffle once on
    * `l_orderkey`), so per-order pair fan-out is bounded by
    * basket_size²/2 — TPC-H baskets are ≤7 distinct parts, and a
    * general corpus would cap basket size the same way the dedup path
    * caps shingle df. Item frequencies join back on the part key;
    * the corpus-wide order count rides a broadcast 1-row table. Lift
    * is computed in pure BIGINT (micro-units, half-up DIV) — no
    * double division to drift between engines. */
  val qMarketBasket: Q = Q(
    "q_market_basket",
    (spark, dir) => {
      // Everything here — the support-thresholded pair list AND its
      // marginals (item frequency, order count) — is the co-occurrence
      // layout artifact the graph family materializes
      // (operators/EdgeArtifact.scala), so the query is a pure
      // artifact consumer: two small scans, two joins, one broadcast.
      val nOrders = graft.operators.EdgeArtifact.meta(spark, dir)
      val freq = graft.operators.EdgeArtifact.nodeFreq(spark, dir)
      graft.operators.EdgeArtifact.edges(spark, dir)
        .select(col("pa"), col("pb"), col("support"))
        .join(freq.select(col("l_partkey").as("pa"), col("f").as("fa")), Seq("pa"))
        .join(freq.select(col("l_partkey").as("pb"), col("f").as("fb")), Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .withColumn("lift_micros",
          expr("(support * n_orders * 1000000L + (fa * fb) DIV 2) DIV (fa * fb)"))
        .select(col("pa"), col("pb"), col("support"), col("fa"), col("fb"),
          col("lift_micros"))
        .orderBy(col("support").desc, col("pa"), col("pb"))
        .limit(100)
    },
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey FROM lineitem),
      n AS (SELECT count(DISTINCT okey) AS n_orders FROM b),
      fr AS (SELECT l_partkey, count(*) AS f FROM b GROUP BY 1),
      p AS (
        SELECT a.l_partkey AS pa, c.l_partkey AS pb,
               CAST(count(*) AS BIGINT) AS support
        FROM b a JOIN b c ON a.okey = c.okey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT pa, pb, support,
             CAST(fa.f AS BIGINT) AS fa, CAST(fb.f AS BIGINT) AS fb,
             (support * n_orders * 1000000 + (fa.f * fb.f) // 2)
               // (fa.f * fb.f) AS lift_micros
      FROM p
      JOIN fr fa ON p.pa = fa.l_partkey
      JOIN fr fb ON p.pb = fb.l_partkey
      CROSS JOIN n
      ORDER BY support DESC, pa, pb
      LIMIT 100
    """.trim))

  /** TPC-H Q17 shape — correlated scalar subquery decorrelated into a
    * join: revenue locked up in small-quantity orders of each part
    * (lineitems with quantity below 20% of that part's own average).
    * Spark's optimizer would rewrite the correlated form the same
    * way; declaring the decorrelated join keeps the plan explicit:
    * one aggregate builds the per-part threshold table, the fact side
    * joins it on the part key and never moves twice. Threshold in
    * exact milli-quantity units (20% of avg = sum*200 DIV n*1000
    * halves cleanly) — no float compare at the boundary. */
  val qSmallQtyRevenue: Q = Q(
    "q_small_qty_revenue",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity"),
          money(col("l_extendedprice")).as("price_4dp"))
      // per-part avg quantity in exact milli-units: sum*1000 DIV n,
      // then 20% of it = *200 DIV n — single integer expression
      val thresh = li.groupBy(col("l_partkey"))
        .agg(expr("sum(CAST(l_quantity AS BIGINT)) * 200 DIV count(1)")
          .as("qty_cut_milli"))
      li.join(thresh, Seq("l_partkey"))
        .filter(col("l_quantity").cast("bigint") * 1000 < col("qty_cut_milli"))
        .agg((sum(col("price_4dp")) / lit(10000.0)).as("small_qty_revenue"),
          count(lit(1)).as("n_lineitems"))
    },
    Some("""
      WITH t AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) * 200
                 // count(*) AS qty_cut_milli
        FROM lineitem GROUP BY l_partkey)
      SELECT CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) / 10000.0 AS small_qty_revenue,
             count(*) AS n_lineitems
      FROM lineitem JOIN t USING (l_partkey)
      WHERE CAST(l_quantity AS BIGINT) * 1000 < qty_cut_milli
    """.trim))

  /** TPC-H Q2 shape — argmin-per-group WITHOUT a window sort: for
    * each part, the cheapest lineitem offer (min extendedprice,
    * supplier key as deterministic tiebreak) falls out of ONE
    * min-of-struct hash aggregate with map-side partials — the
    * row_number()-over-partition formulation would sort every
    * group's history; the aggregate ships one partial per part per
    * input partition. Supplier details then join the part-sized
    * result (broadcast dim), never the fact. */
  val qArgminJoin: Q = Q(
    "q_argmin_join",
    (spark, dir) => {
      val best = Tables.lineitem(spark, dir)
        .select(col("l_partkey"),
          struct(money(col("l_extendedprice")).as("price_4dp"),
            col("l_suppkey")).as("offer"))
        .groupBy(col("l_partkey"))
        .agg(min(col("offer")).as("best"))
        .select(col("l_partkey"),
          (col("best.price_4dp") / lit(10000.0)).as("best_price"),
          col("best.l_suppkey").as("s_suppkey"))
      best.join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))), Seq("s_suppkey"))
        .select(col("l_partkey"), col("best_price"), col("s_suppkey"),
          col("s_name"))
        .orderBy(col("l_partkey"))
    },
    Some("""
      WITH ranked AS (
        SELECT l_partkey,
               CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT) AS p4,
               l_suppkey,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT),
                                           l_suppkey) AS rn
        FROM lineitem)
      SELECT l_partkey, p4 / 10000.0 AS best_price, l_suppkey AS s_suppkey,
             s_name
      FROM ranked JOIN supplier ON ranked.l_suppkey = supplier.s_suppkey
      WHERE rn = 1
      ORDER BY l_partkey
    """.trim))

  /** Conversion-latency distribution: per user, first `view` and
    * first `purchase` reduce in ONE map-side-compacted aggregate
    * (min-of-conditional — no per-user event sort), latency lives in
    * exact integer microseconds, and the exact interpolated
    * percentiles are taken over those integers (one double division
    * at the very end, fixed order, rounded — the same cross-engine
    * float discipline as `q_approx_quantile`). The funnel-latency
    * yardstick product analytics runs daily; at any scale the only
    * shuffle is the per-user partial rows. */
  val qConversionLatency: Q = Q(
    "q_conversion_latency",
    (spark, dir) => Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_buy"))
      .select(col("first_view"), col("first_buy"),
        when(col("first_buy") > col("first_view"),
          unix_micros(col("first_buy")) - unix_micros(col("first_view")))
          .as("lat_us"))
      .agg(count(lit(1)).as("n_users"),
        count(col("lat_us")).as("n_converted"),
        round(expr("percentile(lat_us, 0.5)") / lit(1000000.0), 6).as("p50_s"),
        round(expr("percentile(lat_us, 0.9)") / lit(1000000.0), 6).as("p90_s")),
    Some("""
      WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN CAST(ts AS TIMESTAMP) END) AS first_view,
               min(CASE WHEN event_type = 'purchase'
                        THEN CAST(ts AS TIMESTAMP) END) AS first_buy
        FROM events GROUP BY user_id),
      l AS (
        SELECT CASE WHEN first_buy > first_view
                    THEN epoch_us(first_buy) - epoch_us(first_view) END AS lat_us
        FROM f)
      SELECT count(*) AS n_users,
             count(lat_us) AS n_converted,
             round(quantile_cont(lat_us, 0.5) / 1000000.0, 6) AS p50_s,
             round(quantile_cont(lat_us, 0.9) / 1000000.0, 6) AS p90_s
      FROM l
    """.trim))

  /** Day-over-day composition drift: per-day event-type shares in
    * integer basis points on a DENSE day×type grid (missing cells are
    * 0 bps — a type vanishing IS drift), with each day's maximum
    * absolute share shift vs the previous day. This is the data-mix
    * monitor a training pipeline alerts on before a bad ingest batch
    * poisons a corpus. The type dim is a broadcast constant; the
    * previous-day lookup is the adjacent-key equi-join (same pattern
    * as `q_mom_growth`), so nothing funnels through one partition no
    * matter how long the history grows. */
  val qMixDrift: Q = Q(
    "q_mix_drift",
    (spark, dir) => {
      // three consumers (day totals, type dim, day-type counts): persist
      // the two-column projection so the fact scans once
      val e = Tables.events(spark, dir)
        .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val d = e.groupBy(col("day")).agg(count(lit(1)).as("n"))
      val t = e.select(col("event_type")).distinct()
      val c = e.groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("nt"))
      val shares = d.crossJoin(broadcast(t))
        .join(c, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          expr("coalesce(nt, 0L) * 10000L DIV n").as("bps"))
      val prev = shares.select(
        (col("day") + expr("INTERVAL 1 DAY")).as("day"),
        col("event_type"), col("bps").as("prev_bps"))
      shares.join(prev, Seq("day", "event_type"))
        .groupBy(col("day"))
        .agg(max(abs(col("bps") - col("prev_bps"))).as("max_drift_bps"),
          sum(col("bps")).as("total_bps"))
        .orderBy(col("day"))
    },
    Some("""
      WITH e AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               event_type
        FROM events),
      d AS (SELECT day, count(*) AS n FROM e GROUP BY day),
      t AS (SELECT DISTINCT event_type FROM e),
      c AS (SELECT day, event_type, count(*) AS nt FROM e GROUP BY day, event_type),
      shares AS (
        SELECT d.day, t.event_type,
               coalesce(c.nt, 0) * 10000 // d.n AS bps
        FROM d CROSS JOIN t
        LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type)
      SELECT cur.day,
             CAST(max(abs(cur.bps - prev.bps)) AS BIGINT) AS max_drift_bps,
             CAST(sum(cur.bps) AS BIGINT) AS total_bps
      FROM shares cur
      JOIN shares prev ON cur.day = prev.day + INTERVAL 1 DAY
                      AND cur.event_type = prev.event_type
      GROUP BY cur.day ORDER BY cur.day
    """.trim))

  /** Incremental-aggregation merge proof: the events table is split at
    * a date cutoff into a "base" half and a "delta" half, each is
    * reduced to per-type PARTIALS (count / exact-cents sum / min / max
    * — all mergeable), and the query returns the MERGE of the two
    * partial sets. The oracle aggregates the whole table directly, so
    * parity certifies merge associativity — the contract that lets a
    * 100 TB pipeline aggregate only the new partition and fold it into
    * stored partials instead of recomputing history. (Distinct counts
    * are deliberately absent: they don't merge exactly — that's what
    * the HLL sketches in `q_audience_overlap` are for.) */
  val qDeltaAgg: Q = Q(
    "q_delta_agg",
    (spark, dir) => {
      val cutoff = lit("2024-01-16").cast("timestamp")
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), col("ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      def partials(half: org.apache.spark.sql.DataFrame) = half
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      partials(ev.filter(col("ts") < cutoff))
        .unionAll(partials(ev.filter(col("ts") >= cutoff)))
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_events"), sum(col("s")).as("sum_cents"),
          min(col("lo")).as("ts_min"), max(col("hi")).as("ts_max"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             min(CAST(ts AS TIMESTAMP)) AS ts_min,
             max(CAST(ts AS TIMESTAMP)) AS ts_max
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim))

  /** Catalog statistics collection (the ANALYZE TABLE shape): one
    * pruned single-column scan per column computes null count, exact
    * NDV, and HLL NDV; the per-column stat rows union into the stats
    * table. Column-parallel is the plan real engines run: a columnar
    * source reads each column independently, and each branch's
    * distinct aggregate shuffles only that column's values. (The
    * tempting one-pass multi-distinct aggregate is an anti-pattern:
    * Spark's Expand rewrite multiplies EVERY row by columns+1 with
    * the widest column — here a JSON string — riding every copy; it
    * benched 31.8 s vs 2 s for this formulation at sf0.1.) The exact
    * NDV anchors the oracle; at 100 TB a catalog keeps the sketch. */
  val qColumnStats: Q = Q(
    "q_column_stats",
    (spark, dir) => {
      val cols = Seq("event_id", "user_id", "event_type", "value", "props")
      cols.map { c =>
        Tables.events(spark, dir).select(col(c).as("v"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("v").isNull.cast("long")).as("n_nulls"),
            countDistinct(col("v")).as("ndv"),
            approx_count_distinct(col("v"), 0.01).as("andv"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("ndv"),
            (abs(col("andv") - col("ndv")).cast("double")
              <= col("ndv") * lit(0.05)).as("ndv_within_tol"))
      }.reduce(_ unionAll _)
        .orderBy(col("column_name"))
    },
    Some("""
      WITH s AS (
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
               CAST(count(DISTINCT event_id) AS BIGINT) AS ndv_event_id,
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
               CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_user_id,
               CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
               CAST(count(DISTINCT event_type) AS BIGINT) AS ndv_event_type,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
               CAST(count(DISTINCT value) AS BIGINT) AS ndv_value,
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
               CAST(count(DISTINCT props) AS BIGINT) AS ndv_props
        FROM events)
      SELECT u.column_name, s.n_rows, u.n_nulls, u.ndv,
             true AS ndv_within_tol
      FROM s, (
        SELECT 'event_id' AS column_name, null_event_id AS n_nulls, ndv_event_id AS ndv FROM s
        UNION ALL SELECT 'user_id', null_user_id, ndv_user_id FROM s
        UNION ALL SELECT 'event_type', null_event_type, ndv_event_type FROM s
        UNION ALL SELECT 'value', null_value, ndv_value FROM s
        UNION ALL SELECT 'props', null_props, ndv_props FROM s) u
      ORDER BY u.column_name
    """.trim))

  /** Rolling 7-day active users (WAU) per day plus DAU and the
    * DAU/WAU stickiness ratio in integer basis points. The rolling
    * distinct is computed WITHOUT a range join or window: each
    * (day, user) row fans out to the ≤7 target days it is visible
    * from (explode of a constant offset array), an equi-join against
    * the observed-day dim clips the calendar edge, and one distinct
    * aggregate per target day does the rest. Fan-out is a constant
    * ×7 on the per-day DISTINCT user table (already compacted), which
    * beats a per-day range scan at any scale; at 100 TB the distinct
    * aggregate swaps for the HLL sketch the same plan shape carries. */
  val qRollingWau: Q = Q(
    "q_rolling_wau",
    (spark, dir) => {
      // three consumers (day dim, WAU fan-out, DAU): one scan, persisted
      val du = Tables.events(spark, dir)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val days = du.select(col("day")).distinct()
      val wau = du
        .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("off"),
          col("day"))
        .select(col("user_id"),
          (col("day") + expr("make_interval(0, 0, 0, off, 0, 0, 0)"))
            .as("day"))
        .join(days, Seq("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      du.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
        .join(wau, Seq("day"))
        .withColumn("stickiness_bps", expr("dau * 10000L DIV wau"))
        .orderBy(col("day"))
    },
    Some("""
      WITH du AS (
        SELECT DISTINCT
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               user_id
        FROM events),
      days AS (SELECT DISTINCT day FROM du),
      wau AS (
        SELECT d.day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
        FROM days d
        JOIN du ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day),
      dau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM du GROUP BY day)
      SELECT dau.day, dau.dau, wau.wau,
             dau.dau * 10000 // wau.wau AS stickiness_bps
      FROM dau JOIN wau ON dau.day = wau.day
      ORDER BY dau.day
    """.trim))

  /** Audience overlap for every event-type pair by sketch algebra:
    * |A∩B| = |A| + |B| − |A∪B|, with the union cardinality computed in
    * ONE pass — each event is tagged to the (T−1) pairs its type
    * belongs to via a broadcast pair dim (T is a small constant), then
    * one distinct-aggregate per pair. HLL estimates ride the same
    * aggregate; at 100 TB the exact `countDistinct` (kept here as the
    * oracle anchor) drops out and the mergeable sketches are the whole
    * job — no user-level pair self-join anywhere. Tolerance booleans
    * absorb the compounded three-sketch error. */
  val qAudienceOverlap: Q = Q(
    "q_audience_overlap",
    (spark, dir) => {
      // two consumers (per-type stats, pair-tagged unions): persist the
      // compacted membership table so the fact scans once
      val u = Tables.events(spark, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perType = u.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), approx_count_distinct(col("user_id"), 0.01).as("a"))
      val types = perType.select(col("event_type"), col("n"), col("a"))
      val pairs = types.select(col("event_type").as("type_a"),
          col("n").as("n_a"), col("a").as("a_a"))
        .crossJoin(broadcast(types.select(col("event_type").as("type_b"),
          col("n").as("n_b"), col("a").as("a_b"))))
        .filter(col("type_a") < col("type_b"))
      val unions = u
        .join(broadcast(pairs.select(col("type_a"), col("type_b"))),
          col("event_type") === col("type_a") || col("event_type") === col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(countDistinct(col("user_id")).as("n_union"),
          approx_count_distinct(col("user_id"), 0.01).as("a_union"))
      unions.join(broadcast(pairs), Seq("type_a", "type_b"))
        .withColumn("n_overlap", col("n_a") + col("n_b") - col("n_union"))
        .withColumn("within_tol",
          abs((col("a_a") + col("a_b") - col("a_union")) - col("n_overlap"))
            .cast("double") <= greatest(col("n_overlap") * lit(0.1), lit(10.0)))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_union"), col("n_overlap"), col("within_tol"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""
      WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
      c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
      p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.n AS n_a, b.n AS n_b
            FROM c a JOIN c b ON a.event_type < b.event_type),
      un AS (SELECT type_a, type_b,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS n_union
             FROM p JOIN u ON u.event_type = type_a OR u.event_type = type_b
             GROUP BY 1, 2)
      SELECT p.type_a, p.type_b, p.n_a, p.n_b, un.n_union,
             p.n_a + p.n_b - un.n_union AS n_overlap,
             true AS within_tol
      FROM p JOIN un ON p.type_a = un.type_a AND p.type_b = un.type_b
      ORDER BY p.type_a, p.type_b
    """.trim))

  /** Month-over-month revenue: per-month exact-cents totals plus the
    * previous month's total and the signed delta — WITHOUT a window.
    * The adjacent-month lookup is an equi-join of the monthly
    * aggregate against itself shifted by one month, so the plan
    * shuffles on the month key instead of funneling every month's row
    * through one partition (the `lag() OVER (ORDER BY month)` shape
    * the registry's plan guard forbids). Growth in basis points rides
    * the same half-up integer DIV as the basket lift. */
  val qMomGrowth: Q = Q(
    "q_mom_growth",
    (spark, dir) => {
      val monthly = Tables.orders(spark, dir)
        .select(date_trunc("month", col("o_orderdate")).as("month"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("month"))
        .agg(sum(col("cents")).as("revenue_cents"),
          count(lit(1)).as("n_orders"))
      monthly
        .join(monthly.select(add_months(col("month"), 1).cast("timestamp").as("month"),
            col("revenue_cents").as("prev_cents")),
          Seq("month"), "left")
        .withColumn("delta_cents", col("revenue_cents") - col("prev_cents"))
        // abs-then-resign: Spark DIV truncates toward zero while
        // DuckDB // floors, so the quotient must never see a negative
        // numerator (positive inputs make trunc == floor)
        .withColumn("growth_bps",
          expr("CASE WHEN delta_cents >= 0 THEN 1L ELSE -1L END " +
            "* ((abs(delta_cents) * 10000L + prev_cents DIV 2) DIV prev_cents)"))
        .orderBy(col("month"))
    },
    Some("""
      WITH m AS (
        SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP) AS month,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT cur.month, cur.revenue_cents, cur.n_orders,
             prev.revenue_cents AS prev_cents,
             cur.revenue_cents - prev.revenue_cents AS delta_cents,
             CAST((CASE WHEN cur.revenue_cents - prev.revenue_cents >= 0
                        THEN 1 ELSE -1 END)
                  * ((abs(cur.revenue_cents - prev.revenue_cents) * 10000
                      + prev.revenue_cents // 2)
                     // prev.revenue_cents) AS BIGINT) AS growth_bps
      FROM m cur
      LEFT JOIN m prev ON cur.month = CAST(prev.month + INTERVAL 1 MONTH AS TIMESTAMP)
      ORDER BY cur.month
    """.trim))

  /** RFM segmentation: each customer scored 1-4 on Recency (days since
    * last order), Frequency (order count) and Monetary (lifetime spend)
    * against the population quartiles, then the 64-cell segment census.
    * The quartile CUTS come from one exact-percentile aggregate over
    * the per-customer rollup — a one-row broadcast — and every customer
    * scores by three comparisons against it (score = 1 + Σ v>q). No
    * ntile, no global window: at 100 TB the alternative (ntile over all
    * customers) funnels the rollup through one partition; threshold
    * scoring is map-side and embarrassingly parallel, at the price that
    * tied metric values share a score (the defensible semantics
    * anyway). Interpolated quartiles on exact integer inputs evaluate
    * the same IEEE arithmetic in both engines. */
  val qRfmSegments: Q = Q(
    "q_rfm_segments",
    (spark, dir) => {
      val per = Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("spend_cents"))
        .withColumn("recency_days",
          datediff(lit("2001-09-01"), col("last_order")).cast("long"))
      val cuts = broadcast(per.agg(
        expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("rq"),
        expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("fq"),
        expr("percentile(spend_cents, array(0.25, 0.5, 0.75))").as("mq")))
      per.crossJoin(cuts)
        .select(col("spend_cents"),
          // recency: FEWER days since last order = better = higher score
          (lit(1) + (col("recency_days") < col("rq")(2)).cast("int")
            + (col("recency_days") < col("rq")(1)).cast("int")
            + (col("recency_days") < col("rq")(0)).cast("int")).as("r_score"),
          (lit(1) + (col("frequency") > col("fq")(0)).cast("int")
            + (col("frequency") > col("fq")(1)).cast("int")
            + (col("frequency") > col("fq")(2)).cast("int")).as("f_score"),
          (lit(1) + (col("spend_cents") > col("mq")(0)).cast("int")
            + (col("spend_cents") > col("mq")(1)).cast("int")
            + (col("spend_cents") > col("mq")(2)).cast("int")).as("m_score"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_custs"), sum(col("spend_cents")).as("seg_cents"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },
    Some("""
      WITH per AS (
        SELECT o_custkey, count(*) AS frequency,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS spend_cents,
               CAST(date_diff('day', max(o_orderdate),
                    TIMESTAMP '2001-09-01') AS BIGINT) AS recency_days
        FROM orders GROUP BY o_custkey),
      cuts AS (
        SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
               quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
               quantile_cont(spend_cents, [0.25, 0.5, 0.75]) AS mq
        FROM per),
      scored AS (
        SELECT spend_cents,
               1 + CAST(recency_days < rq[3] AS INT)
                 + CAST(recency_days < rq[2] AS INT)
                 + CAST(recency_days < rq[1] AS INT) AS r_score,
               1 + CAST(frequency > fq[1] AS INT)
                 + CAST(frequency > fq[2] AS INT)
                 + CAST(frequency > fq[3] AS INT) AS f_score,
               1 + CAST(spend_cents > mq[1] AS INT)
                 + CAST(spend_cents > mq[2] AS INT)
                 + CAST(spend_cents > mq[3] AS INT) AS m_score
        FROM per, cuts)
      SELECT r_score, f_score, m_score, count(*) AS n_custs,
             CAST(sum(spend_cents) AS BIGINT) AS seg_cents
      FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """.trim))

  /** A/B experiment readout: users split by id parity, per event type
    * the two arms' counts, means and a Welch t statistic. All moments
    * come from exact integer partials (cent sums and squared-cent
    * sums — one pass, map-side combinable); the divisions and the one
    * sqrt run on doubles DERIVED from those exact integers, so both
    * engines execute the identical IEEE expression tree and the
    * rounded t-statistic is bit-stable. Sample variance (n-1).
    * Squared cents accumulate in DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB): a BIGINT sum of cents² wraps silently in Spark's
    * non-ANSI mode near ~10^18 — reachable at the 100 TB posture —
    * while 128-bit accumulation holds to ~10^38. The t-statistic is
    * NULL when either arm has fewer than 2 events (variance needs
    * n-1 ≥ 1). */
  val qAbtestStats: Q = Q(
    "q_abtest_stats",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("arm_a"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      ev.groupBy(col("event_type"))
        .agg(
          sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm_a"), col("cents")).otherwise(0L)).as("sum_a"),
          sum(when(!col("arm_a"), col("cents")).otherwise(0L)).as("sum_b"),
          sum(when(col("arm_a"),
            col("cents").cast("decimal(19,0)") * col("cents"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("ss_a"),
          sum(when(!col("arm_a"),
            col("cents").cast("decimal(19,0)") * col("cents"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("ss_b"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          round(col("sum_a").cast("double") / col("n_a"), 6).as("mean_a"),
          round(col("sum_b").cast("double") / col("n_b"), 6).as("mean_b"),
          when(col("n_a") > 1 && col("n_b") > 1,
            round((col("sum_a").cast("double") / col("n_a")
                - col("sum_b").cast("double") / col("n_b")) /
              sqrt(
                ((col("ss_a").cast("double")
                  - col("sum_a").cast("double") * col("sum_a") / col("n_a"))
                  / (col("n_a") - 1) / col("n_a")) +
                ((col("ss_b").cast("double")
                  - col("sum_b").cast("double") * col("sum_b") / col("n_b"))
                  / (col("n_b") - 1) / col("n_b"))), 6)).as("welch_t"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type, user_id % 2 = 0 AS arm_a,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      g AS (
        SELECT event_type,
               CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN arm_a THEN cents ELSE 0 END) AS BIGINT) AS sum_a,
               CAST(sum(CASE WHEN NOT arm_a THEN cents ELSE 0 END) AS BIGINT) AS sum_b,
               sum(CASE WHEN arm_a THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS ss_a,
               sum(CASE WHEN NOT arm_a THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS ss_b
        FROM ev GROUP BY event_type)
      SELECT event_type, n_a, n_b,
             round(CAST(sum_a AS DOUBLE) / n_a, 6) AS mean_a,
             round(CAST(sum_b AS DOUBLE) / n_b, 6) AS mean_b,
             CASE WHEN n_a > 1 AND n_b > 1 THEN
               round((CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b) /
                 sqrt(
                   ((CAST(ss_a AS DOUBLE) - CAST(sum_a AS DOUBLE) * sum_a / n_a)
                     / (n_a - 1) / n_a) +
                   ((CAST(ss_b AS DOUBLE) - CAST(sum_b AS DOUBLE) * sum_b / n_b)
                     / (n_b - 1) / n_b)), 6)
             END AS welch_t
      FROM g ORDER BY event_type
    """.trim))

  /** Time-weighted average: each event's value held until the user's
    * next event, the mean weighted by holding duration — the correct
    * average for irregularly-sampled state (a price, a setting, a
    * sensor). One lead() per user partition, then one aggregate;
    * weights are exact second counts, values exact cents, so the
    * weighted sum is pure integer arithmetic and the final ratio one
    * integer division. Users with a single event have no held
    * interval and drop out — exactly the rows lead() nulls. */
  val qTimeWeightedAvg: Q = Q(
    "q_time_weighted_avg",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("dur_ms",
          expr("(unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - unix_micros(ts)) DIV 1000"))
        .filter(col("dur_ms").isNotNull && col("dur_ms") > 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dur_ms")).as("held_ms"),
          sum(col("cents") * col("dur_ms")).as("wsum"))
        .select(col("user_id"), col("n_intervals"), col("held_ms"),
          expr("wsum DIV held_ms").as("twa_cents"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH iv AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id)) - epoch_us(ts)) // 1000 AS dur_ms
        FROM events)
      SELECT user_id, count(*) AS n_intervals,
             CAST(sum(dur_ms) AS BIGINT) AS held_ms,
             CAST(sum(cents * dur_ms) AS BIGINT) // CAST(sum(dur_ms) AS BIGINT)
               AS twa_cents
      FROM iv WHERE dur_ms IS NOT NULL AND dur_ms > 0
      GROUP BY user_id ORDER BY user_id
    """.trim))

  /** Distributional window ranks: percent_rank and cume_dist of each
    * event's value INSIDE the user partition — the per-entity relative
    * standing feature (is this purchase big *for this user*?). Both
    * rank functions ride one partitioned sort; ties break identically
    * in both engines because the rank depends only on the cents order
    * statistic, never on row order. */
  val qWindowRanks: Q = Q(
    "q_window_ranks",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cents"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .select(col("user_id"), col("event_id"), col("cents"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT))
      ORDER BY user_id, event_id
    """.trim))

  /** Benford first-digit audit over order totals — the classic
    * fabricated-numbers screen: observed leading-digit counts of the
    * integer cents against the Benford expectation n·log10(1+1/d),
    * with the signed deviation in ppm of n. The digit comes from the
    * decimal string of the exact cents (never float formatting); the
    * expectation uses ln-ratio doubles on identical expression text
    * and lands as floor'd integer milli-counts, deviations as floor'd
    * ppm — integers end to end. One scan, one 9-row aggregate;
    * synthetic uniform-ish prices will NOT follow Benford, which is
    * exactly what the audit is for (the gauge reports the divergence
    * honestly rather than asserting conformity). */
  val qBenford: Q = Q(
    "q_benford",
    (spark, dir) => {
      val cents = Tables.orders(spark, dir)
        .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .as("cents"))
        .filter(col("cents") > 0)
      val digits = cents
        .select(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
      val tot = cents.agg(count(lit(1)).as("n"))
      digits.crossJoin(broadcast(tot))
        .select(col("d"), col("n_obs"),
          floor(col("n").cast("double")
            * (log(lit(1.0) + lit(1.0) / col("d")) / log(lit(10.0)))
            * 1000).cast("long").as("exp_milli"),
          floor((col("n_obs").cast("double")
            - col("n").cast("double")
              * (log(lit(1.0) + lit(1.0) / col("d")) / log(lit(10.0))))
            / col("n") * 1000000).cast("long").as("dev_ppm"))
        .orderBy(col("d"))
    },
    Some("""
      WITH c AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
        WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
      dg AS (
        SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS d,
               count(*) AS n_obs
        FROM c GROUP BY 1),
      t AS (SELECT count(*) AS n FROM c)
      SELECT d, n_obs,
             CAST(floor(CAST(n AS DOUBLE)
               * (ln(1.0e0 + 1.0e0 / d) / ln(10.0e0)) * 1000) AS BIGINT)
               AS exp_milli,
             CAST(floor((CAST(n_obs AS DOUBLE)
               - CAST(n AS DOUBLE) * (ln(1.0e0 + 1.0e0 / d) / ln(10.0e0)))
               / n * 1000000) AS BIGINT) AS dev_ppm
      FROM dg, t ORDER BY d
    """.trim))

  /** Unbiased pass@k (Chen et al. 2021, the Codex-paper estimator):
    * with n samples per problem of which c pass, pass@k =
    * 1 − C(n−c,k)/C(n,k), computed as the falling-factorial ratio
    * ff(n−c,k)/ff(n,k) so no binomial ever materializes. Fixed n = 20
    * samples per problem (the standard protocol — and what keeps the
    * integer arithmetic exact: ff(20,10)·10^6 < 2^63): each user_id
    * is a "problem", its first 20 events by time the samples, and
    * `purchase` the pass criterion. Problems with fewer than 20
    * events are excluded (the estimator is undefined below k).
    * When n−c < k some falling-factorial term is zero, so the plain
    * product already yields pass@k = 1 — no special-casing. Exact
    * integer ppm end-to-end; the mean over problems is an integer
    * division.
    *
    * Scale shape: one per-user window (first 20), one per-user
    * aggregate, then a 1-row rollup unpivoted to the three k rows —
    * everything past the scan moves O(problems) rows. */
  val qEvalPassk: Q = {
    val ks = Seq(1, 5, 10)
    // Π_{i=0..k-1}(x - i) as SQL over column c with x = 20 - c
    def ffSql(k: Int): String =
      (0 until k).map(i => s"(20 - c - $i)").mkString(" * ")
    val ff20 = ks.map(k => k -> (0 until k)
      .map(i => 20L - i).product).toMap
    Q(
      "q_eval_passk",
      (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val perProb = Tables.events(spark, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            (col("event_type") === "purchase").as("pass"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pass"), 1L).otherwise(0L)).as("c"))
          .filter(col("n") === 20)
        val ppm = ks.foldLeft(perProb) { (df, k) =>
          df.withColumn(s"ppm$k",
            expr(s"1000000 - (1000000 * (${ffSql(k)})) div ${ff20(k)}"))
        }
        ppm.groupBy()
          .agg(count(lit(1)).as("n_problems"),
            ks.flatMap(k => Seq(
              sum(col(s"ppm$k")).as(s"s$k"),
              min(col(s"ppm$k")).as(s"mn$k"),
              max(col(s"ppm$k")).as(s"mx$k"))): _*)
          .selectExpr("n_problems",
            s"stack(${ks.size}, " + ks.map(k =>
              s"$k, s$k div n_problems, mn$k, mx$k").mkString(", ") +
              ") as (k, mean_passk_ppm, min_ppm, max_ppm)")
          .select(col("k").cast("long").as("k"), col("n_problems"),
            col("mean_passk_ppm"), col("min_ppm"), col("max_ppm"))
          .orderBy(col("k"))
      },
      Some(s"""
      WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
        FROM events),
      prob AS (
        SELECT user_id, count(*) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS c
        FROM ranked WHERE rn <= 20 GROUP BY user_id),
      p AS (SELECT * FROM prob WHERE n = 20),
      ppm AS (
        SELECT user_id,
               ${ks.map(k => s"1000000 - (1000000 * (${ffSql(k)})) " +
                 s"// ${ff20(k)} AS ppm$k").mkString(",\n               ")}
        FROM p),
      agg AS (
        SELECT count(*) AS n_problems,
               ${ks.map(k => s"CAST(sum(ppm$k) AS BIGINT) AS s$k, " +
                 s"CAST(min(ppm$k) AS BIGINT) AS mn$k, " +
                 s"CAST(max(ppm$k) AS BIGINT) AS mx$k")
                 .mkString(",\n               ")}
        FROM ppm)
      ${ks.map(k =>
        s"SELECT CAST($k AS BIGINT) AS k, n_problems, " +
        s"CAST(s$k // n_problems AS BIGINT) AS mean_passk_ppm, " +
        s"mn$k AS min_ppm, mx$k AS max_ppm FROM agg")
        .mkString("\n      UNION ALL\n      ")}
      ORDER BY k
    """.trim))
  }

  def all: Seq[Q] = Seq(
    qEvalPassk,
    qBenford,
    qRfmSegments, qAbtestStats, qTimeWeightedAvg, qWindowRanks,
    qAggPricing, qJoinBroadcast, qJoinRevenue, qJoinSemi, qJoinAnti, qSetOps, qJoinSnowflake, qLagFeatures, qDownsampleOhlc, qSessionize, qSessionMerge, qMarketBasket, qMomGrowth, qAudienceOverlap, qRollingWau, qDeltaAgg, qColumnStats, qMixDrift, qSmallQtyRevenue, qConversionLatency, qArgminJoin,
    qAggHaving, qWindowTopn, qTopkAgg, qWindowRunning, qAggRollup, qAggCube, qGroupingSets, qWindowTime,
    qSessionWindow, qApproxDistinct, qPivot, qStatsMoments,
    qSampleStratified, qSampleWeighted, qAsofJoin, qAsofForward, qWindowSliding, qApproxQuantile,
    qJoinSalted, qFunnel, qSkewProfile, qCompletenessAudit,
    qReferentialAudit, qKeyUniqueness,
    qEventTransitions, qCohortRetention, qEquidepthHist, qAnomalyMad,
    qGapPercentiles)
}
