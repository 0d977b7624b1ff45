package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Privacy / re-identification audits of a DERIVED per-user release —
  * the complement of the row-level gates in [[LayoutQueries]]
  * (`q_privacy_kanon`/`q_privacy_ldiversity` audit raw event-row
  * attribute combinations): here the released object is the per-user
  * behavioral profile an analytics export would actually ship
  * (dominant event type, activity-volume bucket, active-days bucket,
  * spend bucket), where each user is exactly one row and
  * re-identification means linking a PERSON, not a row. Three gates:
  * banded k-anonymity of the profile, singleton risk under a
  * generalization ladder, and l-diversity of the spend attribute
  * (Sweeney 2002; Machanavajjhala et al. 2007).
  *
  * Scale shape shared by all three: ONE wide pre-aggregation of the
  * event log on (user, type, day) — the only shuffle proportional to
  * the data — then strictly shrinking per-user and per-group
  * aggregates. The dominant type is derived deterministically
  * (max count, ties to the lexicographically smallest type) rather
  * than by `arg_max`, whose tie-break neither engine pins down. All
  * buckets are integer arithmetic so the two engines partition users
  * identically. */
object PrivacyQueries {

  /** Per-user quasi-identifier profile, identical in both engines:
    * (dominant event type, event-volume bucket, active-days bucket,
    * spend bucket). */
  private def profile(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val utd = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"),
        to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    val ut = utd.groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("c")).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val dom = ut.withColumn("mx", max(col("cnt")).over(w))
      .groupBy(col("user_id"))
      .agg(min(when(col("cnt") === col("mx"), col("event_type")))
        .as("dom_type"))
    val ud = utd.groupBy(col("user_id"))
      .agg(countDistinct(col("d")).as("days"),
        sum(col("c")).as("n_events"),
        sum(col("cents")).as("cents"))
    ud.join(dom, "user_id")
      .select(col("user_id"), col("dom_type"),
        expr("least(n_events div 8, cast(12 as bigint))").as("ebkt"),
        expr("least(days div 5, cast(10 as bigint))").as("dbkt"),
        expr("least(greatest(cents, cast(0 as bigint)) div 100000," +
          " cast(9 as bigint))").as("sbkt"))
  }

  /** Shared oracle CTE building the identical profile in DuckDB. */
  private val profileCte = """
      WITH utd AS (
        SELECT user_id, event_type, CAST(ts AS DATE) AS d,
               count(*) AS c,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events GROUP BY 1, 2, 3),
      ut AS (
        SELECT user_id, event_type, CAST(sum(c) AS BIGINT) AS cnt
        FROM utd GROUP BY 1, 2),
      dom AS (
        SELECT user_id,
               min(CASE WHEN cnt = mx THEN event_type END) AS dom_type
        FROM (SELECT user_id, event_type, cnt,
                     max(cnt) OVER (PARTITION BY user_id) AS mx
              FROM ut)
        GROUP BY user_id),
      ud AS (
        SELECT user_id, CAST(count(DISTINCT d) AS BIGINT) AS days,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM utd GROUP BY user_id),
      prof AS (
        SELECT u.user_id, dom_type,
               least(n_events // 8, 12) AS ebkt,
               least(days // 5, 10) AS dbkt,
               least(greatest(cents, 0) // 100000, 9) AS sbkt
        FROM ud u JOIN dom USING (user_id))"""

  /** k-anonymity histogram: quasi-identifier groups banded by size
    * (k=1 singletons are directly re-identifiable; the k<5 bands are
    * what a k=5 release must suppress or generalize away). Per band:
    * group count, user count, and each band's share of all users in
    * milli. */
  val qPrivacyKanon: Q = Q(
    "q_profile_kanon",
    (spark, dir) => {
      val sizes = profile(spark, dir)
        .groupBy(col("dom_type"), col("ebkt"), col("dbkt"))
        .agg(count(lit(1)).as("g"))
        .select(
          when(col("g") === 1, "1").when(col("g") <= 4, "2-4")
            .when(col("g") <= 9, "5-9").otherwise("10+").as("k_band"),
          col("g"))
      sizes.groupBy(col("k_band"))
        .agg(count(lit(1)).as("n_groups"), sum(col("g")).as("n_users"))
        .withColumn("share_milli",
          expr("cast(n_users * 1000 div (sum(n_users) over ()) as bigint)"))
        .orderBy(col("k_band"))
    },
    Some(s"""
      $profileCte,
      sizes AS (
        SELECT CASE WHEN g = 1 THEN '1' WHEN g <= 4 THEN '2-4'
                    WHEN g <= 9 THEN '5-9' ELSE '10+' END AS k_band, g
        FROM (SELECT dom_type, ebkt, dbkt, CAST(count(*) AS BIGINT) AS g
              FROM prof GROUP BY 1, 2, 3)),
      b AS (
        SELECT k_band, count(*) AS n_groups, CAST(sum(g) AS BIGINT) AS n_users
        FROM sizes GROUP BY k_band)
      SELECT k_band, n_groups, n_users,
             CAST(n_users * 1000 // (sum(n_users) OVER ()) AS BIGINT)
               AS share_milli
      FROM b ORDER BY k_band
    """.trim))

  /** Generalization-ladder uniqueness: how the singleton
    * (re-identifiable) share shrinks as quasi-identifier columns are
    * generalized away right-to-left — level 0 = (type, volume, days),
    * 1 = drop days, 2 = drop volume, 3 = fully generalized. ROLLUP
    * computes all four group-bys in one aggregate; the buckets are
    * never NULL in the data, so the NULL-filled rollup rows identify
    * the level unambiguously. */
  val qPrivacyLadder: Q = Q(
    "q_privacy_ladder",
    (spark, dir) => {
      val sizes = profile(spark, dir)
        .rollup(col("dom_type"), col("ebkt"), col("dbkt"))
        .agg(count(lit(1)).as("g"))
        .select(
          (when(col("dom_type").isNull, 1).otherwise(0)
            + when(col("ebkt").isNull, 1).otherwise(0)
            + when(col("dbkt").isNull, 1).otherwise(0)).as("level"),
          col("g"))
      sizes.groupBy(col("level"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(col("g")).as("n_users"))
        .select(col("level"), col("n_groups"), col("n_singletons"),
          expr("cast(n_singletons * 1000 div n_users as bigint)")
            .as("risk_milli"))
        .orderBy(col("level"))
    },
    Some(s"""
      $profileCte,
      sizes AS (
        SELECT (CASE WHEN dom_type IS NULL THEN 1 ELSE 0 END
              + CASE WHEN ebkt IS NULL THEN 1 ELSE 0 END
              + CASE WHEN dbkt IS NULL THEN 1 ELSE 0 END) AS level,
               g
        FROM (SELECT dom_type, ebkt, dbkt, CAST(count(*) AS BIGINT) AS g
              FROM prof GROUP BY ROLLUP (dom_type, ebkt, dbkt))),
      lv AS (
        SELECT level, count(*) AS n_groups,
               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_singletons,
               CAST(sum(g) AS BIGINT) AS n_users
        FROM sizes GROUP BY level)
      SELECT level, n_groups, n_singletons,
             CAST(n_singletons * 1000 // n_users AS BIGINT) AS risk_milli
      FROM lv ORDER BY level
    """.trim))

  /** l-diversity of the sensitive spend bucket within (type, volume)
    * quasi-identifier groups: a group where every member shares one
    * spend bucket (l=1) discloses the attribute even when k-anonymous.
    * Histogram over l bands with group and user counts, plus each
    * band's share of users in milli. */
  val qPrivacyLdiv: Q = Q(
    "q_profile_ldiv",
    (spark, dir) => {
      val groups = profile(spark, dir)
        .groupBy(col("dom_type"), col("ebkt"))
        .agg(countDistinct(col("sbkt")).as("l"), count(lit(1)).as("g"))
        .select(
          when(col("l") === 1, "1").when(col("l") === 2, "2")
            .when(col("l") <= 4, "3-4").otherwise("5+").as("l_band"),
          col("g"))
      groups.groupBy(col("l_band"))
        .agg(count(lit(1)).as("n_groups"), sum(col("g")).as("n_users"))
        .withColumn("share_milli",
          expr("cast(n_users * 1000 div (sum(n_users) over ()) as bigint)"))
        .orderBy(col("l_band"))
    },
    Some(s"""
      $profileCte,
      groups AS (
        SELECT CASE WHEN l = 1 THEN '1' WHEN l = 2 THEN '2'
                    WHEN l <= 4 THEN '3-4' ELSE '5+' END AS l_band, g
        FROM (SELECT dom_type, ebkt,
                     CAST(count(DISTINCT sbkt) AS BIGINT) AS l,
                     CAST(count(*) AS BIGINT) AS g
              FROM prof GROUP BY 1, 2)),
      b AS (
        SELECT l_band, count(*) AS n_groups, CAST(sum(g) AS BIGINT) AS n_users
        FROM groups GROUP BY l_band)
      SELECT l_band, n_groups, n_users,
             CAST(n_users * 1000 // (sum(n_users) OVER ()) AS BIGINT)
               AS share_milli
      FROM b ORDER BY l_band
    """.trim))

  /** t-closeness of the ordered spend bucket within (type, volume)
    * quasi-identifier groups (Li et al. 2007) — the gate l-diversity
    * misses: a group can hold many DISTINCT spend buckets yet still
    * leak because its distribution skews far from the corpus's. For
    * an ordered attribute the distance is the Earth Mover's Distance
    * = mean |cumulative-share gap|, computed here as EXACT integers:
    * per (group, bucket) the term is |N·cum_c − n_g·cum_C| (group and
    * global counts cross-multiplied instead of divided — DECIMAL(38)/
    * HUGEINT products, since N·cum reaches ~10²² at a 10¹¹-user
    * release), summed per group and floored to ppm of the n_g·N·(m−1)
    * normalizer. Histogram over t bands (0.1 steps; t ≤ 0.3 is the
    * usual release gate) with group/user counts and the worst group's
    * EMD.
    *
    * Scale: the dense (group × bucket) grid is groups × m ≤ 10 rows —
    * built by a broadcast of the ≤10-row global bucket table, never a
    * corpus shuffle; cumulative sums run in m-row partitioned windows;
    * the global cumulative is a 10×10 self-join. One corpus pass (the
    * shared profile pre-aggregation), everything after is
    * dimension-sized. */
  val qPrivacyTcloseness: Q = Q(
    "q_profile_tcloseness",
    (spark, dir) => {
      val prof = profile(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val glob = prof.groupBy(col("sbkt")).agg(count(lit(1)).as("cs"))
      val globCum = glob.as("a")
        .join(glob.select(col("sbkt").as("s2"), col("cs").as("cs2")).as("b"),
          col("s2") <= col("sbkt"))
        .groupBy(col("sbkt"))
        .agg(sum(col("cs2")).as("cum_glob"))
      val gtot = glob.agg(sum(col("cs")).as("n_total"),
        count(lit(1)).as("m"))
      val grp = prof.groupBy(col("dom_type"), col("ebkt"))
        .agg(count(lit(1)).as("n_g"))
      val cgs = prof.groupBy(col("dom_type"), col("ebkt"), col("sbkt"))
        .agg(count(lit(1)).as("c"))
      val grid = grp.crossJoin(broadcast(glob.select(col("sbkt"))))
        .join(cgs, Seq("dom_type", "ebkt", "sbkt"), "left")
        .select(col("dom_type"), col("ebkt"), col("sbkt"), col("n_g"),
          coalesce(col("c"), lit(0L)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dom_type"), col("ebkt"))
        .orderBy(col("sbkt"))
      val emd = grid
        .withColumn("cum_c", sum(col("c")).over(w))
        .join(broadcast(globCum), "sbkt")
        .crossJoin(broadcast(gtot))
        .groupBy(col("dom_type"), col("ebkt"), col("n_g"), col("n_total"),
          col("m"))
        .agg(sum(expr("abs(cast(n_total as decimal(38,0)) * cum_c" +
          " - cast(n_g as decimal(38,0)) * cum_glob)")).as("d_sum"))
        .select(col("n_g"),
          expr("cast(d_sum * 1000000 div (cast(n_g as decimal(38,0))" +
            " * n_total * greatest(m - 1, 1)) as bigint)").as("emd_ppm"))
      emd
        .select(
          when(col("emd_ppm") <= 100000, "0.0-0.1")
            .when(col("emd_ppm") <= 200000, "0.1-0.2")
            .when(col("emd_ppm") <= 300000, "0.2-0.3")
            .otherwise("0.3+").as("t_band"),
          col("n_g"), col("emd_ppm"))
        .groupBy(col("t_band"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n_g")).as("n_users"),
          max(col("emd_ppm")).as("max_emd_ppm"))
        .orderBy(col("t_band"))
    },
    Some(s"""
      $profileCte,
      gdist AS (
        SELECT sbkt, CAST(count(*) AS BIGINT) AS cs FROM prof GROUP BY sbkt),
      globcum AS (
        SELECT a.sbkt, CAST(sum(b.cs) AS BIGINT) AS cum_glob
        FROM gdist a JOIN gdist b ON b.sbkt <= a.sbkt GROUP BY a.sbkt),
      gtot AS (
        SELECT CAST(sum(cs) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS m FROM gdist),
      grp AS (
        SELECT dom_type, ebkt, CAST(count(*) AS BIGINT) AS n_g
        FROM prof GROUP BY 1, 2),
      cgs AS (
        SELECT dom_type, ebkt, sbkt, CAST(count(*) AS BIGINT) AS c
        FROM prof GROUP BY 1, 2, 3),
      grid AS (
        SELECT g.dom_type, g.ebkt, v.sbkt, g.n_g,
               coalesce(c.c, 0) AS c
        FROM grp g CROSS JOIN (SELECT sbkt FROM gdist) v
        LEFT JOIN cgs c USING (dom_type, ebkt, sbkt)),
      cum AS (
        SELECT dom_type, ebkt, sbkt, n_g,
               sum(c) OVER (PARTITION BY dom_type, ebkt ORDER BY sbkt
                 ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM grid),
      emd AS (
        SELECT dom_type, ebkt, any_value(n_g) AS n_g,
               CAST(sum(abs(CAST(t.n_total AS HUGEINT) * cum_c
                 - CAST(n_g AS HUGEINT) * gc.cum_glob))
                 * 1000000 // (CAST(any_value(n_g) AS HUGEINT)
                   * any_value(t.n_total)
                   * greatest(any_value(t.m) - 1, 1)) AS BIGINT) AS emd_ppm
        FROM cum JOIN globcum gc USING (sbkt) CROSS JOIN gtot t
        GROUP BY dom_type, ebkt),
      banded AS (
        SELECT CASE WHEN emd_ppm <= 100000 THEN '0.0-0.1'
                    WHEN emd_ppm <= 200000 THEN '0.1-0.2'
                    WHEN emd_ppm <= 300000 THEN '0.2-0.3'
                    ELSE '0.3+' END AS t_band,
               n_g, emd_ppm
        FROM emd)
      SELECT t_band, count(*) AS n_groups,
             CAST(sum(n_g) AS BIGINT) AS n_users,
             CAST(max(emd_ppm) AS BIGINT) AS max_emd_ppm
      FROM banded GROUP BY t_band ORDER BY t_band
    """.trim))

  val all: Seq[Q] = Seq(qPrivacyKanon, qPrivacyLadder, qPrivacyLdiv,
    qPrivacyTcloseness)
}
