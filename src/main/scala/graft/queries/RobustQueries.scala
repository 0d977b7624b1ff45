package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.Sampling

/** Robust estimation over dirty numeric columns — the aggregates a
  * curation pipeline trusts when the raw mean is hostage to outliers:
  * winsorized means (clamp to sample-estimated percentile fences) and
  * Poisson-bootstrap confidence intervals (the resampling scheme that
  * actually runs at corpus scale: per-(row, replicate) multiplicities
  * are computed IN-ROW from a hash, so resampling is map-side and the
  * shuffle carries only (group × replicate) partial sums — no
  * replicated copy of the data ever materializes). */
object RobustQueries {

  /** Winsorized mean per event type: clamp values to the [p05, p95]
    * fences ESTIMATED FROM A DETERMINISTIC 10% HASH SAMPLE, then take
    * the exact clamped mean over the full data. Splitting estimation
    * from application is the at-scale shape: the per-group order
    * statistic (the only sort) runs on the bounded sample while the
    * full pass stays a scan + broadcast-join + clamp — at 100 TB the
    * sample fraction is the knob that keeps the sort partition
    * in-memory. Fence ranks are pure integer arithmetic on the sample
    * size; all means are exact integer micro-cents (sum·10⁶ div n —
    * cents sums stay ≤ ~10¹⁰ at any plausible group, so the scaled
    * product is far from BIGINT range). Clamp counts report how much
    * mass the fences actually moved. */
  val qWinsorize: Q = Q(
    "q_winsorize",
    (spark, dir) => {
      val base = Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
          col("event_id"))
      val samp = base.filter(Sampling.hashBasisPoints(col("event_id")) < 1000)
      val wg = Window.partitionBy(col("g"))
      val wr = Window.partitionBy(col("g"))
        .orderBy(col("cents"), col("event_id"))
      val cuts = samp
        .withColumn("rn", row_number().over(wr))
        .withColumn("n_s", count(lit(1)).over(wg))
        .groupBy(col("g"))
        .agg(
          max(col("n_s")).as("n_samp"),
          min(when(col("rn") === greatest(lit(1L), expr("(n_s * 5) div 100")),
            col("cents"))).as("lo_cents"),
          min(when(col("rn") === least(col("n_s"),
            expr("(n_s * 95) div 100 + 1")), col("cents"))).as("hi_cents"))
      base.join(broadcast(cuts), "g")
        .groupBy(col("g"), col("n_samp"), col("lo_cents"), col("hi_cents"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("sc"),
          sum(least(greatest(col("cents"), col("lo_cents")), col("hi_cents")))
            .as("swc"),
          sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L))
            .as("n_clamped_lo"),
          sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L))
            .as("n_clamped_hi"))
        .select(col("g").as("event_type"), col("n"), col("n_samp"),
          col("lo_cents"), col("hi_cents"),
          expr("sc * 1000000 div n").as("mean_micro"),
          expr("swc * 1000000 div n").as("wins_mean_micro"),
          col("n_clamped_lo"), col("n_clamped_hi"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH base AS (
        SELECT event_type AS g,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, event_id
        FROM events),
      samp AS (
        SELECT g, cents, event_id FROM base
        WHERE ${AnalyticsQueries.bpSql("event_id")} < 1000),
      rk AS (
        SELECT g, cents,
               row_number() OVER (PARTITION BY g
                 ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY g) AS n_s
        FROM samp),
      cuts AS (
        SELECT g, max(n_s) AS n_samp,
               min(CASE WHEN rn = greatest(1, (n_s * 5) // 100)
                   THEN cents END) AS lo_cents,
               min(CASE WHEN rn = least(n_s, (n_s * 95) // 100 + 1)
                   THEN cents END) AS hi_cents
        FROM rk GROUP BY g)
      SELECT g AS event_type, count(*) AS n, max(n_samp) AS n_samp,
             max(lo_cents) AS lo_cents, max(hi_cents) AS hi_cents,
             CAST(sum(cents) AS BIGINT) * 1000000 // count(*) AS mean_micro,
             CAST(sum(least(greatest(cents, lo_cents), hi_cents)) AS BIGINT)
               * 1000000 // count(*) AS wins_mean_micro,
             CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clamped_lo,
             CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clamped_hi
      FROM base JOIN cuts USING (g)
      GROUP BY g ORDER BY g
    """.trim))

  /** Poisson-bootstrap CI on the per-type mean: each of B=40
    * replicates resamples every row with multiplicity ~ Poisson(1),
    * the standard at-scale approximation of multinomial bootstrap
    * weights (and the only one that needs no global coordination —
    * each row draws its weight independently from
    * md5(event_id:replicate), so the resample is embarrassingly
    * parallel and exactly reproducible). The explode-by-B fan-out
    * collapses immediately into the (group × replicate) partial-sum
    * aggregate — map-side combine keeps the shuffle at
    * groups × B rows regardless of corpus size. Replicate means are
    * EXACT integer micro-cents, so the percentile CI (2nd / (B−1)th
    * order statistic ≈ 2.5 / 97.5%) is an integer selection and the
    * bootstrap SE derives from exact integer moment sums
    * (128-bit square accumulation; one double division + sqrt on
    * identical expression trees). */
  val qBootstrapCi: Q = {
    val B = 40
    Q(
      "q_bootstrap_ci",
      (spark, dir) => {
        val base = Tables.events(spark, dir)
          .select(col("event_type").as("g"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
            col("event_id"))
        val point = base.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
          .select(col("g"), col("n"),
            expr("sc * 1000000 div n").as("point_mean_micro"))
        // one md5 yields FOUR independent 32-bit draws (hex chunks of
        // the same digest are independent bits), so 40 replicates cost
        // 10 hashes per row, not 40 — and the fused native aggregate
        // ([[graft.functions.PoissonBootstrapAgg]]) folds all 40
        // multiplicities straight into a per-group buffer instead of
        // materializing 40 rows per event through the hash aggregate
        // (identical digests, thresholds, and BIGINT sums — the
        // oracle's exploded replay is unchanged)
        val reps = base
          .groupBy(col("g"))
          .agg(graft.functions.PoissonBootstrapAgg(
            col("event_id"), col("cents"), B).as("r"))
          .select(col("g"), explode(col("r")).as("e"))
          .filter(col("e.n_b") > 0)
          .select(col("g"), col("e.b").as("b"),
            expr("e.sc_b * 1000000 div e.n_b").as("mm"))
        val wr = Window.partitionBy(col("g")).orderBy(col("mm"), col("b"))
        val ci = reps
          .withColumn("rn", row_number().over(wr))
          .withColumn("b_eff", count(lit(1)).over(Window.partitionBy(col("g"))))
          .groupBy(col("g"))
          .agg(max(col("b_eff")).as("b_eff"),
            min(when(col("rn") === 2, col("mm"))).as("boot_lo_micro"),
            min(when(col("rn") === col("b_eff") - 1, col("mm")))
              .as("boot_hi_micro"),
            sum(col("mm")).as("sm"),
            sum(col("mm").cast("decimal(19,0)") * col("mm")).as("smm"))
        point.join(ci, "g")
          .select(col("g").as("event_type"), col("n"),
            col("point_mean_micro"), col("b_eff"),
            col("boot_lo_micro"), col("boot_hi_micro"),
            round(sqrt((col("b_eff") * col("smm").cast("double")
                - col("sm").cast("double") * col("sm"))
              / (col("b_eff") * (col("b_eff") - 1))), 6).as("boot_se_micro"))
          .orderBy(col("event_type"))
      },
      Some(s"""
      WITH base AS (
        SELECT event_type AS g,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, event_id
        FROM events),
      point AS (
        SELECT g, count(*) AS n,
               CAST(sum(cents) AS BIGINT) * 1000000 // count(*)
                 AS point_mean_micro
        FROM base GROUP BY g),
      fan AS (
        SELECT g, cents, event_id, unnest(generate_series(0, ${B / 4 - 1}))
          AS slot
        FROM base),
      hx0 AS (
        SELECT g, cents, slot, md5(concat(event_id, ':', slot)) AS hx
        FROM fan),
      ch AS (
        SELECT g, cents, slot, hx, unnest(generate_series(0, 3)) AS chunk
        FROM hx0),
      mult AS (
        SELECT g, cents, b,
               CASE WHEN bp < 3679 THEN 0 WHEN bp < 7358 THEN 1
                    WHEN bp < 9197 THEN 2 WHEN bp < 9810 THEN 3
                    WHEN bp < 9963 THEN 4 WHEN bp < 9994 THEN 5
                    ELSE 6 END AS m
        FROM (SELECT g, cents, slot * 4 + chunk AS b,
                     (${(0 until 8).map { k =>
                       s"(strpos('0123456789abcdef', substring(hx, chunk * 8 + ${k + 1}, 1)) - 1) * ${1L << (4 * (7 - k))}"
                     }.mkString(" + ")}) % 10000 AS bp
              FROM ch)),
      reps AS (
        SELECT g, b,
               CAST(sum(m * cents) AS BIGINT) * 1000000
                 // CAST(sum(m) AS BIGINT) AS mm
        FROM mult GROUP BY g, b
        HAVING CAST(sum(m) AS BIGINT) > 0),
      rk AS (
        SELECT g, b, mm,
               row_number() OVER (PARTITION BY g ORDER BY mm, b) AS rn,
               count(*) OVER (PARTITION BY g) AS b_eff
        FROM reps),
      ci AS (
        SELECT g, max(b_eff) AS b_eff,
               min(CASE WHEN rn = 2 THEN mm END) AS boot_lo_micro,
               min(CASE WHEN rn = b_eff - 1 THEN mm END) AS boot_hi_micro,
               CAST(sum(mm) AS BIGINT) AS sm,
               sum(CAST(mm AS HUGEINT) * mm) AS smm
        FROM rk GROUP BY g)
      SELECT g AS event_type, n, point_mean_micro, b_eff,
             boot_lo_micro, boot_hi_micro,
             round(sqrt((b_eff * CAST(smm AS DOUBLE)
                 - CAST(sm AS DOUBLE) * sm)
               / (b_eff * (b_eff - 1))), 6) AS boot_se_micro
      FROM point JOIN ci USING (g)
      ORDER BY event_type
    """.trim))
  }

  /** Mann-Whitney U rank-sum test per event type — the nonparametric
    * sibling of `q_abtest_stats`' Welch t: compares the two arms by
    * rank order, immune to the heavy tails that sink a mean-based
    * test. Ranks are computed on the VALUE HISTOGRAM, not the rows:
    * one aggregate collapses the corpus to (group × distinct cents)
    * cells, the cumulative window walks that bounded domain, and
    * tied values take the textbook average rank — kept exact by
    * working in doubled-rank units (2·avg-rank of a cell covering
    * ranks a..b is a+b, always an integer). The rank sum accumulates
    * in 128-bit (it is Θ(N²) in doubled units); U, the tie term
    * Σ(t³−t) and both arm counts are exact integers, and the normal
    * approximation's z lands from one shared double expression tree.
    * At 100 TB the only sort is over distinct cents per group — the
    * histogram, not the data. */
  val qMannWhitney: Q = Q(
    "q_mannwhitney",
    (spark, dir) => {
      val base = Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          (col("user_id") % 2 === 0).as("arm_a"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val hist = base.groupBy(col("g"), col("cents"))
        .agg(count(lit(1)).as("n_t"),
          sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a_v"))
      val wc = Window.partitionBy(col("g")).orderBy(col("cents"))
      hist
        .withColumn("cum", sum(col("n_t")).over(wc))
        // ranks occupied by this value: (cum-n_t+1)..cum; doubled
        // average rank = 2·cum − n_t + 1 (exact integer)
        .withColumn("r2", lit(2) * col("cum") - col("n_t") + 1)
        .groupBy(col("g"))
        .agg(
          sum(col("n_a_v")).as("n_a"),
          sum(col("n_t") - col("n_a_v")).as("n_b"),
          sum(col("n_a_v").cast("decimal(19,0)") * col("r2")).as("r2_a"),
          sum(col("n_t") * col("n_t") * col("n_t") - col("n_t")).as("ties"))
        .select(col("g"), col("n_a"), col("n_b"), col("ties"),
          (col("r2_a") - col("n_a").cast("decimal(19,0)")
            * (col("n_a") + 1)).cast("long").as("u2_a"))
        .select(col("g").as("event_type"), col("n_a"), col("n_b"),
          col("u2_a"), col("ties"),
          round((col("u2_a").cast("double")
              - col("n_a").cast("double") * col("n_b"))
            / (lit(2.0) * sqrt(col("n_a").cast("double") * col("n_b") / 12.0
              * ((col("n_a").cast("double") + col("n_b") + 1)
                - col("ties").cast("double")
                  / ((col("n_a").cast("double") + col("n_b"))
                    * (col("n_a").cast("double") + col("n_b") - 1))))), 6)
            .as("z"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_type AS g, user_id % 2 = 0 AS arm_a,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      hist AS (
        SELECT g, cents, count(*) AS n_t,
               CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a_v
        FROM base GROUP BY g, cents),
      rk AS (
        SELECT g, n_t, n_a_v,
               2 * sum(n_t) OVER (PARTITION BY g ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_t + 1 AS r2
        FROM hist),
      agg AS (
        SELECT g,
               CAST(sum(n_a_v) AS BIGINT) AS n_a,
               CAST(sum(n_t - n_a_v) AS BIGINT) AS n_b,
               sum(CAST(n_a_v AS HUGEINT) * r2) AS r2_a,
               CAST(sum(n_t * n_t * n_t - n_t) AS BIGINT) AS ties
        FROM rk GROUP BY g),
      u AS (
        SELECT g, n_a, n_b, ties,
               CAST(r2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a
        FROM agg)
      SELECT g AS event_type, n_a, n_b, u2_a, ties,
             round((CAST(u2_a AS DOUBLE)
                 - CAST(n_a AS DOUBLE) * n_b)
               / (2.0 * sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                 * ((CAST(n_a AS DOUBLE) + n_b + 1)
                   - CAST(ties AS DOUBLE)
                     / ((CAST(n_a AS DOUBLE) + n_b)
                       * (CAST(n_a AS DOUBLE) + n_b - 1))))), 6) AS z
      FROM u ORDER BY event_type
    """.trim))

  /** Population Stability Index per event type — the production drift
    * metric for NUMERIC feature distributions (the categorical-share
    * sibling is `q_mix_drift`): bin the current half of the corpus by
    * the reference half's deciles and sum (p_cur − p_ref)·ln(p_cur/
    * p_ref) over the 10 bins. PSI > 0.2 is the industry retrain
    * alert. Everything runs on the VALUE HISTOGRAM: decile edges are
    * exact rank selections over the per-group cumulative (bounded by
    * distinct cents, like `q_mannwhitney`), bin assignment is a
    * 9-row broadcast join against the edge table, and the corpus
    * itself is touched by exactly one aggregate. Bin probabilities
    * are add-one-smoothed exact rationals (no empty-bin ln(0)); each
    * PSI term is individually non-negative and floored to nanos, so
    * the per-group total is an order-independent integer sum. The
    * split day derives from the observed span (integer epoch-day
    * midpoint), not a wall-clock constant. */
  val qPsiDrift: Q = Q(
    "q_psi_drift",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("ed"))
      val mid = ev.agg(
        ((min(col("ed")) + (max(col("ed")) - min(col("ed")) + 1)
          .cast("long") / 2).cast("long")).as("split_ed"))
      val halves = ev.crossJoin(broadcast(mid))
        .select(col("g"), col("cents"), (col("ed") < col("split_ed")).as("ref"))
      val hist = halves.groupBy(col("g"), col("cents"), col("ref"))
        .agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val refHist = hist.filter(col("ref"))
      val wcum = Window.partitionBy(col("g")).orderBy(col("cents"))
      val refCum = refHist
        .withColumn("cum", sum(col("n")).over(wcum))
        .withColumn("n_ref", sum(col("n")).over(Window.partitionBy(col("g"))))
      // decile edges: smallest cents whose cumulative reaches k·n/10
      val edges = refCum
        .select(col("g"), col("cents"), col("cum"), col("n_ref"),
          explode(sequence(lit(1), lit(9))).as("k"))
        .filter(col("cum") >= expr("n_ref * k div 10"))
        .groupBy(col("g"), col("k"))
        .agg(min(col("cents")).as("edge"))
      // bin = number of edges strictly below the value (0..9)
      val binned = hist.join(broadcast(edges), Seq("g"))
        .groupBy(col("g"), col("cents"), col("ref"), col("n"))
        .agg(sum(when(col("cents") > col("edge"), 1L).otherwise(0L)).as("bin"))
        .groupBy(col("g"), col("bin"))
        .agg(sum(when(col("ref"), col("n")).otherwise(0L)).as("nr"),
          sum(when(!col("ref"), col("n")).otherwise(0L)).as("nc"))
      val totals = binned.groupBy(col("g"))
        .agg(sum(col("nr")).as("n_ref"), sum(col("nc")).as("n_cur"))
      // dense 10-bin grid so absent bins still contribute smoothed mass
      val grid = totals
        .select(col("g"), col("n_ref"), col("n_cur"),
          explode(sequence(lit(0), lit(9))).as("bin"))
        .join(binned, Seq("g", "bin"), "left")
        .select(col("g"), col("n_ref"), col("n_cur"), col("bin"),
          coalesce(col("nr"), lit(0L)).as("nr"),
          coalesce(col("nc"), lit(0L)).as("nc"))
      grid
        .select(col("g"), col("n_ref"), col("n_cur"),
          floor(((col("nc") + 1).cast("double") / (col("n_cur") + 10)
              - (col("nr") + 1).cast("double") / (col("n_ref") + 10))
            * log(((col("nc") + 1).cast("double") / (col("n_cur") + 10))
              / ((col("nr") + 1).cast("double") / (col("n_ref") + 10)))
            * lit(1e9)).cast("long").as("term_nanos"))
        .groupBy(col("g"), col("n_ref"), col("n_cur"))
        .agg(sum(col("term_nanos")).as("psi_nanos"))
        .select(col("g").as("event_type"), col("n_ref"), col("n_cur"),
          col("psi_nanos"),
          (col("psi_nanos") >= 200000000L).as("alert"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_type AS g,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
        FROM events),
      mid AS (
        SELECT CAST(min(ed) + (max(ed) - min(ed) + 1) // 2 AS BIGINT)
          AS split_ed FROM ev),
      halves AS (
        SELECT g, cents, ed < split_ed AS ref FROM ev, mid),
      hist AS (
        SELECT g, cents, ref, count(*) AS n
        FROM halves GROUP BY g, cents, ref),
      refcum AS (
        SELECT g, cents,
               sum(n) OVER (PARTITION BY g ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(n) OVER (PARTITION BY g) AS n_ref
        FROM hist WHERE ref),
      edges AS (
        SELECT g, k, min(cents) AS edge FROM (
          SELECT r.g, r.cents, r.cum, r.n_ref, ks.k
          FROM refcum r, (SELECT unnest(generate_series(1, 9)) AS k) ks)
        WHERE cum >= n_ref * k // 10
        GROUP BY g, k),
      assigned AS (
        SELECT h.g, h.cents, h.ref, h.n,
               CAST(sum(CASE WHEN h.cents > e.edge THEN 1 ELSE 0 END)
                 AS BIGINT) AS bin
        FROM hist h JOIN edges e USING (g)
        GROUP BY h.g, h.cents, h.ref, h.n),
      bins AS (
        SELECT g, bin,
               CAST(sum(CASE WHEN ref THEN n ELSE 0 END) AS BIGINT) AS nr,
               CAST(sum(CASE WHEN NOT ref THEN n ELSE 0 END) AS BIGINT) AS nc
        FROM assigned GROUP BY g, bin),
      totals AS (
        SELECT g, CAST(sum(nr) AS BIGINT) AS n_ref,
               CAST(sum(nc) AS BIGINT) AS n_cur
        FROM bins GROUP BY g),
      cells AS (
        SELECT t.g, t.n_ref, t.n_cur, gs.bin
        FROM totals t, (SELECT unnest(generate_series(0, 9)) AS bin) gs),
      grid AS (
        SELECT x.g, x.n_ref, x.n_cur, x.bin,
               coalesce(b.nr, 0) AS nr, coalesce(b.nc, 0) AS nc
        FROM cells x LEFT JOIN bins b ON b.g = x.g AND b.bin = x.bin),
      terms AS (
        SELECT g, n_ref, n_cur,
               CAST(floor((CAST(nc + 1 AS DOUBLE) / (n_cur + 10)
                   - CAST(nr + 1 AS DOUBLE) / (n_ref + 10))
                 * ln((CAST(nc + 1 AS DOUBLE) / (n_cur + 10))
                   / (CAST(nr + 1 AS DOUBLE) / (n_ref + 10)))
                 * 1e9) AS BIGINT) AS term_nanos
        FROM grid)
      SELECT g AS event_type, n_ref, n_cur,
             CAST(sum(term_nanos) AS BIGINT) AS psi_nanos,
             CAST(sum(term_nanos) AS BIGINT) >= 200000000 AS alert
      FROM terms GROUP BY g, n_ref, n_cur
      ORDER BY event_type
    """.trim))

  /** Two-sample Kolmogorov-Smirnov per event type — completes the
    * distribution-comparison trifecta (rank shift: `q_mannwhitney`;
    * binned divergence: `q_psi_drift`; KS: the maximum CDF gap, the
    * test that catches SHAPE changes a location test misses). The D
    * statistic is EXACT: on the shared value histogram, D·n_a·n_b =
    * max |cumA·n_b − cumB·n_a| is pure integer arithmetic — no
    * empirical-CDF doubles anywhere — and the reported d_micro is one
    * integer division. The α=0.05 rejection compares the same
    * integers against c(α)²·n_a·n_b·(n_a+n_b) in doubles derived from
    * them (identical trees both engines). The only sort is the
    * per-group distinct-cents histogram, as in `q_mannwhitney`;
    * at extreme row counts the n_a·n_b products move to 128-bit, a
    * documented widening, not a redesign. */
  val qKsTest: Q = Q(
    "q_ks_test",
    (spark, dir) => {
      val base = Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          (col("user_id") % 2 === 0).as("arm_a"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val hist = base.groupBy(col("g"), col("cents"))
        .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("na_v"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("nb_v"))
      val wc = Window.partitionBy(col("g")).orderBy(col("cents"))
      val wg = Window.partitionBy(col("g"))
      hist
        .withColumn("cum_a", sum(col("na_v")).over(wc))
        .withColumn("cum_b", sum(col("nb_v")).over(wc))
        .withColumn("n_a", sum(col("na_v")).over(wg))
        .withColumn("n_b", sum(col("nb_v")).over(wg))
        .groupBy(col("g"), col("n_a"), col("n_b"))
        .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("d_num"))
        .select(col("g").as("event_type"), col("n_a"), col("n_b"),
          col("d_num"),
          expr("d_num * 1000000 div (n_a * n_b)").as("d_micro"),
          // D > c(0.05)·sqrt((n_a+n_b)/(n_a·n_b)), squared to stay in
          // one double comparison: d_num² > 1.358²·n_a·n_b·(n_a+n_b)
          (col("d_num").cast("double") * col("d_num")
            > lit(1.844164) * col("n_a").cast("double") * col("n_b")
              * (col("n_a") + col("n_b"))).as("reject_05"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_type AS g, user_id % 2 = 0 AS arm_a,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
      hist AS (
        SELECT g, cents,
               CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
               CAST(sum(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS BIGINT)
                 AS nb_v
        FROM base GROUP BY g, cents),
      cum AS (
        SELECT g,
               sum(na_v) OVER w AS cum_a, sum(nb_v) OVER w AS cum_b,
               sum(na_v) OVER (PARTITION BY g) AS n_a,
               sum(nb_v) OVER (PARTITION BY g) AS n_b
        FROM hist
        WINDOW w AS (PARTITION BY g ORDER BY cents
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      agg AS (
        SELECT g, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
        FROM cum GROUP BY g, n_a, n_b)
      SELECT g AS event_type, n_a, n_b, d_num,
             d_num * 1000000 // (n_a * n_b) AS d_micro,
             CAST(d_num AS DOUBLE) * d_num
               > 1.844164 * CAST(n_a AS DOUBLE) * n_b * (n_a + n_b)
               AS reject_05
      FROM agg ORDER BY event_type
    """.trim))

  /** Quantile normalization — map every source's length distribution
    * onto the POOLED distribution (the batch-effect correction that
    * makes per-source features comparable before mixing corpora): a
    * doc at within-source fraction q takes the pooled value at q,
    * i.e. min{v : F_pool(v) ≥ q}. Runs entirely on histograms — the
    * per-source cells carry truncated-ppm cumulative fractions, the
    * pooled histogram (bounded by the distinct-length domain) is
    * deduplicated per fraction, and the mapping IS the engine's
    * forward as-of join ([[graft.operators.AsofJoin]]) on the
    * fraction axis: one interleaved window instead of a
    * cells × pooled range join. A match always exists because both
    * sides top out at exactly 1000000 ppm. Means before/after are
    * exact integer micros; after normalization every source's mean
    * converges toward the pooled mean — the point of the transform. */
  val qQuantileNorm: Q = Q(
    "q_quantile_norm",
    (spark, dir) => {
      val cells = Tables.documents(spark, dir)
        .groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wS = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      val src = cells
        .withColumn("cum", sum(col("n")).over(wS))
        .withColumn("n_s", sum(col("n")).over(Window.partitionBy(col("source"))))
        .select(col("source"), col("n_chars"), col("n"),
          expr("cum * 1000000 div n_s").as("frac"))
      val pooledB = cells.groupBy(col("n_chars")).agg(sum(col("n")).as("np"))
      val tot = pooledB.agg(sum(col("np")).as("nn"))
      val wP = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pooled = pooledB
        .withColumn("cump", sum(col("np")).over(wP))
        .crossJoin(broadcast(tot))
        .select(col("n_chars").as("q_chars"),
          expr("cump * 1000000 div nn").as("fracp"))
        .groupBy(col("fracp")).agg(min(col("q_chars")).as("q_chars"))
      val pooledK = cells.select(col("source")).distinct().crossJoin(pooled)
      graft.operators.AsofJoin
        .asofJoinForward(src, pooledK, "source", "source", "frac", "fracp",
          Seq("q_chars"))
        .select(col("source"), col("n_chars"), col("n"),
          col("_asof").getField("q_chars").as("mapped"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_docs"),
          sum(col("n") * col("n_chars")).as("sum_before"),
          sum(col("n") * col("mapped")).as("sum_after"),
          max(abs(col("mapped") - col("n_chars"))).as("max_shift"))
        .select(col("source"), col("n_docs"),
          expr("sum_before * 1000000 div n_docs").as("mean_before_micro"),
          expr("sum_after * 1000000 div n_docs").as("mean_after_micro"),
          col("max_shift"))
        .orderBy(col("source"))
    },
    Some("""
      WITH cells AS (
        SELECT source, n_chars, count(*) AS n
        FROM documents GROUP BY 1, 2),
      src AS (
        SELECT source, n_chars, n,
               CAST((sum(n) OVER (PARTITION BY source ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 * 1000000
                 // (sum(n) OVER (PARTITION BY source)) AS BIGINT) AS frac
        FROM cells),
      pooledb AS (
        SELECT n_chars, CAST(sum(n) AS BIGINT) AS np
        FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(np) AS BIGINT) AS nn FROM pooledb),
      pooled0 AS (
        SELECT n_chars AS q_chars,
               CAST((sum(np) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 * 1000000 // (SELECT nn FROM tot) AS BIGINT) AS fracp
        FROM pooledb),
      pooled AS (
        SELECT fracp, min(q_chars) AS q_chars FROM pooled0 GROUP BY fracp),
      pooledk AS (
        SELECT s.source, p.fracp, p.q_chars
        FROM (SELECT DISTINCT source FROM cells) s, pooled p),
      mapped AS (
        SELECT l.source, l.n_chars, l.n, r.q_chars AS mapped
        FROM src l ASOF JOIN pooledk r
          ON l.source = r.source AND l.frac <= r.fracp)
      SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(sum(n * n_chars) AS BIGINT) * 1000000 // CAST(sum(n) AS BIGINT)
               AS mean_before_micro,
             CAST(sum(n * mapped) AS BIGINT) * 1000000 // CAST(sum(n) AS BIGINT)
               AS mean_after_micro,
             CAST(max(abs(mapped - n_chars)) AS BIGINT) AS max_shift
      FROM mapped GROUP BY source ORDER BY source
    """.trim))

  /** Wilson score intervals on per-source gate pass rates — the
    * correct small-k confidence band for a proportion (the normal
    * interval collapses or escapes [0,1] exactly where curation
    * dashboards need it most: sources with a handful of passes). The
    * gate here is a fixed length threshold; n and k are exact
    * integers, p̂ an exact div, and both Wilson bounds come off one
    * shared double expression tree (z = 1.96 written as the same
    * literal in both engines), floored to milli so rows are
    * engine-exact. One aggregate over the corpus — the cheapest query
    * shape there is. */
  val qGateWilson: Q = Q(
    "q_gate_wilson",
    (spark, dir) => {
      val z2 = "3.8416" // 1.96²; SAME literal text both engines
      Tables.documents(spark, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars") >= 400, 1L).otherwise(0L)).as("k"))
        .select(col("source"), col("n"), col("k"),
          expr("k * 1000 div n").as("p_milli"),
          floor((expr(s"(k + $z2 / 2) / (n + $z2)")
            - expr(s"sqrt($z2) * sqrt(k * (n - k) / cast(n as double) + $z2 / 4) / (n + $z2)"))
            * lit(1000)).cast("long").as("wilson_lo_milli"),
          floor((expr(s"(k + $z2 / 2) / (n + $z2)")
            + expr(s"sqrt($z2) * sqrt(k * (n - k) / cast(n as double) + $z2 / 4) / (n + $z2)"))
            * lit(1000)).cast("long").as("wilson_hi_milli"))
        .orderBy(col("source"))
    },
    Some("""
      WITH g AS (
        SELECT source, count(*) AS n,
               CAST(sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END)
                 AS BIGINT) AS k
        FROM documents GROUP BY source)
      SELECT source, n, k,
             k * 1000 // n AS p_milli,
             CAST(floor(((k + 3.8416 / 2) / (n + 3.8416)
               - sqrt(3.8416) * sqrt(k * (n - k) / CAST(n AS DOUBLE)
                   + 3.8416 / 4) / (n + 3.8416)) * 1000) AS BIGINT)
               AS wilson_lo_milli,
             CAST(floor(((k + 3.8416 / 2) / (n + 3.8416)
               + sqrt(3.8416) * sqrt(k * (n - k) / CAST(n AS DOUBLE)
                   + 3.8416 / 4) / (n + 3.8416)) * 1000) AS BIGINT)
               AS wilson_hi_milli
      FROM g ORDER BY source
    """.trim))

  /** Sample-ratio mismatch check — the experiment-health gate that
    * runs BEFORE any A/B readout is trusted: under a 50/50 split the
    * arm counts follow a known binomial, and χ² against that
    * expectation reduces algebraically to (n_a − n_b)²/n, so the
    * whole test — statistic and α=0.05 rejection against 3.841 —
    * is PURE INTEGER arithmetic ((n_a−n_b)²·1000 vs 3841·n): no
    * doubles anywhere, not even derived ones. Per event type plus
    * the pooled `_ALL_` row; one aggregate over the corpus. An SRM
    * alert here invalidates `q_abtest_stats`/`q_mannwhitney`/
    * `q_ks_test` downstream — which is exactly why it ships beside
    * them. */
  val qAbtestSrm: Q = Q(
    "q_abtest_srm",
    (spark, dir) => {
      val per = Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          (col("user_id") % 2 === 0).as("arm_a"))
        .groupBy(col("g"))
        .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"))
      val withAll = per.unionAll(per
        .agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"))
        .select(lit("_ALL_").as("g"), col("n_a"), col("n_b")))
      withAll
        .select(col("g").as("event_type"), col("n_a"), col("n_b"),
          expr("(n_a - n_b) * (n_a - n_b) * 1000 div (n_a + n_b)")
            .as("chi2_milli"),
          ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) * 1000
            > lit(3841L) * (col("n_a") + col("n_b"))).as("srm_alert"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH per AS (
        SELECT event_type AS g,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b
        FROM events GROUP BY event_type),
      w AS (
        SELECT g, n_a, n_b FROM per
        UNION ALL
        SELECT '_ALL_', CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT)
        FROM per)
      SELECT g AS event_type, n_a, n_b,
             (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) AS chi2_milli,
             (n_a - n_b) * (n_a - n_b) * 1000 > 3841 * (n_a + n_b)
               AS srm_alert
      FROM w ORDER BY event_type
    """.trim))

  def all: Seq[Q] = Seq(qWinsorize, qBootstrapCi, qMannWhitney, qPsiDrift,
    qKsTest, qQuantileNorm, qGateWilson, qAbtestSrm)
}
