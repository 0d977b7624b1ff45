package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{RangeJoin, Sampling, Sketches, TextAnalysis}

/** Training-run planning queries — the operations that turn corpus
  * statistics into an executable data plan: split assignment, token
  * budget allocation across sources, per-source quality-threshold
  * calibration, and interval (range) joins banded into equi-joins.
  * All arithmetic is integer-exact or rounded at a single final step
  * so the DuckDB oracles replay it bit-for-bit. */
object PlanningQueries {

  /** Deterministic train/val/test assignment (98/1/1 by key hash,
    * [[Sampling.splitLabel]]) rolled up to per source × split doc and
    * token counts — the split manifest a training job validates before
    * reading anything. The label is a pure scalar of doc_id: no
    * shuffle except the final tiny rollup, stable under corpus growth
    * and across engines/tables. */
  val qSplitAssign: Q = Q(
    "q_split_assign",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("source"),
        Sampling.splitLabel(col("doc_id"),
          Seq("train" -> 9800, "val" -> 9900, "test" -> 10000)).as("split"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .orderBy(col("source"), col("split")),
    Some(s"""
      SELECT source, split, count(*) AS n_docs,
             CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_tokens
      FROM (
        SELECT source, text,
               CASE WHEN ${AnalyticsQueries.bpSql("doc_id")} < 9800 THEN 'train'
                    WHEN ${AnalyticsQueries.bpSql("doc_id")} < 9900 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
      GROUP BY source, split
      ORDER BY source, split
    """.trim))

  /** Token-budget mixture plan: given per-source target weights and a
    * total token budget, compute each source's planned token draw
    * (capped by what the source actually has) and the sampling rate
    * that achieves it. Weights here derive arithmetically from the
    * source id (stand-in for a configured mixture table); allocation
    * is integer floor-division so both engines agree exactly, and the
    * rate is one final rounded division. Two aggregates over a
    * 20-row-out table — the plan costs nothing next to the corpus
    * scan that feeds it. */
  val qMixturePlan: Q = {
    val budget = 50000L
    Q(
      "q_mixture_plan",
      (spark, dir) => {
        val mass = Tables.documents(spark, dir)
          .select(col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
          .groupBy(col("source"))
          .agg(sum(col("nt")).as("n_tokens"))
          .withColumn("weight",
            (substring(col("source"), 4, 10).cast("long") % 4 + 1))
        val totalW = mass.agg(sum(col("weight")).as("total_w"))
        mass.crossJoin(broadcast(totalW))
          .select(col("source"), col("n_tokens"), col("weight"),
            least(col("n_tokens"),
              (lit(budget) * col("weight")).divide(col("total_w"))
                .cast("long")).as("planned_tokens"))
          .withColumn("sample_rate",
            round(col("planned_tokens").cast("double") /
              col("n_tokens").cast("double"), 6))
          .orderBy(col("source"))
      },
      Some(s"""
      WITH mass AS (
        SELECT source,
               CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_tokens,
               CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS weight
        FROM documents GROUP BY source),
      tw AS (SELECT CAST(sum(weight) AS BIGINT) AS total_w FROM mass)
      SELECT source, n_tokens, weight,
             CAST(least(n_tokens, ($budget * weight) // total_w) AS BIGINT)
               AS planned_tokens,
             round(CAST(least(n_tokens, ($budget * weight) // total_w) AS DOUBLE)
                   / n_tokens, 6) AS sample_rate
      FROM mass, tw
      ORDER BY source
    """.trim))
  }

  /** Per-source quality-filter calibration: exact interpolated
    * quartiles of the document quality score, the keep-threshold that
    * retains the top quarter (p75), and how many docs clear it. The
    * quality score is rounded to 6dp BEFORE the percentile pass so
    * both engines interpolate over identical values; `percentile` /
    * `quantile_cont` share the (n-1)·p linear-interpolation formula.
    * One shuffle on source for the percentile sort, then a broadcast
    * of the 20-row threshold table back over the docs. */
  val qQualityCalibration: Q = Q(
    "q_quality_calibration",
    (spark, dir) => {
      val scored = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      val cal = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(quality, 0.25)").as("q25"),
          expr("percentile(quality, 0.5)").as("q50"),
          expr("percentile(quality, 0.75)").as("q75"))
        .select(col("source"), col("n_docs"),
          round(col("q25"), 6).as("q25"), round(col("q50"), 6).as("q50"),
          round(col("q75"), 6).as("q75"))
      scored.join(broadcast(cal), "source")
        .filter(col("quality") >= col("q75"))
        .groupBy(col("source"))
        .agg(first(col("n_docs")).as("n_docs"), first(col("q25")).as("q25"),
          first(col("q50")).as("q50"), first(col("q75")).as("q75"),
          count(lit(1)).as("n_keep"))
        .orderBy(col("source"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, source,
               round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 +
                     (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3 +
                     (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4, 6) AS quality
        FROM (
          SELECT doc_id, source,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
                 len(list_distinct(toks)) AS n_unique
          FROM (SELECT doc_id, source,
                       string_split_regex(text, '\s+') AS toks
                FROM documents))),
      cal AS (
        SELECT source, count(*) AS n_docs,
               round(quantile_cont(quality, 0.25), 6) AS q25,
               round(quantile_cont(quality, 0.5), 6) AS q50,
               round(quantile_cont(quality, 0.75), 6) AS q75
        FROM scored GROUP BY source)
      SELECT source, n_docs, q25, q50, q75,
             (SELECT count(*) FROM scored s
              WHERE s.source = cal.source AND s.quality >= cal.q75) AS n_keep
      FROM cal
      ORDER BY source
    """.trim))

  /** Interval join banded into an equi-join ([[RangeJoin.bandedJoin]]):
    * events priced into six variable-width value bands. The naive form
    * is a non-equi theta join (nested-loop at best); banding explodes
    * each interval into width-25 units, broadcasts the ~30-row banded
    * dim, and joins on the unit id the fact side computes in-row — the
    * fact table never shuffles, and the exact lo <= v < hi predicate
    * re-applies post-join. The oracle is the plain range join: banding
    * must be result-invisible. */
  val qRangeJoinBanded: Q = Q(
    "q_range_join_banded",
    (spark, dir) => {
      val bands = spark.createDataFrame(Seq(
        ("b0", 0.0, 25.0), ("b1", 25.0, 60.0), ("b2", 60.0, 120.0),
        ("b3", 120.0, 200.0), ("b4", 200.0, 350.0), ("b5", 350.0, 500.0)))
        .toDF("band_id", "lo", "hi")
      RangeJoin.bandedJoin(Tables.events(spark, dir), col("value"),
          bands, col("lo"), col("hi"), unit = 25.0)
        .groupBy(col("band_id"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
        .orderBy(col("band_id"))
    },
    Some("""
      WITH bands(band_id, lo, hi) AS (
        SELECT band_id, CAST(lo AS DOUBLE), CAST(hi AS DOUBLE) FROM (VALUES
          ('b0', 0.0, 25.0), ('b1', 25.0, 60.0), ('b2', 60.0, 120.0),
          ('b3', 120.0, 200.0), ('b4', 200.0, 350.0), ('b5', 350.0, 500.0))
          v(band_id, lo, hi))
      SELECT band_id, lo, hi, count(*) AS n_events,
             CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
      FROM bands b JOIN events e ON b.lo <= e.value AND e.value < b.hi
      GROUP BY band_id, lo, hi
      ORDER BY band_id
    """.trim))

  /** Token-balanced output sharding: within each source, stripe
    * documents across 8 shards in descending token order with
    * SERPENTINE direction (stripe 0 fills shards 0→7, stripe 1 fills
    * 7→0, …), then report each shard's doc count, token mass, and load
    * ratio vs the ideal 1/8 share. Plain round-robin hands shard 0 the
    * largest doc of EVERY stripe — a systematic skew; alternating the
    * direction pairs each stripe's big end with the next stripe's small
    * end, so consecutive stripes cancel. Hash sharding balances only in
    * expectation; this is the plan a writer uses to emit same-sized
    * training shards. The ranking window partitions by source (not a
    * global sort), so the stage parallelizes across sources and the
    * only small aggregate is the 8-row rollup. */
  val qShardPlan: Q = {
    val numShards = 8
    Q(
      "q_shard_plan",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sized = Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        val rk = (row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("nt").desc, col("doc_id"))) - 1).cast("long")
        val striped = sized
          .withColumn("stripe", floor(rk / numShards).cast("long"))
          .withColumn("pos", rk % numShards)
          .withColumn("shard",
            when(col("stripe") % 2 === 0, col("pos"))
              .otherwise(lit(numShards - 1) - col("pos")))
        val perShard = striped.groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        val total = perShard.agg(sum(col("n_tokens")).as("total_nt"))
        perShard.crossJoin(broadcast(total))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens").cast("double") * numShards /
              col("total_nt"), 6).as("load_ratio"))
          .orderBy(col("shard"))
      },
      Some(s"""
      WITH sized AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt
        FROM documents),
      ranked AS (
        SELECT nt, row_number() OVER (PARTITION BY source
                     ORDER BY nt DESC, doc_id) - 1 AS rk
        FROM sized),
      striped AS (
        SELECT nt, CASE WHEN (rk // $numShards) % 2 = 0
                        THEN rk % $numShards
                        ELSE ${numShards - 1} - rk % $numShards END AS shard
        FROM ranked),
      per AS (
        SELECT shard, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        FROM striped GROUP BY shard),
      t AS (SELECT sum(n_tokens) AS total_nt FROM per)
      SELECT shard, n_docs, n_tokens,
             round(CAST(n_tokens AS DOUBLE) * $numShards / total_nt, 6) AS load_ratio
      FROM per, t ORDER BY shard
    """.trim))
  }

  /** Curriculum plan: global quality quartiles cut the corpus into four
    * phases (0 = lowest quality, fed first; 3 = highest, fed last), and
    * the output is the phase × source token-mass table a curriculum
    * run schedules from. The quality score is 6dp-rounded by the
    * helper itself and the cuts are rounded too, so phase assignment
    * compares identical doubles in both engines; the mean quality per
    * cell goes through [[graft.operators.Exact.microMean]] so no
    * float-sum order can drift. One percentile aggregate, a broadcast
    * of the 1-row cut table, and a hash rollup — scan-shaped at any
    * corpus size. */
  val qCurriculum: Q = Q(
    "q_curriculum",
    (spark, dir) => {
      val scored = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      val cuts = scored.agg(
        round(expr("percentile(q, 0.25)"), 6).as("c1"),
        round(expr("percentile(q, 0.5)"), 6).as("c2"),
        round(expr("percentile(q, 0.75)"), 6).as("c3"))
      scored.crossJoin(broadcast(cuts))
        .withColumn("phase",
          when(col("q") <= col("c1"), 0)
            .when(col("q") <= col("c2"), 1)
            .when(col("q") <= col("c3"), 2)
            .otherwise(3))
        .groupBy(col("phase"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          graft.operators.Exact.microMean(col("q"), count(lit(1)))
            .as("avg_quality"))
        .orderBy(col("phase"), col("source"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, source,
               round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 +
                     (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3 +
                     (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4, 6) AS q,
               CAST(n_tokens AS BIGINT) AS nt
        FROM (
          SELECT doc_id, source,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
                 len(list_distinct(toks)) AS n_unique
          FROM (SELECT doc_id, source,
                       string_split_regex(text, '\s+') AS toks
                FROM documents))),
      cuts AS (
        SELECT round(quantile_cont(q, 0.25), 6) AS c1,
               round(quantile_cont(q, 0.5), 6) AS c2,
               round(quantile_cont(q, 0.75), 6) AS c3
        FROM scored)
      SELECT CASE WHEN q <= c1 THEN 0 WHEN q <= c2 THEN 1
                  WHEN q <= c3 THEN 2 ELSE 3 END AS phase,
             source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
             round(CAST(sum(CAST(floor(q * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                   / count(*) / 1000000, 6) AS avg_quality
      FROM scored, cuts
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** Data-constrained epoch plan: when the desired token allocation
    * exceeds a source's unique supply, how many epochs (repeats) does
    * each source run, capped at 4 — the public data-constrained-
    * scaling result that value decays fast past ~4 epochs. Budget is
    * 8× the corpus (forcing some sources over the cap), desired
    * allocation follows the mixture weights, and the readout is
    * (epochs, effective tokens, utilization) per source — exactly the
    * table that says where the next crawl should spend. Integer
    * arithmetic throughout; the two corpus totals are one-row
    * broadcasts. */
  val qEpochPlan: Q = Q(
    "q_epoch_plan",
    (spark, dir) => {
      val mass = Tables.documents(spark, dir)
        .select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        .groupBy(col("source"))
        .agg(sum(col("nt")).as("n_tokens"))
        .withColumn("weight",
          (substring(col("source"), 4, 10).cast("long") % 4 + 1))
      val totals = broadcast(mass.agg(
        sum(col("weight")).as("total_w"),
        sum(col("n_tokens")).as("total_nt")))
      mass.crossJoin(totals)
        .select(col("source"), col("n_tokens"), col("weight"),
          expr("8L * total_nt * weight DIV total_w").as("desired_tokens"))
        .select(col("source"), col("n_tokens"), col("weight"),
          col("desired_tokens"),
          least(expr("(desired_tokens + n_tokens - 1) DIV n_tokens"), lit(4L))
            .as("epochs"),
          least(col("desired_tokens"), col("n_tokens") * 4)
            .as("effective_tokens"))
        .withColumn("utilization_micros",
          expr("effective_tokens * 1000000L DIV desired_tokens"))
        .orderBy(col("source"))
    },
    Some("""
      WITH mass AS (
        SELECT source,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
               CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS weight
        FROM documents GROUP BY source),
      t AS (SELECT CAST(sum(weight) AS BIGINT) AS total_w,
                   CAST(sum(n_tokens) AS BIGINT) AS total_nt FROM mass),
      d AS (
        SELECT source, n_tokens, weight,
               CAST(8 * total_nt * weight // total_w AS BIGINT) AS desired_tokens
        FROM mass, t)
      SELECT source, n_tokens, weight, desired_tokens,
             CAST(least((desired_tokens + n_tokens - 1) // n_tokens, 4)
                  AS BIGINT) AS epochs,
             CAST(least(desired_tokens, n_tokens * 4) AS BIGINT)
               AS effective_tokens,
             CAST(least(desired_tokens, n_tokens * 4) * 1000000
                  // desired_tokens AS BIGINT) AS utilization_micros
      FROM d ORDER BY source
    """.trim))

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * training schedule p_i ∝ n_i^α that upsamples small sources as the
    * temperature α drops below 1. Alphas are restricted to quarter
    * powers {0.25, 0.5, 0.75, 1} COMPUTED AS SQRT COMPOSITIONS
    * (sqrt is correctly rounded by IEEE 754, generic pow is not), so
    * the per-source scalar is bit-identical across engines; each mass
    * is floored to integer micro-units before the per-alpha sum, making
    * the normalization one exact integer division. Scale: the corpus
    * reduces to one source-sized aggregate; everything after is
    * broadcast-sized. */
  val qMixtureTemperature: Q = Q(
    "q_mixture_temperature",
    (spark, dir) => {
      val mass = Tables.documents(spark, dir)
        .select(col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        .groupBy(col("source"))
        .agg(sum(col("nt")).as("n_tokens"))
      val n = col("n_tokens").cast("double")
      val byAlpha = mass
        .select(col("source"), col("n_tokens"),
          explode(array(lit(25L), lit(50L), lit(75L), lit(100L))).as("alpha_pct"))
        .withColumn("m",
          when(col("alpha_pct") === 25, sqrt(sqrt(n)))
            .when(col("alpha_pct") === 50, sqrt(n))
            .when(col("alpha_pct") === 75, sqrt(n) * sqrt(sqrt(n)))
            .otherwise(n))
        .withColumn("q", floor(col("m") * 1e6).cast("long"))
      val totals = byAlpha.groupBy(col("alpha_pct"))
        .agg(sum(col("q")).as("tq"))
      byAlpha.join(broadcast(totals), "alpha_pct")
        .select(col("alpha_pct"), col("source"), col("n_tokens"),
          expr("q * 1000000L DIV tq").as("p_micros"))
        .orderBy(col("alpha_pct"), col("source"))
    },
    Some("""
      WITH mass AS (
        SELECT source,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
                 AS n_tokens
        FROM documents GROUP BY source),
      ba AS (
        SELECT source, n_tokens, alpha_pct,
               CASE alpha_pct
                 WHEN 25 THEN sqrt(sqrt(CAST(n_tokens AS DOUBLE)))
                 WHEN 50 THEN sqrt(CAST(n_tokens AS DOUBLE))
                 WHEN 75 THEN sqrt(CAST(n_tokens AS DOUBLE))
                              * sqrt(sqrt(CAST(n_tokens AS DOUBLE)))
                 ELSE CAST(n_tokens AS DOUBLE)
               END AS m
        FROM mass,
             (SELECT unnest([25, 50, 75, 100]) AS alpha_pct)),
      q AS (
        SELECT source, n_tokens, CAST(alpha_pct AS BIGINT) AS alpha_pct,
               CAST(floor(m * 1e6) AS BIGINT) AS q
        FROM ba),
      t AS (SELECT alpha_pct, sum(q) AS tq FROM q GROUP BY alpha_pct)
      SELECT q.alpha_pct, source, n_tokens,
             CAST((q.q * 1000000) // t.tq AS BIGINT) AS p_micros
      FROM q JOIN t USING (alpha_pct)
      ORDER BY alpha_pct, source
    """.trim))

  /** Shard ORDERING audit — the check a training run needs AFTER the
    * token-balanced shard plan: when each shard is emitted in the
    * writer's hash-shuffled order (md5 of doc_id — the standard
    * storage-order-independent shuffle), how often are ADJACENT
    * documents from the same source? Long same-source runs correlate
    * consecutive gradients; a well-mixed shard should sit at the
    * composition baseline Σ nₛ(nₛ−1) / (n(n−1)) — the adjacent
    * same-source probability of a uniformly random order of that
    * shard's composition. `excess_micros` > 0 means residual source
    * clumping the shuffle failed to break up.
    *
    * Scale: the serpentine striping ranks inside each source partition
    * (never a global sort), the adjacency window runs inside each
    * SHARD partition, and everything after is an 8-row rollup.
    * Integer micro-units; the signed excess is a subtraction of two
    * floored non-negative ratios so no negative division is ever
    * evaluated (floor vs truncate would disagree there). */
  val qShardMixAudit: Q = {
    val numShards = 8
    Q(
      "q_shard_mix_audit",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sized = Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        val rk = (row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("nt").desc, col("doc_id"))) - 1).cast("long")
        val striped = sized
          .withColumn("stripe", floor(rk / numShards).cast("long"))
          .withColumn("pos", rk % numShards)
          .withColumn("shard",
            when(col("stripe") % 2 === 0, col("pos"))
              .otherwise(lit(numShards - 1) - col("pos")))
          .withColumn("h", md5(col("doc_id").cast("string")))
        val wEmit = Window.partitionBy(col("shard"))
          .orderBy(col("h"), col("doc_id"))
        val adj = striped
          .withColumn("same",
            when(lag(col("source"), 1).over(wEmit) === col("source"), 1L)
              .otherwise(0L))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            sum(col("same")).as("n_adj_same"))
        val comp = striped.groupBy(col("shard"), col("source"))
          .agg(count(lit(1)).as("ns"))
          .groupBy(col("shard"))
          .agg(sum(col("ns") * (col("ns") - 1)).as("same_pairs"))
        adj.join(comp, Seq("shard"))
          .select(col("shard"), col("n_docs"), col("n_sources"),
            expr("n_adj_same * 1000000 DIV (n_docs - 1)").as("adj_same_micros"),
            expr("same_pairs * 1000000 DIV (n_docs * (n_docs - 1))")
              .as("rand_same_micros"))
          .withColumn("excess_micros",
            col("adj_same_micros") - col("rand_same_micros"))
          .orderBy(col("shard"))
      },
      Some(s"""
      WITH sized AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt
        FROM documents),
      ranked AS (
        SELECT doc_id, source, row_number() OVER (PARTITION BY source
                 ORDER BY nt DESC, doc_id) - 1 AS rk
        FROM sized),
      striped AS (
        SELECT doc_id, source,
               CASE WHEN (rk // $numShards) % 2 = 0
                    THEN rk % $numShards
                    ELSE ${numShards - 1} - rk % $numShards END AS shard,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM ranked),
      adj AS (
        SELECT shard, count(*) AS n_docs,
               count(DISTINCT source) AS n_sources,
               CAST(sum(same) AS BIGINT) AS n_adj_same
        FROM (SELECT shard, source,
                     CASE WHEN lag(source) OVER
                         (PARTITION BY shard ORDER BY h, doc_id) = source
                       THEN 1 ELSE 0 END AS same
              FROM striped)
        GROUP BY shard),
      comp AS (
        SELECT shard, CAST(sum(ns * (ns - 1)) AS BIGINT) AS same_pairs
        FROM (SELECT shard, source, count(*) AS ns
              FROM striped GROUP BY shard, source)
        GROUP BY shard)
      SELECT a.shard, a.n_docs, a.n_sources,
             CAST(a.n_adj_same * 1000000 // (a.n_docs - 1) AS BIGINT)
               AS adj_same_micros,
             CAST(c.same_pairs * 1000000 // (a.n_docs * (a.n_docs - 1))
               AS BIGINT) AS rand_same_micros,
             CAST(a.n_adj_same * 1000000 // (a.n_docs - 1)
                  - c.same_pairs * 1000000 // (a.n_docs * (a.n_docs - 1))
               AS BIGINT) AS excess_micros
      FROM adj a JOIN comp c USING (shard)
      ORDER BY shard
    """.trim))
  }

  /** CMS join-cardinality estimation — the "how big is this join"
    * planner probe run BEFORE paying for a shuffle: two Depth×Width
    * count-min sketches ([[Sketches.build]]) stand in for the inputs,
    * and the AMS-style row-wise inner product with a min over rows
    * ([[Sketches.joinSizeEstimate]]) upper-bounds the equi-join
    * cardinality. Probed on two shapes a warehouse planner actually
    * faces — the FK join `lineitem ⋈ orders` and the self-join
    * (second frequency moment) of `events` on `user_id`, the classic
    * skew detector. Reported against the exact size computed from
    * per-key frequency products (never the materialized join), with
    * the one-sided error in integer ppm: `overest_ppm >= 0` for both
    * rows is the sketch theorem, and the oracle deriving the
    * IDENTICAL ppm checks every counter cell. At 100 TB the sketches
    * broadcast (128 KiB regardless of input), so the probe costs two
    * column scans; the exact side exists only to grade it. */
  val qJoinSizeEst: Q = {
    val w = Sketches.Width
    val posList = (0 until Sketches.Depth)
      .map(i => s"${DedupQueries.chunkSql(i)} % $w").mkString(", ")
    val rowList = (0 until Sketches.Depth).mkString("[", ", ", "]")
    Q(
      "q_join_size_est",
      (spark, dir) => {
        import org.apache.spark.sql.DataFrame
        def keyed(df: DataFrame, c: String): DataFrame =
          df.select(col(c).cast("string").as("k"))
        def one(name: String, a: DataFrame, b: DataFrame): DataFrame = {
          val est = Sketches.joinSizeEstimate(
            Sketches.build(a, col("k")), Sketches.build(b, col("k")))
          val exact = Sketches.exactJoinSize(a, col("k"), b, col("k"))
          exact.crossJoin(est).select(
            lit(name).as("join_name"), col("n_exact"), col("cms_est"),
            expr("(cms_est - n_exact) * 1000000 div n_exact").as("overest_ppm"))
        }
        def self(name: String, a: DataFrame): DataFrame = {
          val est = Sketches.selfJoinSizeEstimate(Sketches.build(a, col("k")))
          val exact = Sketches.exactSelfJoinSize(a, col("k"))
          exact.crossJoin(est).select(
            lit(name).as("join_name"), col("n_exact"), col("cms_est"),
            expr("(cms_est - n_exact) * 1000000 div n_exact").as("overest_ppm"))
        }
        self("events_self_user", keyed(Tables.events(spark, dir), "user_id"))
          .unionByName(one("lineitem_orders_orderkey",
            keyed(Tables.lineitem(spark, dir), "l_orderkey"),
            keyed(Tables.orders(spark, dir), "o_orderkey")))
          .orderBy(col("join_name"))
      },
      Some(s"""
      WITH
      he AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
      hl AS (SELECT md5(CAST(l_orderkey AS VARCHAR)) AS hx FROM lineitem),
      ho AS (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hx FROM orders),
      pe AS (SELECT unnest($rowList) AS hr, unnest([$posList]) AS hc FROM he),
      pl AS (SELECT unnest($rowList) AS hr, unnest([$posList]) AS hc FROM hl),
      po AS (SELECT unnest($rowList) AS hr, unnest([$posList]) AS hc FROM ho),
      se AS (SELECT hr, hc, count(*) AS cnt FROM pe GROUP BY hr, hc),
      sl AS (SELECT hr, hc, count(*) AS cnt FROM pl GROUP BY hr, hc),
      so AS (SELECT hr, hc, count(*) AS cnt FROM po GROUP BY hr, hc),
      est_self AS (
        SELECT CAST(least(min(dot), 9223372036854775807) AS BIGINT)
          AS cms_est FROM (
          SELECT hr, sum(CAST(cnt AS HUGEINT) * cnt) AS dot
          FROM se GROUP BY hr)),
      est_fk AS (
        SELECT CAST(least(min(dot), 9223372036854775807) AS BIGINT)
          AS cms_est FROM (
          SELECT a.hr, sum(CAST(a.cnt AS HUGEINT) * b.cnt) AS dot
          FROM sl a JOIN so b USING (hr, hc) GROUP BY a.hr)),
      ex_self AS (
        SELECT CAST(sum(CAST(na AS HUGEINT) * na) AS BIGINT) AS n_exact FROM (
          SELECT count(*) AS na FROM events GROUP BY user_id)),
      ex_fk AS (
        SELECT CAST(sum(CAST(na AS HUGEINT) * nb) AS BIGINT) AS n_exact FROM (
          SELECT na, nb FROM
            (SELECT l_orderkey AS k, count(*) AS na FROM lineitem GROUP BY 1) a
            JOIN (SELECT o_orderkey AS k, count(*) AS nb FROM orders GROUP BY 1) b
            USING (k)))
      SELECT 'events_self_user' AS join_name, n_exact, cms_est,
             (cms_est - n_exact) * 1000000 // n_exact AS overest_ppm
      FROM ex_self, est_self
      UNION ALL
      SELECT 'lineitem_orders_orderkey', n_exact, cms_est,
             (cms_est - n_exact) * 1000000 // n_exact
      FROM ex_fk, est_fk
      ORDER BY join_name
    """.trim))
  }

  /** Pareto frontier (skyline) of (source, lang) corpus cells on
    * three maximize-objectives — volume, mean length, mean quality:
    * the cells NO other cell dominates are the only rational
    * candidates when budgeting the next crawl, and everything off the
    * frontier is provably wasted spend on some axis. The dominance
    * test is the classic skyline anti-join, priced on the CELL
    * domain (≈ sources × langs rows, constant at any corpus scale)
    * after one aggregate collapses the corpus; per-doc quality
    * floors to integer micros before summing so every objective is
    * an exact integer and dominance is engine-exact. */
  val qParetoCells: Q = Q(
    "q_pareto_cells",
    (spark, dir) => {
      val cells = Tables.documents(spark, dir)
        .select(col("source"), col("lang"), col("n_chars"),
          floor(TextAnalysis.qualityScore(col("text")) * 1e6 + lit(0.5))
            .cast("long").as("q"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sc"),
          sum(col("q")).as("sq"))
        .select(col("source"), col("lang"), col("n_docs"),
          expr("sc * 1000 div n_docs").as("len_milli"),
          expr("sq div n_docs").as("qual_micro"))
        .persist()
      val dominated = cells.as("a").join(cells.as("b"),
        col("b.n_docs") >= col("a.n_docs")
          && col("b.len_milli") >= col("a.len_milli")
          && col("b.qual_micro") >= col("a.qual_micro")
          && (col("b.n_docs") > col("a.n_docs")
            || col("b.len_milli") > col("a.len_milli")
            || col("b.qual_micro") > col("a.qual_micro")),
        "left_semi")
      cells.join(dominated,
          Seq("source", "lang", "n_docs", "len_milli", "qual_micro"),
          "left_anti")
        .orderBy(col("source"), col("lang"))
    },
    Some("""
      WITH scored AS (
        SELECT source, lang, n_chars,
               CAST(floor(round(
                 least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3
                 + (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3
                 + (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4, 6)
                 * 1e6 + 0.5) AS BIGINT) AS q
        FROM (
          SELECT source, lang, n_chars, len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
                 len(list_distinct(toks)) AS n_unique
          FROM (SELECT source, lang, n_chars,
                       string_split_regex(text, '\s+') AS toks
                FROM documents))),
      cells AS (
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) * 1000 // count(*) AS len_milli,
               CAST(sum(q) AS BIGINT) // count(*) AS qual_micro
        FROM scored GROUP BY source, lang)
      SELECT a.source, a.lang, a.n_docs, a.len_milli, a.qual_micro
      FROM cells a
      WHERE NOT EXISTS (
        SELECT 1 FROM cells b
        WHERE b.n_docs >= a.n_docs AND b.len_milli >= a.len_milli
          AND b.qual_micro >= a.qual_micro
          AND (b.n_docs > a.n_docs OR b.len_milli > a.len_milli
            OR b.qual_micro > a.qual_micro))
      ORDER BY a.source, a.lang
    """.trim))

  /** UCB1 crawl-budget allocation over sources — the bandit read of
    * the quality ledger: each source is an arm, each doc a pull, the
    * reward its quality score, and the allocation rank follows
    * mean + √(2 ln N / nᵢ) so under-sampled sources get exploration
    * credit a plain mean ranking denies them. Means are exact integer
    * micros; the bonus is one shared double tree; ranks come off a
    * 20-row TakeOrdered sort. The planning counterpart of
    * `q_mixture_plan`'s static shares. */
  val qBanditUcb: Q = Q(
    "q_bandit_ucb",
    (spark, dir) => {
      val arms = Tables.documents(spark, dir)
        .select(col("source"),
          floor(TextAnalysis.qualityScore(col("text")) * 1e6 + lit(0.5))
            .cast("long").as("q"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
      val tot = arms.agg(sum(col("n")).as("nn"))
      arms.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          expr("sq div n").as("mean_micro"),
          floor((col("sq").cast("double") / col("n") / lit(1e6)
            + sqrt(lit(2.0) * log(col("nn").cast("double")) / col("n")))
            * lit(1e6)).cast("long").as("ucb_micro"))
        .orderBy(col("ucb_micro").desc, col("source"))
    },
    Some("""
      WITH scored AS (
        SELECT source,
               CAST(floor(round(
                 least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3
                 + (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3
                 + (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4, 6)
                 * 1e6 + 0.5) AS BIGINT) AS q
        FROM (
          SELECT source, len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
                 len(list_distinct(toks)) AS n_unique
          FROM (SELECT source, string_split_regex(text, '\s+') AS toks
                FROM documents))),
      arms AS (
        SELECT source, count(*) AS n, CAST(sum(q) AS BIGINT) AS sq
        FROM scored GROUP BY source),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM arms)
      SELECT source, n, sq // n AS mean_micro,
             CAST(floor((CAST(sq AS DOUBLE) / n / 1e6
               + sqrt(2.0 * ln(CAST(nn AS DOUBLE)) / n)) * 1e6) AS BIGINT)
               AS ucb_micro
      FROM arms, tot
      ORDER BY ucb_micro DESC, source
    """.trim))

  val all: Seq[Q] = Seq(qSplitAssign, qMixturePlan, qMixtureTemperature,
    qQualityCalibration, qRangeJoinBanded, qShardPlan, qShardMixAudit,
    qCurriculum, qEpochPlan, qJoinSizeEst, qParetoCells, qBanditUcb)
}
