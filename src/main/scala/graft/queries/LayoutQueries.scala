package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.Layout

/** Data-layout / CDC-compaction / privacy-gate verify queries — the
  * table-maintenance surface of a training-data lakehouse: changelog
  * compaction (latest-wins upsert), SCD-2 periodization, small-file
  * compaction planning, Z-order layout cells, and the k-anonymity
  * audit. The `events` stream table stands in for the changelog; the
  * `documents` table for the file ledger. */
object LayoutQueries {

  /** Latest-wins snapshot of the event changelog per user — CDC
    * upsert compaction as one map-side-combinable lexicographic-max
    * aggregate (no per-key history sort). The oracle takes the same
    * row via a row_number window — independent machinery, same
    * determinism contract (ties impossible: event_id is unique). */
  val qUpsertLatest: Q = Q(
    "q_upsert_latest",
    (spark, dir) => Layout.latestSnapshot(
        Tables.events(spark, dir),
        key = col("user_id"), ts = col("ts"), tiebreak = col("event_id"),
        payload = Seq(col("event_type"), col("value")))
      .select(col("key").as("user_id"), col("ts"),
        col("__p0").as("event_type"), col("__p1").as("value"))
      .orderBy(col("user_id")),
    Some("""
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id
    """.trim))

  /** SCD-2 periodization: every event becomes a validity interval
    * `[valid_from, valid_to)` per user, `valid_to` = the user's next
    * event (null while current) — the dimension-table shape that lets
    * an as-of lookup become a plain BETWEEN join. One shuffle on the
    * key; sort only within each key's history. */
  val qScd2Intervals: Q = Q(
    "q_scd2_intervals",
    (spark, dir) => Layout.scd2Intervals(
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
        key = col("user_id"), ts = col("ts"), tiebreak = col("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id")),
    Some("""
      SELECT event_id, user_id, event_type,
             CAST(ts AS TIMESTAMP) AS valid_from,
             lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
             (lead(ts) OVER w IS NULL) AS is_current
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, valid_from, event_id
    """.trim))

  /** Small-file compaction plan per source: exact integer byte totals
    * (n_chars as the byte ledger), files needed at a 64 KiB target
    * (ceiling DIV — double division stops being exact past 2^53
    * bytes), and the mean fill. The plan every lakehouse maintenance
    * job derives before rewriting a partition. */
  val qCompactionPlan: Q = {
    val target = 65536L
    Q(
      "q_compaction_plan",
      (spark, dir) => Layout.compactionPlan(
          Tables.documents(spark, dir),
          partitionCol = col("source"), bytesCol = col("n_chars"),
          targetBytes = target)
        .orderBy(col("partition")),
      Some(s"""
      SELECT source AS partition, count(*) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS total_bytes,
             (CAST(sum(n_chars) AS BIGINT) + ${target - 1}) // $target AS n_files,
             CAST(sum(n_chars) AS BIGINT)
               // ((CAST(sum(n_chars) AS BIGINT) + ${target - 1}) // $target)
               AS avg_file_bytes,
             round(CAST(sum(n_chars) AS DOUBLE) /
                   (((CAST(sum(n_chars) AS BIGINT) + ${target - 1}) // $target)
                    * $target), 6) AS fill_ratio
      FROM documents GROUP BY source ORDER BY partition
    """.trim))
  }

  /** Z-order (Morton) layout cells over (user_id, value-band): the
    * 2-D interleaved key that clusters a table for range pruning on
    * both columns at once, rolled up to 256 cells with each cell's
    * dimension envelopes — the report that shows what a min/max-zone
    * file skip would achieve under this layout. Pure bit arithmetic;
    * the oracle regenerates the identical interleave. */
  val qZorderCells: Q = {
    val bits = 8
    val interleaveSql = (0 until bits).map { i =>
      s"(((ua >> $i) & 1) * ${1L << (2 * i)} + ((vb >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
    Q(
      "q_zorder_cells",
      (spark, dir) => {
        val ua = least(col("user_id"), lit(255L))
        val vb = least(floor(col("value") / 2).cast("long"), lit(255L))
        Tables.events(spark, dir)
          .select(col("user_id"), col("value"),
            Layout.zorderCell(ua, vb, bits).as("z"))
          .groupBy((col("z") / 256).cast("long").as("cell"))
          .agg(count(lit(1)).as("n_events"),
            min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
            min(col("value")).as("v_lo"), max(col("value")).as("v_hi"))
          .orderBy(col("cell"))
      },
      Some(s"""
      WITH keyed AS (
        SELECT user_id, value, $interleaveSql AS z FROM (
          SELECT user_id, value,
                 least(user_id, 255) AS ua,
                 least(CAST(floor(value / 2) AS BIGINT), 255) AS vb
          FROM events))
      SELECT z // 256 AS cell, count(*) AS n_events,
             min(user_id) AS u_lo, max(user_id) AS u_hi,
             min(value) AS v_lo, max(value) AS v_hi
      FROM keyed GROUP BY z // 256 ORDER BY cell
    """.trim))
  }

  /** k-anonymity audit (k=10) over the (event_type, value-band)
    * quasi-identifier tuple: group count, under-k group count, and the
    * share of rows sitting in risky groups — the privacy gate run
    * before releasing attribute combinations into a training corpus.
    * Two hash aggregates, scan-shaped at any size. */
  val qPrivacyKanon: Q = Q(
    "q_privacy_kanon",
    (spark, dir) => Layout.kAnonymity(
      Tables.events(spark, dir),
      quasi = Seq(col("event_type"),
        floor(col("value") / 50).cast("long").as("vband")),
      k = 10),
    Some("""
      WITH g AS (
        SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS vband,
               count(*) AS n
        FROM events GROUP BY event_type, vband)
      SELECT count(*) AS n_groups,
             CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
             round(CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
                   / sum(n), 6) AS risk_share
      FROM g
    """.trim))

  /** l-diversity audit (l=3) with `user_id` as the sensitive
    * attribute inside the same (event_type, value-band) groups as the
    * k-anonymity gate: a group is risky when its members nearly all
    * belong to one user — size alone (k-anonymity) misses that. */
  val qPrivacyLdiversity: Q = Q(
    "q_privacy_ldiversity",
    (spark, dir) => Layout.lDiversity(
      Tables.events(spark, dir),
      quasi = Seq(col("event_type"),
        floor(col("value") / 50).cast("long").as("vband")),
      sensitive = col("user_id"), l = 3),
    Some("""
      WITH g AS (
        SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS vband,
               count(*) AS n, count(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY event_type, vband)
      SELECT count(*) AS n_groups,
             CAST(sum(CASE WHEN n_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_underdiverse_groups,
             min(n_distinct) AS min_diversity,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN n_distinct < 3 THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
             round(CAST(sum(CASE WHEN n_distinct < 3 THEN n ELSE 0 END) AS DOUBLE)
                   / sum(n), 6) AS risk_share
      FROM g
    """.trim))

  /** Zone-map pruning proof over the Z-order cells: for a fixed
    * predicate box (user_id ∈ [4,8] × value ∈ [10,50]), report per
    * cell whether its min/max envelope lets a scanner SKIP the cell,
    * alongside the ground-truth matching-row count — the output makes
    * the data-skipping invariant visible (pruned ⇒ n_matching = 0) and
    * the skip ratio measurable. One aggregate pass computes envelopes
    * AND truth counts together; a table format's zone maps would hand
    * the engine the same decision without touching cell contents,
    * which is the entire economics of Z-ordering at 100 TB. */
  val qZoneSkip: Q = {
    val bits = 8
    // box chosen to exist at every SF (user ids are dense from 0)
    val (uLo, uHi, vLo, vHi) = (4L, 8L, 10.0, 50.0)
    val interleaveSql = (0 until bits).map { i =>
      s"(((ua >> $i) & 1) * ${1L << (2 * i)} + ((vb >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
    Q(
      "q_zone_skip",
      (spark, dir) => {
        val ua = least(col("user_id"), lit(255L))
        val vb = least(floor(col("value") / 2).cast("long"), lit(255L))
        val pred = col("user_id").between(uLo, uHi) &&
          col("value").between(vLo, vHi)
        Tables.events(spark, dir)
          .select(col("user_id"), col("value"),
            Layout.zorderCell(ua, vb, bits).as("z"),
            pred.cast("long").as("m"))
          .groupBy((col("z") / 256).cast("long").as("cell"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
            min(col("value")).as("v_lo"), max(col("value")).as("v_hi"),
            sum(col("m")).as("n_matching"))
          .withColumn("pruned",
            col("u_hi") < uLo || col("u_lo") > uHi ||
              col("v_hi") < vLo || col("v_lo") > vHi)
          .select(col("cell"), col("n_rows"), col("pruned"), col("n_matching"))
          .orderBy(col("cell"))
      },
      Some(s"""
      WITH keyed AS (
        SELECT user_id, value, $interleaveSql AS z,
               CASE WHEN user_id BETWEEN $uLo AND $uHi
                     AND value BETWEEN $vLo AND $vHi THEN 1 ELSE 0 END AS m
        FROM (
          SELECT user_id, value,
                 least(user_id, 255) AS ua,
                 least(CAST(floor(value / 2) AS BIGINT), 255) AS vb
          FROM events)),
      cells AS (
        SELECT z // 256 AS cell, count(*) AS n_rows,
               min(user_id) AS u_lo, max(user_id) AS u_hi,
               min(value) AS v_lo, max(value) AS v_hi,
               CAST(sum(m) AS BIGINT) AS n_matching
        FROM keyed GROUP BY z // 256)
      SELECT cell, n_rows,
             (u_hi < $uLo OR u_lo > $uHi OR v_hi < $vLo OR v_lo > $vHi)
               AS pruned,
             n_matching
      FROM cells ORDER BY cell
    """.trim))
  }

  /** Differentially-private count release (ε = 0.5, sensitivity 1 →
    * Laplace scale 2): per (source, lang) cell, the true count plus
    * Laplace noise drawn DETERMINISTICALLY — the md5 of the cell key
    * maps to a uniform in (0,1) through the same basis-point machinery
    * the samplers use, then through the Laplace inverse CDF. Real DP
    * deployments draw fresh randomness; the deterministic draw keeps
    * the release reproducible across engines/runs (and oracle-
    * checkable) while exercising the exact release arithmetic. All
    * noise math is double arithmetic derived from exact integers, so
    * both engines evaluate the identical IEEE expression tree. */
  val qPrivacyDpCounts: Q = Q(
    "q_privacy_dpcounts",
    (spark, dir) => {
      val bp = graft.operators.Sampling
        .hashBasisPoints(concat(col("source"), lit(":"), col("lang")))
      Tables.documents(spark, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("true_n"))
        .withColumn("u",
          (bp.cast("double") + 0.5) / 10000.0)
        .withColumn("noise",
          round(-signum(col("u") - 0.5)
            * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)) * 2.0, 6))
        .select(col("source"), col("lang"), col("true_n"),
          col("noise"), round(col("true_n") + col("noise"), 6).as("noisy_n"))
        .orderBy(col("source"), col("lang"))
    },
    Some(s"""
      WITH g AS (
        SELECT source, lang, count(*) AS true_n
        FROM documents GROUP BY source, lang),
      u AS (
        SELECT source, lang, true_n,
               (CAST(${AnalyticsQueries.bpSql("source || ':' || lang")}
                     AS DOUBLE) + 0.5) / 10000.0 AS u
        FROM g),
      n AS (
        SELECT source, lang, true_n,
               round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) * 2.0, 6)
                 AS noise
        FROM u)
      SELECT source, lang, true_n, noise,
             round(true_n + noise, 6) AS noisy_n
      FROM n ORDER BY source, lang
    """.trim))

  /** Content-addressed dataset version fingerprint — the Merkle shape
    * dataset reproducibility needs: per-doc leaf digests
    * (`md5(doc_id:text)`), per-shard digests over the doc-ordered
    * leaf concatenation, and one corpus root digest over the
    * shard-ordered shard digests, reported beside per-shard row
    * counts (root row has `shard = -1`). Two datasets are
    * byte-identical iff the roots match; a changed doc pins its shard
    * in one tree descent — the audit a training run records so "which
    * exact data built this checkpoint" has a one-hash answer.
    *
    * Scale shape: leaves are in-row md5s; each shard digest
    * concatenates a BOUNDED group (256 docs per shard by id range, the
    * fixed shard geometry) via an in-row sort of the collected
    * (doc_id, leaf) structs, so per-group state is constant and the
    * aggregate is map-side combinable up to shard granularity; the
    * root digest folds the (tiny) shard table the same way. No
    * windows, no driver collect — the tree is two hash aggregates. */
  val qDatasetMerkle: Q = Q(
    "q_dataset_merkle",
    (spark, dir) => {
      val leaves = Tables.documents(spark, dir)
        .select(expr("doc_id div 256").as("shard"), col("doc_id"),
          md5(concat_ws(":", col("doc_id").cast("string"), col("text")))
            .as("leaf"))
      val shards = leaves.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          md5(array_join(expr(
            "transform(sort_array(collect_list(struct(doc_id, leaf)))," +
              " x -> x.leaf)"), "")).as("digest"))
      val root = shards
        .agg(sum(col("n_docs")).as("n_docs"),
          md5(array_join(expr(
            "transform(sort_array(collect_list(struct(shard, digest)))," +
              " x -> x.digest)"), "")).as("digest"))
        .select(lit(-1L).as("shard"), col("n_docs"), col("digest"))
      shards.select(col("shard"), col("n_docs"), col("digest"))
        .unionByName(root)
        .orderBy(col("shard"))
    },
    Some("""
      WITH leaves AS (
        SELECT doc_id // 256 AS shard, doc_id,
               md5(CAST(doc_id AS VARCHAR) || ':' || text) AS leaf
        FROM documents),
      shards AS (
        SELECT shard, count(*) AS n_docs,
               md5(string_agg(leaf, '' ORDER BY doc_id)) AS digest
        FROM leaves GROUP BY shard),
      root AS (
        SELECT CAST(-1 AS BIGINT) AS shard,
               (SELECT count(*) FROM leaves) AS n_docs,
               md5(string_agg(digest, '' ORDER BY shard)) AS digest
        FROM shards)
      SELECT shard, n_docs, digest FROM shards
      UNION ALL
      SELECT shard, n_docs, digest FROM root
      ORDER BY shard
    """.trim))

  val all: Seq[Q] = Seq(qUpsertLatest, qScd2Intervals, qCompactionPlan,
    qZorderCells, qPrivacyKanon, qPrivacyLdiversity, qZoneSkip,
    qPrivacyDpCounts, qDatasetMerkle)
}
