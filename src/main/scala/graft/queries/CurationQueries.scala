package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Dedup, Sampling, Sketches, TextAnalysis}

/** Corpus-curation verify queries — the frequency/versioning/sampling
  * operations a training-data pipeline runs AROUND the dedup and
  * quality families: heavy-hitter sketching, substring-level
  * duplication trimming, per-stratum fixed-size draws, vocabulary
  * construction, and snapshot diffing. All oracles rebuild the same
  * deterministic arithmetic (md5-chunk hashing, integer counts) so the
  * DuckDB comparison checks the math, not a reimplementation. */
object CurationQueries {

  /** Count-min sketch vs exact frequencies for every distinct token:
    * the top-30 heavy hitters with their estimate and overestimate.
    * `overest >= 0` for every key is the sketch's one-sided-error
    * theorem — both engines deriving the identical (not just
    * non-negative) overestimates checks the counter mechanics cell by
    * cell. */
  val qSketchCms: Q = {
    val w = Sketches.Width
    val posList = (0 until Sketches.Depth)
      .map(i => s"${DedupQueries.chunkSql(i)} % $w").mkString(", ")
    val rowList = (0 until Sketches.Depth).mkString("[", ", ", "]")
    Q(
      "q_sketch_cms",
      (spark, dir) => {
        val toks = Tables.documents(spark, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .filter(length(col("token")) > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sketch = Sketches.build(toks, col("token"))
        val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        val est = Sketches.estimate(exact.select("token"), "token", sketch)
        exact.join(est, "token")
          .select(col("token"), col("n_exact"), col("cms_est"),
            (col("cms_est") - col("n_exact")).as("overest"))
          .orderBy(col("n_exact").desc, col("token"))
          .limit(30)
      },
      Some(s"""
      WITH tk AS (
        SELECT token FROM (
          SELECT unnest(string_split_regex(text, '\\s+')) AS token
          FROM documents)
        WHERE len(token) > 0),
      pos AS (
        SELECT unnest($rowList) AS hr, unnest([$posList]) AS hc
        FROM (SELECT md5(token) AS hx FROM tk)),
      sketch AS (
        SELECT hr, hc, count(*) AS cnt FROM pos GROUP BY hr, hc),
      exact AS (
        SELECT token, count(*) AS n_exact FROM tk GROUP BY token),
      cpos AS (
        SELECT token, unnest($rowList) AS hr, unnest([$posList]) AS hc
        FROM (SELECT token, md5(token) AS hx
              FROM (SELECT DISTINCT token FROM tk))),
      est AS (
        SELECT c.token, min(s.cnt) AS cms_est
        FROM cpos c JOIN sketch s USING (hr, hc)
        GROUP BY c.token)
      SELECT x.token, x.n_exact, e.cms_est, e.cms_est - x.n_exact AS overest
      FROM exact x JOIN est e USING (token)
      ORDER BY x.n_exact DESC, x.token
      LIMIT 30
    """.trim))
  }

  /** Per-document duplicated-10-gram fraction — the substring-dedup
    * trim signal (what share of this doc's contiguous 10-token spans
    * also appear in another doc). Spark builds an inverted
    * shingle-df index and joins it back; the oracle recomputes df in
    * SQL over the identical shingle definition. */
  val qDedupSubstring: Q = Q(
    "q_dedup_substring",
    (spark, dir) =>
      Dedup.duplicatedNgramStats(Tables.documents(spark, dir), n = 10, minDf = 2)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(tl[i:i+9], ' ')
                  FOR i IN generate_series(1, len(tl) - 9)])) AS shingle
        FROM toks WHERE len(tl) >= 10),
      dft AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
      SELECT doc_id, n_shingles, n_dup,
             round(CAST(n_dup AS DOUBLE) / n_shingles, 6) AS dup_fraction,
             round(CAST(n_dup AS DOUBLE) / n_shingles, 6) >= 0.5 AS trim_candidate
      FROM (
        SELECT s.doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM sh s JOIN dft d USING (shingle)
        GROUP BY s.doc_id)
      ORDER BY doc_id
    """.trim))

  /** Fixed-k deterministic sample per source stratum (k=3 of 25):
    * exactly three md5-ranked docs per source, identical on every
    * run/engine — the eval-set / spot-check draw. */
  val qSamplePerGroup: Q = Q(
    "q_sample_per_group",
    (spark, dir) =>
      Sampling.fixedKPerGroup(Tables.documents(spark, dir),
          col("doc_id"), col("source"), 3)
        .select(col("source"), col("sample_rank").cast("long").as("sample_rank"),
          col("doc_id"))
        .orderBy(col("source"), col("sample_rank")),
    Some("""
      SELECT source, sample_rank, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)),
                          CAST(doc_id AS VARCHAR)) AS sample_rank
        FROM documents)
      WHERE sample_rank <= 3
      ORDER BY source, sample_rank
    """.trim))

  /** Quality-WEIGHTED fixed-k draw per source (k=3): the
    * Efraimidis-Spirakis reservoir on the md5 uniform — inclusion
    * odds proportional to the quality score, deterministic on every
    * run/engine, zero input shuffle
    * ([[Sampling.weightedFixedKPerGroup]]). The draw a curation
    * pipeline uses when the spot-check should over-represent the docs
    * that will actually be kept. */
  val qSampleWeightedK: Q = Q(
    "q_sample_weighted_k",
    (spark, dir) =>
      Sampling.weightedFixedKPerGroup(Tables.documents(spark, dir),
          col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")), 3)
        .select(col("source"), col("sample_rank").cast("long").as("sample_rank"),
          col("doc_id"))
        .orderBy(col("source"), col("sample_rank")),
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
               round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 +
                     (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3 +
                     (CAST(n_unique AS DOUBLE) / n_tokens) * 0.4, 6) AS q
        FROM (
          SELECT doc_id, source,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stopwords,
                 len(list_distinct(toks)) AS n_unique
          FROM (SELECT doc_id, source,
                       string_split_regex(text, '\\s+') AS toks
                FROM documents))),
      keyed AS (
        SELECT source, doc_id,
               CAST(floor(ln((${AnalyticsQueries.bpSql("doc_id")} + 0.5)
                      / 10000.0)
                    / greatest(q, 0.000001) * 1000000000) AS BIGINT) AS s
        FROM scored)
      SELECT source, sample_rank, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY s DESC, CAST(doc_id AS VARCHAR)) AS sample_rank
        FROM keyed)
      WHERE sample_rank <= 3
      ORDER BY source, sample_rank
    """.trim))

  /** Vocabulary head: top-50 tokens by occurrence count with document
    * frequency and dense frequency rank — the corpus-stats table a
    * tokenizer build starts from. The global rank is assigned AFTER
    * the top-k cut, so the only full-width operation is the count
    * aggregate (one shuffle); the 50-row window is driver-trivial. */
  val qTextVocab: Q = Q(
    "q_text_vocab",
    (spark, dir) => {
      val tk = Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
      val top = tk.groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(50)
      top.withColumn("vocab_rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("n_occurrences").desc, col("token"))).cast("long"))
        .orderBy(col("vocab_rank"))
    },
    Some("""
      WITH tk AS (
        SELECT doc_id, token FROM (
          SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
          FROM documents)
        WHERE len(token) > 0),
      freq AS (
        SELECT token, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM tk GROUP BY token),
      top AS (
        SELECT * FROM freq ORDER BY n_occurrences DESC, token LIMIT 50)
      SELECT token, n_occurrences, n_docs,
             row_number() OVER (ORDER BY n_occurrences DESC, token) AS vocab_rank
      FROM top ORDER BY vocab_rank
    """.trim))

  /** Corpus snapshot diff: added / removed / changed docs between two
    * fingerprint manifests (synthesized in-query from the documents
    * table: the old snapshot lacks doc_id % 11 = 0, the new snapshot
    * lacks doc_id % 13 = 0 and revises the text of doc_id % 7 = 0).
    * One full-outer join on the doc key comparing md5 manifests — the
    * versioning primitive an incremental corpus rebuild diffs with;
    * at scale both manifests are (key, fp) projections, never the
    * text, and bucketed storage makes the join shuffle-free. */
  val qCorpusDiff: Q = Q(
    "q_corpus_diff",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val old = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("old_fp"))
      val neu = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text"))).as("new_fp"))
      old.join(neu, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("old_fp").isNull, "added")
            .when(col("new_fp").isNull, "removed")
            .when(col("old_fp") =!= col("new_fp"), "changed")
            .otherwise("unchanged").as("status"))
        .filter(col("status") =!= "unchanged")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH old AS (
        SELECT doc_id, md5(text) AS old_fp FROM documents WHERE doc_id % 11 <> 0),
      neu AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END)
                 AS new_fp
        FROM documents WHERE doc_id % 13 <> 0)
      SELECT doc_id, status FROM (
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.old_fp <> n.new_fp THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id)
      WHERE status <> 'unchanged'
      ORDER BY doc_id
    """.trim))

  /** Out-of-vocabulary rate per source against the corpus's own top-25
    * token vocabulary — the tokenizer-planning gauge: a source whose
    * token mass falls outside the learned vocab head will fragment
    * into long byte-level sequences at training time. The vocabulary
    * is top-k and therefore tiny by construction: Spark builds it with
    * one token-count aggregate and BROADCASTS it back over the
    * exploded corpus, so the second pass is scan-shaped — the corpus
    * never shuffles for the join at any scale. Tie-break at the k
    * boundary is (count desc, token), deterministic in both engines. */
  val qTextOov: Q = Q(
    "q_text_oov",
    (spark, dir) => {
      val tk = Tables.documents(spark, dir)
        .select(col("source"),
          explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
      val vocab = tk.groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(25)
        .select(col("token"), lit(true).as("in_vocab"))
      tk.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tokens"), 6))
        .orderBy(col("source"))
    },
    Some("""
      WITH tk AS (
        SELECT source, token FROM (
          SELECT source, unnest(string_split_regex(text, '\s+')) AS token
          FROM documents)
        WHERE len(token) > 0),
      top AS (
        SELECT token FROM (
          SELECT token, count(*) AS n FROM tk GROUP BY token
          ORDER BY n DESC, token LIMIT 25)),
      j AS (
        SELECT tk.source, top.token IS NOT NULL AS in_vocab
        FROM tk LEFT JOIN top USING (token))
      SELECT source, count(*) AS n_tokens,
             CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
             round(CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS DOUBLE)
                   / count(*), 6) AS oov_rate
      FROM j GROUP BY source ORDER BY source
    """.trim))

  /** Corpus concentration: Gini coefficient of token mass across
    * sources plus the top-1 share — the one-row report that says
    * whether the mixture is dominated by a single crawl. Uses the
    * PAIRWISE Gini formulation Σᵢⱼ|xᵢ-xⱼ| / (2·n·Σx) over the tiny
    * per-source rollup (a broadcast nested-loop of |sources|² rows) —
    * no rank window, no global sort, exact integer arithmetic. */
  val qCorpusGini: Q = Q(
    "q_corpus_gini",
    (spark, dir) => {
      val m = Tables.documents(spark, dir)
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("nt"))
      val t = m.agg(count(lit(1)).as("n_sources"),
        sum(col("nt")).as("total_tokens"), max(col("nt")).as("mx"))
      val pairSum = m.select(col("nt").as("na"))
        .crossJoin(broadcast(m.select(col("nt").as("nb"))))
        .agg(sum(abs(col("na") - col("nb"))).as("sa"))
      t.crossJoin(broadcast(pairSum))
        .select(col("n_sources"), col("total_tokens"),
          expr("sa * 1000000L DIV (2 * n_sources * total_tokens)")
            .as("gini_micros"),
          expr("mx * 1000000L DIV total_tokens").as("top1_share_micros"))
    },
    Some("""
      WITH m AS (
        SELECT source,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS nt
        FROM documents GROUP BY source),
      t AS (SELECT count(*) AS n_sources, CAST(sum(nt) AS BIGINT) AS total_tokens,
                   CAST(max(nt) AS BIGINT) AS mx FROM m),
      p AS (SELECT CAST(sum(abs(a.nt - b.nt)) AS BIGINT) AS sa FROM m a, m b)
      SELECT n_sources, total_tokens,
             sa * 1000000 // (2 * n_sources * total_tokens) AS gini_micros,
             mx * 1000000 // total_tokens AS top1_share_micros
      FROM t, p
    """.trim))

  /** Boilerplate span mining: the 30 most document-frequent 10-gram
    * spans — headers, footers, license blurbs — with occurrence and
    * document counts. THE complement to per-doc substring dedup
    * (`q_dedup_substring` scores documents; this EXTRACTS the spans a
    * cleaning pass would strip). One shingle explode + one aggregate;
    * df and occurrence count ride the same pass. */
  val qBoilerplateSpans: Q = Q(
    "q_boilerplate_spans",
    (spark, dir) => Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(TextAnalysis.shingles(col("text"), 10)).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("span"))
      .limit(30),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      spans AS (
        SELECT doc_id,
               unnest([array_to_string(tl[i:i+9], ' ')
                       FOR i IN generate_series(1, len(tl) - 9)]) AS span
        FROM toks WHERE len(tl) >= 10)
      SELECT span, count(*) AS n_occurrences,
             count(DISTINCT doc_id) AS n_docs
      FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= 2
      ORDER BY n_docs DESC, n_occurrences DESC, span LIMIT 30
    """.trim))

  /** Zipf fit: least-squares slope of ln(frequency) vs ln(rank) over
    * the top-100 vocabulary — natural text sits near −1; templated or
    * synthetic text drifts off. The only full-width op is the count
    * aggregate; the top-100 cut is a bounded TakeOrdered, the rank a
    * window over those 100 rows (bounded by construction —
    * allowlisted), and every regression sum is FLOORED TO INTEGER
    * NANOS before aggregation so the fit is exact-commutative, same
    * discipline as the entropy and LM scores. */
  val qZipfFit: Q = Q(
    "q_zipf_fit",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val top = Tables.documents(spark, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(100)
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("tok"))))
        .select(
          floor(log(col("rank").cast("double")) * 1e9).cast("long").as("x"),
          floor(log(col("c").cast("double")) * 1e9).cast("long").as("y"))
        .select(col("x"), col("y"),
          floor(col("x").cast("double") * col("y") / 1e9).cast("long").as("xy"),
          floor(col("x").cast("double") * col("x") / 1e9).cast("long").as("xx"))
      ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
          sum(col("xx")).as("sxx"))
        .select(col("n"),
          round((col("n") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy") / 1e9)
            / (col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx") / 1e9), 6)
            .as("zipf_slope"))
    },
    Some("""
      WITH counts AS (
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(string_split_regex(text, '\s+')) AS tok
          FROM documents)
        GROUP BY tok ORDER BY c DESC, tok LIMIT 100),
      ranked AS (
        SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY c DESC, tok)
                 AS DOUBLE)) * 1e9) AS BIGINT) AS x,
               CAST(floor(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT) AS y
        FROM counts),
      terms AS (
        SELECT x, y,
               CAST(floor(CAST(x AS DOUBLE) * y / 1e9) AS BIGINT) AS xy,
               CAST(floor(CAST(x AS DOUBLE) * x / 1e9) AS BIGINT) AS xx
        FROM ranked),
      s AS (
        SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy, CAST(sum(xy) AS BIGINT) AS sxy,
               CAST(sum(xx) AS BIGINT) AS sxx
        FROM terms)
      SELECT n,
             round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / 1e9)
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / 1e9),
                   6) AS zipf_slope
      FROM s
    """.trim))

  /** HyperLogLog distinct-cardinality sketch — the third leg of the
    * sketch family ([[graft.operators.Bloom]] membership,
    * [[Sketches]] frequency, this cardinality), sized at the problem
    * the others can't answer: "how many DISTINCT 5-gram shingles per
    * source" (the vocab/dedup-index sizing input) without a distinct
    * aggregate over the full shingle stream. Per source, 256
    * registers hold the max leading-zero rank of the second md5
    * chunk, bucketed by the first chunk mod 256; the harmonic-mean
    * estimate reads ONLY that 256-row state, and duplicate insertions
    * are free by construction (max is idempotent), so the input needs
    * no per-doc dedup pass. The register table IS the mergeable
    * sketch state — the `_ALL_` row merges the per-source registers
    * (max per register), never re-scanning the corpus: exactly how a
    * 1000-executor rollup or cross-day union combines partials. All
    * sketch arithmetic is integer (md5 chunks, a 32-branch rank CASE,
    * dyadic sums scaled by 2^40 so the harmonic sum is an exact
    * BIGINT); the one double division happens at the end on identical
    * expression text in both engines, and the signed error lands as a
    * floor'd integer ppm. No small-range correction (no ln): the raw
    * estimator is the contract and the exact count sits beside it. */
  val qSketchHll: Q = {
    val m = Sketches.HllM
    val rankCase = Sketches.HllRankCaseSql
    val estExpr = Sketches.HllEstSql
    Q(
      "q_sketch_hll",
      (spark, dir) => {
        // the registered BUILD STEP of the HLL register artifact
        // (operators/HllArtifact.scala): pays the shingle explode +
        // md5 + register aggregate + parquet write once; the overlap
        // query consumes the written registers. The exact countDistinct
        // side (this sketch's error grading) stays here.
        graft.operators.HllArtifact.materialize(spark, dir)
        val sh = Tables.documents(spark, dir)
          .select(col("source"),
            explode(TextAnalysis.shingles(col("text"))).as("sh"))
        val bySource = graft.operators.HllArtifact.registers(spark, dir)
        val est = Sketches.hllEstimate(
          bySource.unionByName(Sketches.hllMerge(bySource, "_ALL_")))
          .withColumnRenamed("g", "source")
        val exact = sh.groupBy(col("source"))
          .agg(countDistinct(col("sh")).as("n_exact"))
          .unionByName(sh.agg(countDistinct(col("sh")).as("n_exact"))
            .select(lit("_ALL_").as("source"), col("n_exact")))
        exact.join(est, "source")
          .select(col("source"), col("n_exact"),
            // floor'd milli-units, not round(,3): decimal rounding of
            // a double ties differently across engines; floor is
            // unambiguous on the bit-identical est_raw
            floor(col("est_raw") * 1000).cast("long").as("hll_est_milli"),
            floor((col("est_raw") / col("n_exact") - 1) * 1000000)
              .cast("long").as("err_ppm"))
          .orderBy(col("source"))
      },
      Some(s"""
      WITH toks AS (
        SELECT source, string_split_regex(text, '\\s+') AS tl FROM documents),
      shg AS (
        SELECT source, unnest(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)]) AS sh
        FROM toks WHERE len(tl) >= 5),
      hx0 AS (SELECT source, md5(sh) AS hx FROM shg),
      ch AS (
        SELECT source, ${DedupQueries.chunkSql(0)} % $m AS idx,
               ${DedupQueries.chunkSql(1)} AS c1
        FROM hx0),
      bg AS (
        SELECT source, idx, max($rankCase) AS mr
        FROM ch GROUP BY source, idx),
      regs AS (
        SELECT source, idx, mr FROM bg
        UNION ALL
        SELECT '_ALL_' AS source, idx, max(mr) AS mr
        FROM bg GROUP BY idx),
      sc AS (
        SELECT source,
               CAST(sum(CAST(pow(2, 40 - mr) AS BIGINT)) AS BIGINT)
                 + ($m - count(*)) * 1099511627776 AS s
        FROM regs GROUP BY source),
      er AS (SELECT source, $estExpr AS est_raw FROM sc),
      ex AS (
        SELECT source, count(DISTINCT sh) AS n_exact
        FROM shg GROUP BY source
        UNION ALL
        SELECT '_ALL_', count(DISTINCT sh) FROM shg)
      SELECT x.source, x.n_exact,
             CAST(floor(e.est_raw * 1000) AS BIGINT) AS hll_est_milli,
             CAST(floor((e.est_raw / x.n_exact - 1) * 1000000) AS BIGINT)
               AS err_ppm
      FROM ex x JOIN er e USING (source)
      ORDER BY source
    """.trim))
  }

  /** Mergeable quantile sketch — the fourth sketch ([[Sketches]]
    * membership/frequency/cardinality and now quantiles): a
    * deterministic bottom-k-by-md5 (KMV-style) uniform sample of 512
    * event values per event type, with p50/p90/p99 read off the
    * sorted sample by pure integer index selection (no
    * interpolation). The `_ALL_` row is produced by RE-SAMPLING the
    * union of the per-type samples under the same hash
    * ([[Sketches.bottomKResample]]) — never by touching the input
    * again, which is how per-shard partials roll up on a cluster; the
    * merge plans as a distributed TakeOrderedAndProject, not a
    * single-partition window. Graded against exact discrete quantiles
    * computed from a value histogram whose cumsum window is bounded
    * by the CENTS DOMAIN (distinct integer cents), not the row count,
    * so even the exact gauge survives scale. Everything is integer
    * cents end to end — both engines must select identical elements,
    * making the sample mechanics, the merge, and the index arithmetic
    * all hash-checked. */
  val qSketchQuantile: Q = {
    val k = 512
    val pbps = Seq(5000, 9000, 9900)
    val pbpList = pbps.mkString("[", ", ", "]")
    Q(
      "q_sketch_quantile",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.events(spark, dir)
          .select(col("event_type").as("g"),
            col("event_id").cast("string").as("id"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
        val perType = Sketches.bottomKSample(
          base, col("id"), col("v"), col("g"), k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val samples = perType.unionByName(
          Sketches.bottomKResample(perType, "_ALL_", k))
        val est = Sketches.sampleDiscQuantiles(samples, pbps)
        val fb = base.select(col("g"), col("v"))
          .unionByName(base.select(lit("_ALL_").as("g"), col("v")))
        val cum = fb.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
          .withColumn("cum",
            sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("v"))))
        val wanted = fb.groupBy(col("g")).agg(count(lit(1)).as("n"))
          .select(col("g"), col("n"),
            explode(array(pbps.map(p => lit(p)): _*)).as("pbp"))
          .withColumn("idx", expr("((n - 1) * pbp) div 10000 + 1"))
        val exact = cum.join(wanted, "g")
          .filter(col("cum") >= col("idx"))
          .groupBy(col("g"), col("pbp")).agg(min(col("v")).as("exact_cents"))
        est.join(exact, Seq("g", "pbp"))
          .select(col("g").as("event_type"), col("pbp").cast("long").as("pbp"),
            col("est").as("est_cents"), col("exact_cents"),
            (col("est") - col("exact_cents")).as("err_cents"))
          .orderBy(col("event_type"), col("pbp"))
      },
      Some(s"""
      WITH base AS (
        SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events),
      samp AS (
        SELECT g, id, v FROM (
          SELECT g, id, v,
                 row_number() OVER (PARTITION BY g ORDER BY md5(id), id) AS rn
          FROM base)
        WHERE rn <= $k),
      merged AS (
        SELECT '_ALL_' AS g, id, v FROM (
          SELECT id, v, row_number() OVER (ORDER BY md5(id), id) AS rn
          FROM samp)
        WHERE rn <= $k),
      s2 AS (SELECT g, id, v FROM samp UNION ALL SELECT g, id, v FROM merged),
      ranked AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn
        FROM s2),
      wanted AS (
        SELECT g, pbp, ((count(*) - 1) * pbp) // 10000 + 1 AS rn
        FROM s2, (SELECT unnest($pbpList) AS pbp) GROUP BY g, pbp),
      est AS (
        SELECT w.g, w.pbp, r.v AS est_cents
        FROM wanted w JOIN ranked r USING (g, rn)),
      fb AS (
        SELECT g, v FROM base UNION ALL SELECT '_ALL_', v FROM base),
      cum AS (
        SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) AS cum FROM (
          SELECT g, v, count(*) AS c FROM fb GROUP BY g, v)),
      wf AS (
        SELECT g, pbp, ((count(*) - 1) * pbp) // 10000 + 1 AS idx
        FROM fb, (SELECT unnest($pbpList) AS pbp) GROUP BY g, pbp),
      exact AS (
        SELECT c.g, w.pbp, min(c.v) AS exact_cents
        FROM cum c JOIN wf w ON c.g = w.g AND c.cum >= w.idx
        GROUP BY c.g, w.pbp)
      SELECT e.g AS event_type, CAST(e.pbp AS BIGINT) AS pbp, e.est_cents,
             x.exact_cents, e.est_cents - x.exact_cents AS err_cents
      FROM est e JOIN exact x ON e.g = x.g AND e.pbp = x.pbp
      ORDER BY event_type, pbp
    """.trim))
  }

  /** Approximate query processing off the KMV sample — the BlinkDB
    * pattern: answer `SUM(value) GROUP BY type` from the
    * deterministic 512-row bottom-k sample
    * ([[Sketches.bottomKSample]] — uniform because the md5 rank is
    * independent of the value) scaled by n/k, beside the exact
    * answer and the signed error in integer ppm. Everything is
    * integer cents and integer index arithmetic (`est = sample_sum ·
    * n div k`), so both engines derive identical estimates — the
    * correctness contract is the SAMPLE MECHANICS, while the ppm
    * column measures estimator quality honestly. At 100 TB the
    * sample is the only thing re-read per exploratory query; the
    * exact side here exists to grade it. */
  val qAqpSum: Q = {
    val k = 512
    Q(
      "q_aqp_sum",
      (spark, dir) => {
        val base = Tables.events(spark, dir)
          .select(col("event_type").as("g"),
            col("event_id").cast("string").as("id"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
        val counts = base.groupBy(col("g")).agg(
          count(lit(1)).as("n_total"),
          sum(col("v")).as("exact_cents"))
        val samp = Sketches.bottomKSample(base, col("id"), col("v"), col("g"), k)
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_samp"), sum(col("v")).as("samp_cents"))
        counts.join(samp, "g")
          .select(col("g").as("event_type"), col("n_total"), col("n_samp"),
            expr("samp_cents * n_total div n_samp").as("est_cents"),
            col("exact_cents"),
            expr("(samp_cents * n_total div n_samp - exact_cents) * 1000000"
              + " div exact_cents").as("err_ppm"))
          .orderBy(col("event_type"))
      },
      Some(s"""
      WITH base AS (
        SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events),
      cnts AS (
        SELECT g, count(*) AS n_total,
               CAST(sum(v) AS BIGINT) AS exact_cents
        FROM base GROUP BY g),
      samp AS (
        SELECT g, count(*) AS n_samp, CAST(sum(v) AS BIGINT) AS samp_cents
        FROM (
          SELECT g, v, row_number() OVER (PARTITION BY g
                   ORDER BY md5(id), id) AS rn
          FROM base)
        WHERE rn <= $k GROUP BY g)
      SELECT g AS event_type, n_total, n_samp,
             samp_cents * n_total // n_samp AS est_cents,
             exact_cents,
             (samp_cents * n_total // n_samp - exact_cents) * 1000000
               // exact_cents AS err_ppm
      FROM cnts JOIN samp USING (g)
      ORDER BY event_type
    """.trim))
  }

  /** HLL sketch ALGEBRA — cross-source vocabulary overlap by
    * inclusion-exclusion over merged registers: |A∩B| ≈ est(A) +
    * est(B) − est(A∪B), where the union estimate comes from
    * register-wise max of the two per-source sketches and never
    * re-touches the corpus. This is the measurement exact distinct
    * cannot deliver at 100 TB (a distinct-intersection per source
    * pair is a corpus-wide shuffle each; the sketch version is 190
    * pairs × 256 registers of pure arithmetic). All register math is
    * integer; the three estimates divide once each on identical
    * expression text, and the intersection lands as floor'd
    * milli-units. Top-10 most-overlapping pairs. Negative estimates
    * are possible for disjoint sources (inclusion-exclusion noise) —
    * reported honestly, not clamped. */
  val qSketchHllOverlap: Q = {
    val m = Sketches.HllM
    val rankCase = Sketches.HllRankCaseSql
    val estExpr = Sketches.HllEstSql
    Q(
      "q_sketch_hll_overlap",
      (spark, dir) => {
        // pure register algebra over the materialized HLL artifact
        // (built/priced by q_sketch_hll, lazily rebuilt if absent) —
        // no corpus re-scan anywhere in this query
        val regs = graft.operators.HllArtifact.registers(spark, dir)
        val singles = Sketches.hllEstimate(regs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val srcs = regs.select(col("g")).distinct()
        val pairs = srcs.as("a").join(srcs.as("b"), col("a.g") < col("b.g"))
          .select(col("a.g").as("pa"), col("b.g").as("pb"))
        val unionRegs = pairs.join(regs,
            col("g") === col("pa") || col("g") === col("pb"))
          .groupBy(col("pa"), col("pb"), col("idx"))
          .agg(max(col("mr")).as("mr"))
        val unionEst = Sketches.hllEstimate(
          unionRegs.select(concat(col("pa"), lit("|"), col("pb")).as("g"),
            col("idx"), col("mr")))
          .select(split(col("g"), "\\|").getItem(0).as("pa"),
            split(col("g"), "\\|").getItem(1).as("pb"),
            col("est_raw").as("est_u"))
        unionEst
          .join(singles.select(col("g").as("pa"), col("est_raw").as("est_a")),
            "pa")
          .join(singles.select(col("g").as("pb"), col("est_raw").as("est_b")),
            "pb")
          .select(col("pa"), col("pb"),
            floor(col("est_a") * 1000).cast("long").as("est_a_milli"),
            floor(col("est_b") * 1000).cast("long").as("est_b_milli"),
            floor(col("est_u") * 1000).cast("long").as("est_union_milli"),
            floor((col("est_a") + col("est_b") - col("est_u")) * 1000)
              .cast("long").as("est_inter_milli"))
          .orderBy(col("est_inter_milli").desc, col("pa"), col("pb"))
          .limit(10)
      },
      Some(s"""
      WITH toks AS (
        SELECT source, string_split_regex(text, '\\s+') AS tl FROM documents),
      shg AS (
        SELECT source, unnest(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)]) AS sh
        FROM toks WHERE len(tl) >= 5),
      hx0 AS (SELECT source, md5(sh) AS hx FROM shg),
      ch AS (
        SELECT source, ${DedupQueries.chunkSql(0)} % $m AS idx,
               ${DedupQueries.chunkSql(1)} AS c1
        FROM hx0),
      bg AS (
        SELECT source, idx, max($rankCase) AS mr
        FROM ch GROUP BY source, idx),
      sgl AS (
        SELECT source, $estExpr AS est_raw FROM (
          SELECT source,
                 CAST(sum(CAST(pow(2, 40 - mr) AS BIGINT)) AS BIGINT)
                   + ($m - count(*)) * 1099511627776 AS s
          FROM bg GROUP BY source)),
      prs AS (
        SELECT a.source AS pa, b.source AS pb
        FROM (SELECT DISTINCT source FROM bg) a
        JOIN (SELECT DISTINCT source FROM bg) b ON a.source < b.source),
      ur AS (
        SELECT p.pa, p.pb, g.idx, max(g.mr) AS mr
        FROM prs p JOIN bg g ON g.source = p.pa OR g.source = p.pb
        GROUP BY p.pa, p.pb, g.idx),
      ue AS (
        SELECT pa, pb, $estExpr AS est_u FROM (
          SELECT pa, pb,
                 CAST(sum(CAST(pow(2, 40 - mr) AS BIGINT)) AS BIGINT)
                   + ($m - count(*)) * 1099511627776 AS s
          FROM ur GROUP BY pa, pb))
      SELECT u.pa, u.pb,
             CAST(floor(a.est_raw * 1000) AS BIGINT) AS est_a_milli,
             CAST(floor(b.est_raw * 1000) AS BIGINT) AS est_b_milli,
             CAST(floor(u.est_u * 1000) AS BIGINT) AS est_union_milli,
             CAST(floor((a.est_raw + b.est_raw - u.est_u) * 1000) AS BIGINT)
               AS est_inter_milli
      FROM ue u
      JOIN sgl a ON a.source = u.pa
      JOIN sgl b ON b.source = u.pb
      ORDER BY est_inter_milli DESC, u.pa, u.pb
      LIMIT 10
    """.trim))
  }

  /** Priority sampling (Duffield-Lund-Thorup) — the weighted
    * complement of [[qAqpSum]]'s uniform bottom-k: ONE k-row sample
    * taken by priority w/u answers ANY later subset-sum question with
    * the est = Σ max(w, τ) estimator (τ = the (k+1)-th priority), and
    * heavy rows are kept with probability → 1, so heavy-tailed totals
    * estimate far tighter than uniform rows allow. The top-(k+1)
    * selection is `orderBy().limit()` — a distributed
    * TakeOrderedAndProject, per-partition top-k plus a tiny merge,
    * exactly the [[Sketches.bottomKResample]] discipline — and the
    * one window ranks the ≤513-row survivor set, bounded by
    * construction. The estimator sum stays deterministic by
    * splitting: Σ max(w,τ) = Σ_{w>τ} w (exact integer) + count·τ (one
    * double product) — never a float accumulation. Priorities are
    * double quotients of exact integers on identical expression
    * trees; ties break by id. Per-type signed error lands beside the
    * uniform sampler's for the head-to-head read. */
  val qSamplePriority: Q = {
    val k = 512
    Q(
      "q_sample_priority",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.events(spark, dir)
          .select(col("event_type").as("g"),
            col("event_id").cast("string").as("id"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("w"))
        val pri = base
          .withColumn("bp", Sampling.hashBasisPoints(col("id")))
          .withColumn("p", col("w").cast("double")
            / ((col("bp").cast("double") + lit(0.5)) / lit(10000.0)))
        val top = pri.orderBy(col("p").desc, col("id")).limit(k + 1)
        val ranked = top.withColumn("rn",
          row_number().over(Window.orderBy(col("p").desc, col("id"))))
          .persist()
        val tau = ranked.filter(col("rn") === k + 1)
          .select(col("p").as("tau"))
        val samp = ranked.filter(col("rn") <= k)
          .crossJoin(broadcast(tau))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_samp"),
            sum(when(col("w").cast("double") > col("tau"), col("w"))
              .otherwise(0L)).as("sum_big"),
            sum(when(col("w").cast("double") <= col("tau"), 1L)
              .otherwise(0L)).as("n_small"))
        val totals = base.groupBy(col("g"))
          .agg(count(lit(1)).as("n_total"), sum(col("w")).as("exact_cents"))
        totals.join(samp, "g").crossJoin(broadcast(tau))
          .select(col("g"), col("n_total"), col("exact_cents"),
            col("n_samp"),
            floor(col("sum_big").cast("double")
              + col("n_small").cast("double") * col("tau")).cast("long")
              .as("est_cents"))
          .select(col("g").as("event_type"), col("n_total"),
            col("exact_cents"), col("n_samp"), col("est_cents"),
            expr("(est_cents - exact_cents) * 1000000 div exact_cents")
              .as("err_ppm"))
          .orderBy(col("event_type"))
      },
      Some(s"""
      WITH base AS (
        SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS w
        FROM events),
      pri AS (
        SELECT g, id, w,
               CAST(w AS DOUBLE) / ((bp + 0.5) / 10000.0) AS p
        FROM (SELECT g, id, w, ${AnalyticsQueries.bpSql("id")} AS bp
              FROM base)),
      top AS (
        SELECT g, id, w, p FROM pri ORDER BY p DESC, id LIMIT ${k + 1}),
      ranked AS (
        SELECT g, w, p,
               row_number() OVER (ORDER BY p DESC, id) AS rn
        FROM top),
      tau AS (SELECT p AS tau FROM ranked WHERE rn = ${k + 1}),
      samp AS (
        SELECT g, count(*) AS n_samp,
               CAST(sum(CASE WHEN CAST(w AS DOUBLE) > tau THEN w ELSE 0 END)
                 AS BIGINT) AS sum_big,
               CAST(sum(CASE WHEN CAST(w AS DOUBLE) <= tau THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_small
        FROM ranked, tau WHERE rn <= $k GROUP BY g),
      tot AS (
        SELECT g, count(*) AS n_total, CAST(sum(w) AS BIGINT) AS exact_cents
        FROM base GROUP BY g),
      est AS (
        SELECT g, n_total, exact_cents, n_samp,
               CAST(floor(CAST(sum_big AS DOUBLE)
                 + CAST(n_small AS DOUBLE) * tau) AS BIGINT) AS est_cents
        FROM tot JOIN samp USING (g), tau)
      SELECT g AS event_type, n_total, exact_cents, n_samp, est_cents,
             (est_cents - exact_cents) * 1000000 // exact_cents AS err_ppm
      FROM est ORDER BY event_type
    """.trim))
  }

  /** Domain-mixture reweighting to a UNIFORM token target — the
    * "don't let the biggest crawl dominate the epoch" step: each
    * source's sampling weight is target_share / current_share in
    * exact ppm (weight > 10⁶ ⇒ oversample/repeat, < 10⁶ ⇒
    * downsample), and the effective-token column verifies the
    * reweighted epoch is balanced (every source lands ≈ total/k).
    * One corpus pass (the per-source token aggregate); 128-bit
    * integer arithmetic so the ppm weights are exact at any corpus
    * size (token totals × 10⁶ overflow BIGINT near 10¹³ tokens —
    * exactly the regime this targets). */
  val qMixtureReweight: Q = Q(
    "q_mixture_reweight",
    (spark, dir) => {
      val per = Tables.documents(spark, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("t_tokens"),
        count(lit(1)).as("n_sources"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("cast(n_tokens as decimal(38,0)) * 1000000 div t_tokens")
            .as("share_ppm"),
          expr("cast(t_tokens as decimal(38,0)) * 1000000" +
            " div (n_sources * n_tokens)").as("weight_ppm"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("share_ppm"), col("weight_ppm"),
          expr("cast(n_tokens as decimal(38,0)) * weight_ppm div 1000000")
            .as("eff_tokens"))
        .orderBy(col("source"))
    },
    Some("""
      WITH per AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
                 AS n_tokens
        FROM documents GROUP BY source),
      tot AS (
        SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens,
               CAST(count(*) AS BIGINT) AS n_sources
        FROM per)
      SELECT source, n_docs, n_tokens,
             CAST(CAST(n_tokens AS HUGEINT) * 1000000 // t_tokens AS BIGINT)
               AS share_ppm,
             CAST(CAST(t_tokens AS HUGEINT) * 1000000
               // (n_sources * n_tokens) AS BIGINT) AS weight_ppm,
             CAST(CAST(n_tokens AS HUGEINT)
               * (CAST(t_tokens AS HUGEINT) * 1000000
                  // (n_sources * n_tokens)) // 1000000 AS BIGINT)
               AS eff_tokens
      FROM per, tot ORDER BY source
    """.trim))

  /** Boundary-RESPECTING sequence packing — the alternative to the
    * concat-and-chunk layout `q_pack_chunks`/`q_chunk_boundaries`
    * audit: no document is ever split across windows, so straddling
    * disappears and the cost moves to PADDING (part of each window's
    * 2048-token capacity goes unused). Documents are hash-assigned to
    * 8 independent shards; within a shard the window count is fixed
    * at the lower bound K = ceil(total_tokens / capacity), docs are
    * sorted by token count descending and dealt into the K windows in
    * FOLDED (serpentine/zigzag) stripes — stripe 0 fills windows
    * 0→K-1, stripe 1 fills K-1→0 — the one-pass distributed
    * approximation of Graham's LPT bin balancing (big docs spread
    * first, consecutive stripes cancel each other's imbalance). Per
    * shard: K, the load spread (min/max window load), total padding
    * under max(cap, max_load)-sized windows, and the makespan ratio
    * vs capacity in milli (1000 = the packing fits the lower bound
    * exactly; >1000 = some window must overflow or the window count
    * must grow).
    *
    * Scale shape: one scan computing per-doc token counts in-row, an
    * 8-row per-shard total (broadcast back — at 100 TB the shard
    * count rises with the corpus and this stays a tiny dimension
    * join), one rank window per shard, one per-(shard,window)
    * aggregate, one per-shard rollup. Everything downstream of the
    * scan moves O(shards + windows) rows, never O(docs); ties break
    * on doc_id so the layout is a total order replayed exactly by the
    * oracle. */
  val qSeqPack: Q = {
    val cap = 2048
    Q(
      "q_seq_pack",
      (spark, dir) => {
        val d = Tables.documents(spark, dir)
          .select(col("doc_id"),
            pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 1),
              16, 10).cast("long"), lit(8L)).as("shard"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        val totals = d.groupBy(col("shard"))
          .agg(sum(col("n_tokens")).as("total_tokens"),
            count(lit(1)).as("n_docs"))
          .withColumn("k", expr(s"(total_tokens + ${cap - 1}) div $cap"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("n_tokens").desc, col("doc_id"))
        val loads = d
          .join(broadcast(totals.select(col("shard"), col("k"))), "shard")
          .withColumn("r", row_number().over(w) - 1)
          .withColumn("win",
            expr("CASE WHEN (r div k) % 2 = 0 THEN r % k" +
              " ELSE k - 1 - (r % k) END"))
          .groupBy(col("shard"), col("win"))
          .agg(sum(col("n_tokens")).as("load"))
        loads.groupBy(col("shard"))
          .agg(count(lit(1)).as("n_windows"),
            min(col("load")).as("min_load"), max(col("load")).as("max_load"),
            sum(greatest(lit(cap.toLong) - col("load"), lit(0L)))
              .as("padding_tokens"))
          .join(broadcast(totals.select(col("shard"), col("n_docs"),
            col("total_tokens"))), "shard")
          .select(col("shard"), col("n_docs"), col("total_tokens"),
            col("n_windows"), col("min_load"), col("max_load"),
            col("padding_tokens"),
            expr(s"cast(max_load * 1000 div $cap as bigint)")
              .as("makespan_milli"))
          .orderBy(col("shard"))
      },
      Some(s"""
      WITH d AS (
        SELECT doc_id,
               (strpos('0123456789abcdef',
                  substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
                 AS shard,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents),
      t AS (
        SELECT shard, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(*) AS n_docs,
               CAST((sum(n_tokens) + ${cap - 1}) // $cap AS BIGINT) AS k
        FROM d GROUP BY shard),
      ranked AS (
        SELECT d.shard, d.n_tokens, t.k,
               row_number() OVER (PARTITION BY d.shard
                 ORDER BY d.n_tokens DESC, d.doc_id) - 1 AS r
        FROM d JOIN t USING (shard)),
      assigned AS (
        SELECT shard, n_tokens,
               CASE WHEN (r // k) % 2 = 0 THEN r % k
                    ELSE k - 1 - (r % k) END AS win
        FROM ranked),
      loads AS (
        SELECT shard, win, CAST(sum(n_tokens) AS BIGINT) AS load
        FROM assigned GROUP BY shard, win),
      g AS (
        SELECT shard, count(*) AS n_windows,
               min(load) AS min_load, max(load) AS max_load,
               CAST(sum(greatest($cap - load, 0)) AS BIGINT)
                 AS padding_tokens
        FROM loads GROUP BY shard)
      SELECT shard, n_docs, total_tokens, n_windows, min_load, max_load,
             padding_tokens,
             CAST(max_load * 1000 // $cap AS BIGINT) AS makespan_milli
      FROM g JOIN t USING (shard)
      ORDER BY shard
    """.trim))
  }

  /** Shared DSIR bucket-ratio CTE chain (engine-portable md5-bucket
    * hashed-unigram counts, add-one-smoothed target/raw importance
    * ratios in exact ppm). Target distribution = English documents;
    * raw = the whole corpus — the Data Selection via Importance
    * Resampling setup (Xie et al. 2023) with hashed n-gram features.
    * Log-free by design (see `q_text_lm_score`): transcendental `ln`
    * is not correctly-rounded across engines, so the per-bucket
    * importance is the exact RATIO in ppm and per-document scores are
    * ratio means, a monotone surrogate of the geometric-mean
    * likelihood ratio that both engines replay bit-for-bit. */
  private val dsirB = graft.operators.Dsir.B
  private val dsirRatioCte: String = s"""
      WITH tk AS (
        SELECT doc_id, source, lang, token FROM (
          SELECT doc_id, source, lang,
                 unnest(string_split_regex(text, '\\s+')) AS token
          FROM documents)
        WHERE token <> ''),
      bk AS (
        SELECT doc_id, source, ${DedupQueries.chunkSql(0)} % $dsirB AS bucket,
               lang = 'en' AS is_t
        FROM (SELECT doc_id, source, lang, md5(token) AS hx FROM tk)),
      cnt0 AS (
        SELECT bucket,
               CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(count(*) AS BIGINT) AS n_r
        FROM bk GROUP BY bucket),
      cnt AS ( -- dense over all B buckets, matching Dsir.bucketRatios
        SELECT CAST(r.range AS BIGINT) AS bucket,
               CAST(coalesce(c.n_t, 0) AS BIGINT) AS n_t,
               CAST(coalesce(c.n_r, 0) AS BIGINT) AS n_r
        FROM range($dsirB) r LEFT JOIN cnt0 c ON r.range = c.bucket),
      tot AS (
        SELECT CAST(sum(n_t) AS BIGINT) AS cap_t,
               CAST(sum(n_r) AS BIGINT) AS cap_r
        FROM cnt),
      ratio AS (
        SELECT bucket, n_t, n_r,
               CAST(CAST(n_t + 1 AS HUGEINT) * (cap_r + $dsirB) * 1000000
                 // (CAST(n_r + 1 AS HUGEINT) * (cap_t + $dsirB)) AS BIGINT)
                 AS ratio_ppm
        FROM cnt, tot)"""

  /** Engine-side DSIR bucket-ratio table — the operator core lives in
    * [[graft.operators.Dsir]] (shared with the streaming serving
    * path); this wrapper just binds it to the tables dir. */
  private def dsirRatios(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val toks = graft.operators.Dsir.tokenBuckets(Tables.documents(spark, dir))
    (toks, graft.operators.Dsir.bucketRatios(toks))
  }

  /** DSIR importance model — the 20 most target-discriminative hashed
    * feature buckets: per-bucket target/raw counts and the
    * add-one-smoothed importance ratio in exact ppm
    * (`(n_t+1)(N_r+B)·10⁶ ÷ (n_r+1)(N_t+B)`, 128-bit products — the
    * cross terms reach ~10³² at 10¹³ tokens, far past BIGINT but
    * inside DECIMAL(38)/HUGEINT).
    *
    * Scale: one token scan feeding a B=256-bucket hash aggregate with
    * map-side partials (the hashing trick: constant feature width, no
    * vocabulary table — `q_feature_hash`'s property, reused as a
    * MODEL), one 1-row total broadcast back. Nothing downstream of
    * the scan moves more than B rows. */
  val qDsirScore: Q = Q(
    "q_dsir_score",
    (spark, dir) => {
      val (_, ratio) = dsirRatios(spark, dir)
      ratio.orderBy(col("ratio_ppm").desc, col("bucket")).limit(20)
    },
    Some(s"""$dsirRatioCte
      SELECT bucket, n_t, n_r, ratio_ppm
      FROM ratio ORDER BY ratio_ppm DESC, bucket LIMIT 20
    """.trim))

  /** DSIR importance RESAMPLING — apply the hashed-ngram importance
    * model and draw the resampled corpus: each document's score is
    * the exact mean bucket-ratio of its tokens (sum of BIGINT ppm
    * ratios in DECIMAL(38) — a 10⁶-token document of maximally
    * target-skewed buckets can reach ~10¹⁸, the BIGINT edge — then
    * one integer division), and acceptance is a deterministic
    * Bernoulli draw with probability score/score_max: keep iff
    * `u · s_max < score · 10⁶` where u is the doc's md5-uniform draw
    * in [0, 10⁶) — rejection sampling, every branch an exact integer
    * compare. Reports the per-source funnel: documents, mean score,
    * kept count, kept-score mass — the audit a mixture planner reads
    * before committing the resampled epoch.
    *
    * Scale: the B-row ratio table broadcasts to the token stream
    * (never a shuffle of the corpus by bucket); per-doc scores are
    * one hash aggregate keyed by doc; s_max is a 1-row broadcast;
    * the rollup is per-source. Two corpus token passes total (model,
    * scoring), both scan-shaped. */
  val qDsirResample: Q = Q(
    "q_dsir_resample",
    (spark, dir) => {
      val (toks, ratio) = dsirRatios(spark, dir)
      val perDoc = graft.operators.Dsir.scores(toks, ratio)
      val smax = perDoc.agg(max(col("score_ppm")).as("s_max"))
      val drawn = perDoc.crossJoin(broadcast(smax))
        .select(col("source"), col("score_ppm"),
          (pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
            16, 10).cast("long"), lit(1000000L))
            * col("s_max") < col("score_ppm") * lit(1000000L)).as("kept"))
      drawn.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(score_ppm) div count(1)").as("score_ppm_avg"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("score_ppm")).otherwise(0L))
            .as("kept_score_sum"))
        .orderBy(col("source"))
    },
    Some(s"""$dsirRatioCte,
      perdoc AS (
        SELECT b.doc_id, b.source, count(*) AS n_toks,
               CAST(sum(CAST(r.ratio_ppm AS HUGEINT)) AS HUGEINT) AS s_sum
        FROM bk b JOIN ratio r USING (bucket)
        GROUP BY b.doc_id, b.source),
      scored AS (
        SELECT doc_id, source,
               CAST(s_sum // n_toks AS BIGINT) AS score_ppm
        FROM perdoc),
      mx AS (SELECT max(score_ppm) AS s_max FROM scored),
      drawn AS (
        SELECT source, score_ppm,
               (${DedupQueries.chunkSql(0).replace("hx", "hu")} % 1000000)
                 * s_max < score_ppm * 1000000 AS kept
        FROM (SELECT doc_id, source, score_ppm,
                     md5(CAST(doc_id AS VARCHAR)) AS hu
              FROM scored), mx)
      SELECT source, count(*) AS n_docs,
             CAST(sum(score_ppm) // count(*) AS BIGINT) AS score_ppm_avg,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN kept THEN score_ppm ELSE 0 END) AS BIGINT)
               AS kept_score_sum
      FROM drawn GROUP BY source ORDER BY source
    """.trim))

  /** Budget-constrained DSIR selection — the step after scoring: each
    * source gets a token budget (half its token mass) and greedily
    * keeps its highest-importance documents until the budget is
    * spent (ties broken by doc_id, the total order both engines
    * replay). Reports the per-source funnel: docs, kept docs, kept
    * tokens vs budget, and the score floor (the lowest admitted
    * score — the threshold a production selector would freeze and
    * apply statelessly to the next crawl increment).
    *
    * Scale: the greedy prefix is a per-SOURCE ordered cumulative —
    * a partitioned window, never a global sort. At 100 TB a selector
    * would run this two-phase (score-histogram to find the threshold,
    * one filter pass to apply it — the same shape as the decile-edge
    * ranking in `q_psi_drift`); the direct window here IS the
    * semantics that phase pair implements. */
  val qDsirBudget: Q = Q(
    "q_dsir_budget",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (toks, ratio) = dsirRatios(spark, dir)
      val scored = graft.operators.Dsir.scores(toks, ratio)
      val budgets = scored.groupBy(col("source"))
        .agg(expr("sum(n_toks) div 2").as("budget_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
      scored
        .withColumn("cum", sum(col("n_toks")).over(w))
        .join(broadcast(budgets), "source")
        .select(col("source"), col("budget_tokens"), col("n_toks"),
          col("score_ppm"), (col("cum") <= col("budget_tokens")).as("kept"))
        .groupBy(col("source"), col("budget_tokens"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_toks")).otherwise(0L))
            .as("kept_tokens"),
          min(when(col("kept"), col("score_ppm"))).as("score_floor_ppm"))
        .orderBy(col("source"))
    },
    Some(s"""$dsirRatioCte,
      perdoc AS (
        SELECT b.doc_id, b.source, count(*) AS n_toks,
               CAST(sum(CAST(r.ratio_ppm AS HUGEINT)) AS HUGEINT) AS s_sum
        FROM bk b JOIN ratio r USING (bucket)
        GROUP BY b.doc_id, b.source),
      scored AS (
        SELECT doc_id, source, n_toks,
               CAST(s_sum // n_toks AS BIGINT) AS score_ppm
        FROM perdoc),
      budgets AS (
        SELECT source, CAST(sum(n_toks) // 2 AS BIGINT) AS budget_tokens
        FROM scored GROUP BY source),
      ranked AS (
        SELECT source, n_toks, score_ppm,
               sum(n_toks) OVER (PARTITION BY source
                 ORDER BY score_ppm DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM scored)
      SELECT r.source, b.budget_tokens, count(*) AS n_docs,
             CAST(sum(CASE WHEN cum <= b.budget_tokens THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN cum <= b.budget_tokens THEN n_toks ELSE 0 END)
               AS BIGINT) AS kept_tokens,
             CAST(min(CASE WHEN cum <= b.budget_tokens THEN score_ppm END)
               AS BIGINT) AS score_floor_ppm
      FROM ranked r JOIN budgets b USING (source)
      GROUP BY r.source, b.budget_tokens ORDER BY r.source
    """.trim))

  /** Exact substring dedup at SPAN granularity — the production form
    * of the public "deduplicating training data" result:
    * `q_dedup_substring` reports a duplicated-10-gram FRACTION per
    * doc; this emits the per-doc REMOVE-SPAN manifest a trim pass
    * actually applies. A position's 10-gram is duplicated when it
    * also appears in at least one OTHER document; duplicated
    * positions whose covered 10-token intervals overlap or abut merge
    * into one span (a new island only when the position gap exceeds
    * 10 — lag + running break-flag sum, NOT the plain pos-minus-rank
    * trick, which would emit overlapping spans for gaps 1..9),
    * reported as token offsets `[span_start, span_end]` (span_end =
    * last duplicated position + 9, the end of its 10-gram).
    *
    * Scale shape: the df table is one aggregate on the shingle key
    * and the dup filter is a window over the SAME single exchange —
    * no pair generation anywhere (linear in total shingle
    * occurrences, like `q_dedup_substring`); the island window is
    * per-doc. DedupSpansSpec pins exact adjacent-shingle merging. */
  val qDedupSubstringSpans: Q = Q(
    "q_dedup_substring_spans",
    (spark, dir) => Dedup
      .duplicatedSpans(Tables.documents(spark, dir), n = 10, minDf = 2)
      .orderBy(col("doc_id"), col("span_start")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      ix AS (
        SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 9)) AS i
        FROM toks WHERE len(tl) >= 10),
      pos AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               array_to_string(tl[i:i+9], ' ') AS shingle
        FROM ix),
      dft AS (
        SELECT shingle, count(DISTINCT doc_id) AS df FROM pos
        GROUP BY shingle),
      dup AS (
        SELECT p.doc_id, p.pos FROM pos p JOIN dft d USING (shingle)
        WHERE d.df >= 2),
      brks AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER
                   (PARTITION BY doc_id ORDER BY pos) > 10
                 THEN 1 ELSE 0 END AS brk
        FROM dup),
      runs AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS isl
        FROM brks)
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + 9 AS BIGINT) AS span_end,
             CAST(count(*) AS BIGINT) AS n_shingles
      FROM runs GROUP BY doc_id, isl
      ORDER BY doc_id, span_start
    """.trim))

  /** APPLY the remove-span manifest — the trim pass itself, priced:
    * per source, how many docs get trimmed and what token share the
    * spans remove (`removed_ppm`, exact integer). Spans of one doc
    * are disjoint by construction, so removed tokens = Σ (end − start
    * + 1) with no interval union needed. This is the number a corpus
    * owner reads to decide whether substring dedup is worth a
    * re-shard: one spans pass + one token-count pass, joined on
    * doc_id, then a ≤|sources|-row rollup. */
  val qDedupSubstringApply: Q = Q(
    "q_dedup_substring_apply",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val removed = Dedup.duplicatedSpans(docs, n = 10, minDf = 2)
        .groupBy(col("doc_id"))
        .agg(sum(col("span_end") - col("span_start") + 1).as("removed"))
      docs.select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .join(removed, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("removed") > 0, 1L).otherwise(0L)).as("docs_trimmed"),
          sum(col("n_tokens")).as("tokens_total"),
          sum(coalesce(col("removed"), lit(0L))).as("tokens_removed"))
        .withColumn("removed_ppm",
          expr("tokens_removed * 1000000 div tokens_total"))
        .orderBy(col("source"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      ix AS (
        SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 9)) AS i
        FROM toks WHERE len(tl) >= 10),
      pos AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               array_to_string(tl[i:i+9], ' ') AS shingle
        FROM ix),
      dft AS (
        SELECT shingle, count(DISTINCT doc_id) AS df FROM pos
        GROUP BY shingle),
      dup AS (
        SELECT p.doc_id, p.pos FROM pos p JOIN dft d USING (shingle)
        WHERE d.df >= 2),
      brks AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER
                   (PARTITION BY doc_id ORDER BY pos) > 10
                 THEN 1 ELSE 0 END AS brk
        FROM dup),
      runs AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS isl
        FROM brks),
      spans AS (
        SELECT doc_id, min(pos) AS span_start, max(pos) + 9 AS span_end
        FROM runs GROUP BY doc_id, isl),
      rm AS (
        SELECT doc_id,
               CAST(sum(span_end - span_start + 1) AS BIGINT) AS removed
        FROM spans GROUP BY doc_id),
      base AS (
        SELECT d.doc_id, d.source,
               CAST(len(string_split_regex(d.text, '\s+')) AS BIGINT)
                 AS n_tokens,
               rm.removed
        FROM documents d LEFT JOIN rm ON rm.doc_id = d.doc_id)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_trimmed,
             CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
             CAST(sum(coalesce(removed, 0)) AS BIGINT) AS tokens_removed,
             CAST(sum(coalesce(removed, 0)) * 1000000 // sum(n_tokens)
               AS BIGINT) AS removed_ppm
      FROM base GROUP BY source ORDER BY source
    """.trim))

  /** Padding-waste audit for length-bucketed BATCHING — the other
    * half of the window-layout story: `q_seq_pack` packs documents
    * into fixed training windows; this prices the inference/eval-time
    * alternative of padding each sequence to its batch bucket's
    * width. Three public bucketing strategies over the per-doc token
    * count, all computed in one scan:
    *   - `pow2`   — pad to the next power of two (dynamic-shape
    *                bucketing as deployed by XLA-style compilers);
    *   - `lin64`  — pad to the next multiple of 64 (fixed-stride
    *                buckets);
    *   - `max`    — pad every sequence to the corpus max (the naive
    *                single-shape batch).
    * Per strategy: total real tokens, total padded slots, the waste
    * share in exact ppm, and the bucket count (distinct shapes — the
    * recompilation cost axis). The `max` strategy needs the global
    * max: a 1-row aggregate broadcast back, never a global window.
    *
    * Scale shape: per-doc token counts ride one scan; each strategy is
    * an integer expression per row + one rollup; `n_buckets` is a
    * distinct over ≤ log2(maxlen) / (maxlen/64) values. */
  val qBatchPadWaste: Q = Q(
    "q_batch_pad_waste",
    (spark, dir) => {
      val d = Tables.documents(spark, dir)
        .select(TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      // next power of two ≥ n, integer-exact: 1 << bitlength(n-1).
      // (2^ceil(log2(n)) in doubles is a cross-engine hazard: a log
      // ratio that lands at 6.0000000000000005 ceils to 7.)
      val toks = d
        .withColumn("pow2",
          expr("case when n_tokens <= 1 then cast(1 as bigint) else " +
            "shiftleft(cast(1 as bigint), length(bin(n_tokens - 1))) end"))
        .withColumn("lin64", expr("((n_tokens + 63) div 64) * 64"))
      val mx = toks.agg(max(col("n_tokens")).as("mx"))
      val withMax = toks.crossJoin(broadcast(mx))
      withMax.select(
          expr("stack(3, 'pow2', pow2, 'lin64', lin64, 'max', mx)")
            .as(Seq("strategy", "padded")),
          col("n_tokens"))
        .groupBy(col("strategy"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          sum(col("padded")).as("padded_slots"),
          countDistinct(col("padded")).as("n_buckets"))
        .withColumn("waste_ppm",
          expr("(padded_slots - tokens) * 1000000 div padded_slots"))
        .orderBy(col("strategy"))
    },
    Some("""
      WITH d AS (
        SELECT CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents),
      t AS (
        SELECT n_tokens,
               CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
                    ELSE CAST(1 AS BIGINT) << length(bin(n_tokens - 1))
               END AS pow2,
               ((n_tokens + 63) // 64) * 64 AS lin64,
               (SELECT max(n_tokens) FROM d) AS mx
        FROM d),
      s AS (
        SELECT 'pow2' AS strategy, n_tokens, pow2 AS padded FROM t
        UNION ALL
        SELECT 'lin64', n_tokens, lin64 FROM t
        UNION ALL
        SELECT 'max', n_tokens, mx FROM t)
      SELECT strategy, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens,
             CAST(sum(padded) AS BIGINT) AS padded_slots,
             CAST(count(DISTINCT padded) AS BIGINT) AS n_buckets,
             CAST((sum(padded) - sum(n_tokens)) * 1000000
               // sum(padded) AS BIGINT) AS waste_ppm
      FROM s GROUP BY strategy ORDER BY strategy
    """.trim))

  /** Per-document PROVENANCE manifest — the data card a training job
    * (or an audit) reads for EVERY document, kept or dropped: source,
    * language, token mass, quality score, duplicate-cluster size, the
    * eval-contamination share, and the pipeline's verdict with the
    * FIRST failing rule as the drop reason (`q_corpus_prep` emits the
    * per-source rollup of the kept side; this emits the row-level
    * ledger including everything that fell out and WHY, in the
    * pipeline's precedence order: eval_source → low_quality →
    * duplicate → contaminated → kept). Later stages are never
    * evaluated for earlier drops — exactly like the pipeline —
    * so duplicate-cluster sizes exist only inside the quality-passing
    * pool and contamination only for dedup survivors. One scan for
    * scoring, one fp aggregate, one shingle pass over survivors
    * against the broadcast eval artifact; the manifest is
    * corpus-sized, written not collected. */
  val qProvenanceManifest: Q = Q(
    "q_provenance_manifest",
    (spark, dir) => {
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inPool = col("source") =!= "src0" && col("quality") >= 0.64
      val clusters = base.filter(inPool)
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("csize"), min(col("doc_id")).as("keep_id"))
      val withDup = base.join(clusters, Seq("fp"), "left")
      val evalSh = broadcast(graft.operators.EvalSetArtifact
        .shingles(spark, dir).withColumn("in_eval", lit(1L)))
      val contam = base.filter(inPool)
        .join(clusters, Seq("fp"))
        .filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id"),
          explode(array_distinct(TextAnalysis.shingles(col("text"))))
            .as("shingle"))
        .join(evalSh, Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("in_eval"), lit(0L))).as("n_contam"))
      withDup.join(contam, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
          col("quality"),
          when(inPool, col("csize")).otherwise(lit(0L))
            .as("dup_cluster_size"),
          when(inPool && col("doc_id") === col("keep_id"),
            expr("coalesce(n_contam, 0) * 1000000 div coalesce(n_sh, 1)"))
            .otherwise(lit(0L)).as("contam_ppm"),
          when(col("source") === "src0", lit("eval_source"))
            .when(col("quality") < 0.64, lit("low_quality"))
            .when(col("doc_id") =!= col("keep_id"), lit("duplicate"))
            .when(coalesce(col("n_contam"), lit(0L)).cast("double") /
              coalesce(col("n_sh"), lit(1L)) >= 0.5, lit("contaminated"))
            .otherwise(lit("kept")).as("status"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH base AS MATERIALIZED (
        SELECT doc_id, source, lang, text,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               round(least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.3 +
                     (1.0 - CAST(len(list_filter(toks, x -> x IN ('the', 'a')))
                        AS DOUBLE) / len(toks)) * 0.3 +
                     (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                       * 0.4,
                     6) AS quality,
               md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                 '\s+', ' ', 'g'))) AS fp
        FROM (SELECT doc_id, source, lang, text,
                     string_split_regex(text, '\s+') AS toks
              FROM documents)),
      clusters AS (
        SELECT fp, CAST(count(*) AS BIGINT) AS csize,
               min(doc_id) AS keep_id
        FROM base WHERE source <> 'src0' AND quality >= 0.64
        GROUP BY fp),
      dsh AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)])) AS shingle
        FROM (SELECT b.doc_id, string_split_regex(b.text, '\s+') AS tl
              FROM base b JOIN clusters c ON b.fp = c.fp
              WHERE b.source <> 'src0' AND b.quality >= 0.64
                AND b.doc_id = c.keep_id)
        WHERE len(tl) >= 5),
      esh AS (
        SELECT DISTINCT unnest(list_distinct(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)])) AS shingle
        FROM (SELECT string_split_regex(text, '\s+') AS tl FROM documents
              WHERE source = 'src0')
        WHERE len(tl) >= 5),
      ctm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
               CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM esh)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_contam
        FROM dsh GROUP BY doc_id)
      SELECT b.doc_id, b.source, b.lang, b.n_tokens, b.quality,
             CASE WHEN b.source <> 'src0' AND b.quality >= 0.64
                  THEN c.csize ELSE 0 END AS dup_cluster_size,
             CASE WHEN b.source <> 'src0' AND b.quality >= 0.64
                       AND b.doc_id = c.keep_id
                  THEN coalesce(m.n_contam, 0) * 1000000
                       // coalesce(m.n_sh, 1)
                  ELSE 0 END AS contam_ppm,
             CASE WHEN b.source = 'src0' THEN 'eval_source'
                  WHEN b.quality < 0.64 THEN 'low_quality'
                  WHEN b.doc_id <> c.keep_id THEN 'duplicate'
                  WHEN CAST(coalesce(m.n_contam, 0) AS DOUBLE)
                       / coalesce(m.n_sh, 1) >= 0.5 THEN 'contaminated'
                  ELSE 'kept' END AS status
      FROM base b
      LEFT JOIN clusters c USING (fp)
      LEFT JOIN ctm m ON m.doc_id = b.doc_id
      ORDER BY b.doc_id
    """.trim))

  val all: Seq[Q] = Seq(qSketchCms, qDedupSubstring, qSamplePerGroup,
    qSampleWeightedK, qTextVocab, qCorpusDiff, qTextOov, qCorpusGini,
    qBoilerplateSpans, qZipfFit, qSketchHll, qSketchQuantile, qAqpSum,
    qSketchHllOverlap, qSamplePriority, qMixtureReweight, qSeqPack,
    qDsirScore, qDsirResample, qDsirBudget, qDedupSubstringSpans,
    qDedupSubstringApply, qBatchPadWaste, qProvenanceManifest)
}
