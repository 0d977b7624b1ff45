package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{Classify, TeacherArtifact}

/** In-engine classifier training/eval queries — the distillation leg
  * of a curation pipeline: an expensive teacher labels a slice, a
  * cheap student (multinomial Naive Bayes over tokens) learns it, and
  * the held-out confusion matrix says whether the student is fit to
  * run at corpus scale. */
object ClassifierQueries {

  /** Shared teacher-label CTE prefix (rule-based profile labeler,
    * hash-stable 80/20 split, per-doc token counts) — every student
    * below trains on the IDENTICAL task, so their confusion matrices
    * are comparable head to head. */
  private def teacherToksCte: String = s"""base AS (
        SELECT doc_id, actual, is_train, token FROM (
          SELECT doc_id,
                 CASE WHEN s_storage > greatest(s_olap, s_stream) THEN 'storage'
                      WHEN s_stream > s_olap THEN 'stream'
                      ELSE 'olap' END AS actual,
                 ${AnalyticsQueries.bpSql("doc_id")} < 8000 AS is_train,
                 unnest(toks) AS token
          FROM (
            SELECT doc_id, toks,
                   len(list_filter(toks, x -> x IN ('join','query','table','scan','agg'))) AS s_olap,
                   len(list_filter(toks, x -> x IN ('stream','batch','window','merge'))) AS s_stream,
                   len(list_filter(toks, x -> x IN ('row','column','data','key'))) AS s_storage
            FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
                  FROM documents)))
        WHERE length(token) > 0),
      toks AS (
        SELECT doc_id, actual, is_train, token, count(*) AS tcnt
        FROM base GROUP BY 1, 2, 3, 4)"""

  /** Distill the rule-based profile labeler ([[TextAnalysis
    * .predictedProfile]] — the "expensive" teacher) into a Naive Bayes
    * student on the hash-stable 80/20 split, and report the held-out
    * confusion matrix. All likelihoods are floor(ln·10⁹) of exact
    * rationals, so scores are plain BIGINT sums and both engines pick
    * identical argmaxes (ties toward the smaller class name).
    *
    * The oracle replays the full train+score pipeline in SQL — priors,
    * bounded vocab cut, smoothed per-(class, token) log-likelihoods,
    * out-of-vocab fallback mass, and the per-doc argmax.
    *
    * This is the registered BUILD STEP of the teacher artifact
    * ([[graft.operators.TeacherArtifact]]) AND of the NB score table
    * ([[graft.operators.NbScoresArtifact]]): it forces the teacher
    * label + tokenization pass, trains/scores the NB student off the
    * written tables, publishes the per-(held-out doc, class) score
    * parquet — the output a production scoring job ships — and
    * reports the confusion matrix as a small aggregate over it. The
    * agreement audit and the conformal gate consume the scores
    * without re-running the pass. */
  val qNbDistill: Q = Q(
    "q_nb_distill",
    (spark, dir) => {
      TeacherArtifact.materialize(spark, dir)
      graft.operators.NbScoresArtifact.materialize(spark, dir)
      graft.operators.NbScoresArtifact.scores(spark, dir)
        .groupBy(col("doc_id"), col("actual"))
        .agg(min(struct((-col("score")).as("neg"), col("label")))
          .getField("label").as("predicted"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("actual"), col("predicted"))
    },
    Some(s"""
      WITH $teacherToksCte,
      train AS (SELECT * FROM toks WHERE is_train),
      perdoc AS (SELECT DISTINCT doc_id, actual FROM train),
      classes AS (
        SELECT actual AS label,
               CAST(floor(ln(CAST(count(*) AS DOUBLE) /
                 (SELECT CAST(count(*) AS DOUBLE) FROM perdoc)) * 1e9)
                 AS BIGINT) AS prior_nanos
        FROM perdoc GROUP BY actual),
      vocab AS (
        SELECT token FROM (
          SELECT token, CAST(sum(tcnt) AS BIGINT) AS gc
          FROM train GROUP BY token)
        ORDER BY gc DESC, token LIMIT 256),
      vs AS (SELECT count(*) AS v FROM vocab),
      counts AS (
        SELECT actual AS label, t.token, CAST(sum(tcnt) AS BIGINT) AS cnt
        FROM train t JOIN vocab USING (token) GROUP BY 1, 2),
      ncs AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS nc
              FROM counts GROUP BY label),
      ct AS (
        SELECT c.label, c.prior_nanos, n.nc, vs.v,
               CAST(floor(ln(1.0 / CAST(n.nc + vs.v AS DOUBLE)) * 1e9)
                 AS BIGINT) AS unk_nanos
        FROM classes c JOIN ncs n USING (label), vs),
      model AS (
        SELECT ct.label, vo.token,
               CAST(floor(ln(CAST(coalesce(cn.cnt, 0) + 1 AS DOUBLE) /
                 CAST(ct.nc + ct.v AS DOUBLE)) * 1e9) AS BIGINT) AS term_nanos
        FROM ct CROSS JOIN vocab vo
        LEFT JOIN counts cn ON cn.label = ct.label AND cn.token = vo.token),
      scored AS (
        SELECT e.doc_id, e.actual, ct.label,
               ct.prior_nanos
                 + CAST(sum(e.tcnt * coalesce(m.term_nanos, ct.unk_nanos))
                     AS BIGINT) AS score
        FROM toks e CROSS JOIN ct
        LEFT JOIN model m ON m.label = ct.label AND m.token = e.token
        WHERE NOT e.is_train
        GROUP BY e.doc_id, e.actual, ct.label, ct.prior_nanos),
      best AS (
        SELECT doc_id, actual, label AS predicted,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, label) AS rn
        FROM scored)
      SELECT actual, predicted, count(*) AS n_docs
      FROM best WHERE rn = 1
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** Rocchio nearest-centroid student on the SAME teacher task as
    * [[qNbDistill]] — a vector-space (tf-idf cosine) inductive bias
    * beside NB's token-likelihood bias; comparing the two confusion
    * matrices head-to-head is the model-selection step of the
    * distillation loop. All centroid components and dot products are
    * exact integers (tcnt × floor(ln(N/df)·10⁶) summed in
    * DECIMAL(38)/HUGEINT); the one double division and sqrt run on
    * identical expression trees, so the per-doc argmax (ties to the
    * smaller class, alphabetically-first fallback for docs with no
    * nonzero-idf vocab overlap) is engine-exact. */
  val qRocchio: Q = Q(
    "q_rocchio_centroid",
    (spark, dir) => {
      // Registered build step of the Rocchio prediction artifact
      // (operators/StudentArtifacts.scala): pays its scoring pass +
      // write; the agreement audit consumes the written predictions.
      graft.operators.RocchioPredsArtifact.materialize(spark, dir)
      graft.operators.RocchioPredsArtifact.preds(spark, dir)
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("actual"), col("predicted"))
    },
    Some(s"""
      WITH $teacherToksCte,
      train AS (SELECT * FROM toks WHERE is_train),
      ntr AS (SELECT count(DISTINCT doc_id) AS n_train FROM train),
      vocab AS (
        SELECT token,
               CAST(floor(ln((SELECT CAST(n_train AS DOUBLE) FROM ntr)
                 / CAST(df AS DOUBLE)) * 1e6) AS BIGINT) AS idf_micros
        FROM (
          SELECT token, CAST(sum(tcnt) AS BIGINT) AS gc,
                 count(DISTINCT doc_id) AS df
          FROM train GROUP BY token
          ORDER BY gc DESC, token LIMIT 256)),
      cent AS (
        SELECT actual AS label, token,
               CAST(sum(tcnt * idf_micros) AS BIGINT) AS c
        FROM train JOIN vocab USING (token)
        GROUP BY 1, 2
        HAVING CAST(sum(tcnt * idf_micros) AS BIGINT) <> 0),
      s2 AS (
        SELECT label, sum(CAST(c AS HUGEINT) * c) AS s2
        FROM cent GROUP BY label),
      dots AS (
        SELECT e.doc_id, e.actual, c.label,
               sum(CAST(e.tcnt * v.idf_micros AS HUGEINT) * c.c) AS dot
        FROM toks e
        JOIN vocab v USING (token)
        JOIN cent c USING (token)
        WHERE NOT e.is_train
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT d.doc_id, d.actual, d.label,
               CAST(d.dot AS DOUBLE) / sqrt(CAST(s.s2 AS DOUBLE)) AS score
        FROM dots d JOIN s2 s USING (label)),
      pred AS (
        SELECT doc_id, actual, label AS predicted FROM (
          SELECT doc_id, actual, label,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label) AS rn
          FROM scored)
        WHERE rn = 1),
      evdocs AS (
        SELECT DISTINCT doc_id, actual FROM toks WHERE NOT is_train),
      fb AS (SELECT min(label) AS fbl FROM cent)
      SELECT d.actual, coalesce(p.predicted, (SELECT fbl FROM fb))
               AS predicted,
             count(*) AS n_docs
      FROM evdocs d LEFT JOIN pred p USING (doc_id, actual)
      GROUP BY 1, 2 ORDER BY 1, 2
    """.trim))

  /** Student-vs-student agreement audit — the ensemble signal the
    * distillation loop acts on: per teacher class, how often the two
    * students (NB and Rocchio, same task, different inductive biases)
    * agree, and how each side's accuracy decomposes. Docs where
    * independent students AGREE are high-confidence auto-label
    * candidates; disagreements are exactly the rows a curation
    * pipeline routes back to the expensive teacher. One doc-level
    * join of the two per-doc prediction frames, integer counts and
    * floor'd ppm — the oracle replays BOTH full pipelines (namespaced
    * CTEs) and must land on the identical joint counts. */
  val qStudentsAgree: Q = Q(
    "q_students_agree",
    (spark, dir) => {
      // Pure artifact consumer: NB predictions are the argmax of the
      // published score table, Rocchio predictions are read as
      // written — the audit is two small-table scans and a doc-level
      // join, no corpus pass (see operators/StudentArtifacts.scala).
      graft.operators.NbScoresArtifact.scores(spark, dir)
        .groupBy(col("doc_id"), col("actual"))
        .agg(min(struct((-col("score")).as("neg"), col("label")))
          .getField("label").as("nb_pred"))
        .join(graft.operators.RocchioPredsArtifact.preds(spark, dir)
          .withColumnRenamed("predicted", "rc_pred"),
          Seq("doc_id", "actual"))
        .groupBy(col("actual"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("nb_pred") === col("rc_pred"), 1L).otherwise(0L))
            .as("n_agree"),
          sum(when(col("nb_pred") === col("actual"), 1L).otherwise(0L))
            .as("n_nb_correct"),
          sum(when(col("rc_pred") === col("actual"), 1L).otherwise(0L))
            .as("n_rc_correct"),
          sum(when(col("nb_pred") === col("actual")
            && col("rc_pred") === col("actual"), 1L).otherwise(0L))
            .as("n_both_correct"))
        .select(col("actual"), col("n_eval"), col("n_agree"),
          col("n_nb_correct"), col("n_rc_correct"), col("n_both_correct"),
          expr("n_agree * 1000000 div n_eval").as("agree_ppm"))
        .orderBy(col("actual"))
    },
    Some(s"""
      WITH $teacherToksCte,
      train AS (SELECT * FROM toks WHERE is_train),
      perdoc AS (SELECT DISTINCT doc_id, actual FROM train),
      classes AS (
        SELECT actual AS label,
               CAST(floor(ln(CAST(count(*) AS DOUBLE) /
                 (SELECT CAST(count(*) AS DOUBLE) FROM perdoc)) * 1e9)
                 AS BIGINT) AS prior_nanos
        FROM perdoc GROUP BY actual),
      vocab AS (
        SELECT token FROM (
          SELECT token, CAST(sum(tcnt) AS BIGINT) AS gc
          FROM train GROUP BY token)
        ORDER BY gc DESC, token LIMIT 256),
      vs AS (SELECT count(*) AS v FROM vocab),
      counts AS (
        SELECT actual AS label, t.token, CAST(sum(tcnt) AS BIGINT) AS cnt
        FROM train t JOIN vocab USING (token) GROUP BY 1, 2),
      ncs AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS nc
              FROM counts GROUP BY label),
      ct AS (
        SELECT c.label, c.prior_nanos, n.nc, vs.v,
               CAST(floor(ln(1.0 / CAST(n.nc + vs.v AS DOUBLE)) * 1e9)
                 AS BIGINT) AS unk_nanos
        FROM classes c JOIN ncs n USING (label), vs),
      model AS (
        SELECT ct.label, vo.token,
               CAST(floor(ln(CAST(coalesce(cn.cnt, 0) + 1 AS DOUBLE) /
                 CAST(ct.nc + ct.v AS DOUBLE)) * 1e9) AS BIGINT) AS term_nanos
        FROM ct CROSS JOIN vocab vo
        LEFT JOIN counts cn ON cn.label = ct.label AND cn.token = vo.token),
      nbscored AS (
        SELECT e.doc_id, e.actual, ct.label,
               ct.prior_nanos
                 + CAST(sum(e.tcnt * coalesce(m.term_nanos, ct.unk_nanos))
                     AS BIGINT) AS score
        FROM toks e CROSS JOIN ct
        LEFT JOIN model m ON m.label = ct.label AND m.token = e.token
        WHERE NOT e.is_train
        GROUP BY e.doc_id, e.actual, ct.label, ct.prior_nanos),
      nbpred AS (
        SELECT doc_id, actual, label AS nb_pred FROM (
          SELECT doc_id, actual, label,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label) AS rn
          FROM nbscored)
        WHERE rn = 1),
      ntr AS (SELECT count(DISTINCT doc_id) AS n_train FROM train),
      rvocab AS (
        SELECT token,
               CAST(floor(ln((SELECT CAST(n_train AS DOUBLE) FROM ntr)
                 / CAST(df AS DOUBLE)) * 1e6) AS BIGINT) AS idf_micros
        FROM (
          SELECT token, CAST(sum(tcnt) AS BIGINT) AS gc,
                 count(DISTINCT doc_id) AS df
          FROM train GROUP BY token
          ORDER BY gc DESC, token LIMIT 256)),
      rcent AS (
        SELECT actual AS label, token,
               CAST(sum(tcnt * idf_micros) AS BIGINT) AS c
        FROM train JOIN rvocab USING (token)
        GROUP BY 1, 2
        HAVING CAST(sum(tcnt * idf_micros) AS BIGINT) <> 0),
      rs2 AS (
        SELECT label, sum(CAST(c AS HUGEINT) * c) AS s2
        FROM rcent GROUP BY label),
      rdots AS (
        SELECT e.doc_id, e.actual, c.label,
               sum(CAST(e.tcnt * v.idf_micros AS HUGEINT) * c.c) AS dot
        FROM toks e
        JOIN rvocab v USING (token)
        JOIN rcent c USING (token)
        WHERE NOT e.is_train
        GROUP BY 1, 2, 3),
      rscored AS (
        SELECT d.doc_id, d.actual, d.label,
               CAST(d.dot AS DOUBLE) / sqrt(CAST(s.s2 AS DOUBLE)) AS score
        FROM rdots d JOIN rs2 s USING (label)),
      rbest AS (
        SELECT doc_id, actual, label AS rc_hit FROM (
          SELECT doc_id, actual, label,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, label) AS rn
          FROM rscored)
        WHERE rn = 1),
      revdocs AS (
        SELECT DISTINCT doc_id, actual FROM toks WHERE NOT is_train),
      rfb AS (SELECT min(label) AS fbl FROM rcent),
      rcpred AS (
        SELECT d.doc_id, d.actual,
               coalesce(b.rc_hit, (SELECT fbl FROM rfb)) AS rc_pred
        FROM revdocs d LEFT JOIN rbest b USING (doc_id, actual))
      SELECT n.actual,
             count(*) AS n_eval,
             CAST(sum(CASE WHEN n.nb_pred = r.rc_pred THEN 1 ELSE 0 END)
               AS BIGINT) AS n_agree,
             CAST(sum(CASE WHEN n.nb_pred = n.actual THEN 1 ELSE 0 END)
               AS BIGINT) AS n_nb_correct,
             CAST(sum(CASE WHEN r.rc_pred = n.actual THEN 1 ELSE 0 END)
               AS BIGINT) AS n_rc_correct,
             CAST(sum(CASE WHEN n.nb_pred = n.actual AND r.rc_pred = n.actual
               THEN 1 ELSE 0 END) AS BIGINT) AS n_both_correct,
             CAST(sum(CASE WHEN n.nb_pred = r.rc_pred THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS agree_ppm
      FROM nbpred n JOIN rcpred r USING (doc_id, actual)
      GROUP BY n.actual ORDER BY n.actual
    """.trim))

  /** Split-conformal calibration of the NB student — the piece that
    * turns a distilled classifier into a SELECTIVE one with a
    * distribution-free coverage guarantee: on a calibration slice of
    * the held-out docs, the nonconformity score is the exact-nano
    * margin `best − score(true class)`; the 90%-coverage threshold is
    * the ⌈(n+1)·0.9⌉-th smallest such margin (pure integer rank
    * selection — engine-exact); on the disjoint test slice the query
    * reports the guaranteed-coverage check (must come out ≥ ~900000
    * ppm) and the average prediction-set size (the efficiency price
    * of the guarantee). This is the production auto-label gate: docs
    * whose prediction set is a singleton auto-label, the rest route
    * to the teacher.
    *
    * Scale shape: scoring is the same broadcast-model pass as the
    * students; the calibration set is CAPPED at 4096 docs by
    * deterministic md5 order (a distributed TakeOrderedAndProject,
    * never a full collect — conformal guarantees need ~10³ points
    * regardless of corpus size, so the cap is the statistically
    * correct posture at 100 TB, not a shortcut); the quantile is an
    * element_at on the one bounded sorted array. Cal/test split is
    * the hash-stable [8000,9000)/[9000,10000) basis-point slice of
    * the held-out 20%. */
  val qConformal: Q = Q(
    "q_conformal_threshold",
    (spark, dir) => {
      // pure artifact consumer: one scan of the published NB score
      // table; the per-doc class-score list is BOUNDED by the class
      // count, so prediction-set sizes compute IN-ROW (no second scan,
      // no doc-level re-join)
      val perDoc = graft.operators.NbScoresArtifact.scores(spark, dir)
        .groupBy(col("doc_id"))
        .agg(max(col("score")).as("best"),
          max(when(col("label") === col("actual"), col("score")))
            .as("s_true"),
          collect_list(col("score")).as("scores"))
        .select(col("doc_id"),
          graft.operators.Sampling.hashBasisPoints(col("doc_id")).as("bp"),
          col("best"), (col("best") - col("s_true")).as("nonconf"),
          col("scores"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val thr = perDoc.filter(col("bp") < 9000)
        .orderBy(md5(col("doc_id").cast("string"))).limit(4096)
        .select(col("nonconf"))
        .agg(count(lit(1)).as("n_cal"),
          sort_array(collect_list(col("nonconf"))).as("srt"))
        .select(col("n_cal"),
          element_at(col("srt"),
            least(expr("((n_cal + 1) * 9 + 9) div 10"), col("n_cal"))
              .cast("int")).as("thr_nanos"))
      perDoc.filter(col("bp") >= 9000)
        .crossJoin(broadcast(thr))
        .select(col("nonconf"), col("n_cal"), col("thr_nanos"),
          expr("cast(size(filter(scores, s -> best - s <= thr_nanos))" +
            " as bigint)").as("set_size"))
        .groupBy(col("n_cal"), col("thr_nanos"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("nonconf") <= col("thr_nanos"), 1L).otherwise(0L))
            .as("n_covered"),
          sum(col("set_size")).as("sum_set"))
        .select(col("n_cal"), col("thr_nanos"), col("n_test"),
          expr("n_covered * 1000000 div n_test").as("coverage_ppm"),
          expr("sum_set * 1000 div n_test").as("avg_set_milli"))
    },
    Some(s"""
      WITH $teacherToksCte,
      train AS (SELECT * FROM toks WHERE is_train),
      perdoc AS (SELECT DISTINCT doc_id, actual FROM train),
      classes AS (
        SELECT actual AS label,
               CAST(floor(ln(CAST(count(*) AS DOUBLE) /
                 (SELECT CAST(count(*) AS DOUBLE) FROM perdoc)) * 1e9)
                 AS BIGINT) AS prior_nanos
        FROM perdoc GROUP BY actual),
      vocab AS (
        SELECT token FROM (
          SELECT token, CAST(sum(tcnt) AS BIGINT) AS gc
          FROM train GROUP BY token)
        ORDER BY gc DESC, token LIMIT 256),
      vs AS (SELECT count(*) AS v FROM vocab),
      counts AS (
        SELECT actual AS label, t.token, CAST(sum(tcnt) AS BIGINT) AS cnt
        FROM train t JOIN vocab USING (token) GROUP BY 1, 2),
      ncs AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS nc
              FROM counts GROUP BY label),
      ct AS (
        SELECT c.label, c.prior_nanos, n.nc, vs.v,
               CAST(floor(ln(1.0 / CAST(n.nc + vs.v AS DOUBLE)) * 1e9)
                 AS BIGINT) AS unk_nanos
        FROM classes c JOIN ncs n USING (label), vs),
      model AS (
        SELECT ct.label, vo.token,
               CAST(floor(ln(CAST(coalesce(cn.cnt, 0) + 1 AS DOUBLE) /
                 CAST(ct.nc + ct.v AS DOUBLE)) * 1e9) AS BIGINT) AS term_nanos
        FROM ct CROSS JOIN vocab vo
        LEFT JOIN counts cn ON cn.label = ct.label AND cn.token = vo.token),
      scored AS (
        SELECT e.doc_id, e.actual, ct.label,
               ct.prior_nanos
                 + CAST(sum(e.tcnt * coalesce(m.term_nanos, ct.unk_nanos))
                     AS BIGINT) AS score
        FROM toks e CROSS JOIN ct
        LEFT JOIN model m ON m.label = ct.label AND m.token = e.token
        WHERE NOT e.is_train
        GROUP BY e.doc_id, e.actual, ct.label, ct.prior_nanos),
      pd AS (
        SELECT doc_id, max(score) AS best,
               max(CASE WHEN label = actual THEN score END) AS s_true,
               list(score) AS scores
        FROM scored GROUP BY doc_id),
      pdb AS (
        SELECT doc_id, best, best - s_true AS nonconf, scores,
               ${AnalyticsQueries.bpSql("doc_id")} AS bp
        FROM pd),
      calr AS (
        SELECT nonconf FROM pdb WHERE bp < 9000
        ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 4096),
      ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM calr),
      thr AS (
        SELECT nonconf AS thr_nanos FROM (
          SELECT nonconf, row_number() OVER (ORDER BY nonconf) AS rn
          FROM calr), ncal
        WHERE rn = least(((n_cal + 1) * 9 + 9) // 10, n_cal)),
      sets AS (
        SELECT p.doc_id, p.nonconf,
               CAST(len(list_filter(p.scores,
                 s -> p.best - s <= t.thr_nanos)) AS BIGINT) AS set_size
        FROM pdb p, thr t
        WHERE p.bp >= 9000)
      SELECT (SELECT n_cal FROM ncal) AS n_cal,
             (SELECT thr_nanos FROM thr) AS thr_nanos,
             count(*) AS n_test,
             CAST(sum(CASE WHEN nonconf <= (SELECT thr_nanos FROM thr)
               THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
               AS coverage_ppm,
             CAST(sum(set_size) * 1000 // count(*) AS BIGINT)
               AS avg_set_milli
      FROM sets
    """.trim))

  /** NB train+score CTE chain (priors → bounded vocab → smoothed
    * log-likelihoods → held-out per-(doc, class) BIGINT scores) —
    * the SQL replay of [[Classify.nbHeldOutScoresFrom]], shared by
    * oracles that consume the published score table. Identical text
    * to the chain inside `qConformal`'s oracle. */
  private def nbScoredCte: String = s"""train AS (SELECT * FROM toks WHERE is_train),
      perdoc AS (SELECT DISTINCT doc_id, actual FROM train),
      classes AS (
        SELECT actual AS label,
               CAST(floor(ln(CAST(count(*) AS DOUBLE) /
                 (SELECT CAST(count(*) AS DOUBLE) FROM perdoc)) * 1e9)
                 AS BIGINT) AS prior_nanos
        FROM perdoc GROUP BY actual),
      vocab AS (
        SELECT token FROM (
          SELECT token, CAST(sum(tcnt) AS BIGINT) AS gc
          FROM train GROUP BY token)
        ORDER BY gc DESC, token LIMIT 256),
      vs AS (SELECT count(*) AS v FROM vocab),
      counts AS (
        SELECT actual AS label, t.token, CAST(sum(tcnt) AS BIGINT) AS cnt
        FROM train t JOIN vocab USING (token) GROUP BY 1, 2),
      ncs AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS nc
              FROM counts GROUP BY label),
      ct AS (
        SELECT c.label, c.prior_nanos, n.nc, vs.v,
               CAST(floor(ln(1.0 / CAST(n.nc + vs.v AS DOUBLE)) * 1e9)
                 AS BIGINT) AS unk_nanos
        FROM classes c JOIN ncs n USING (label), vs),
      model AS (
        SELECT ct.label, vo.token,
               CAST(floor(ln(CAST(coalesce(cn.cnt, 0) + 1 AS DOUBLE) /
                 CAST(ct.nc + ct.v AS DOUBLE)) * 1e9) AS BIGINT) AS term_nanos
        FROM ct CROSS JOIN vocab vo
        LEFT JOIN counts cn ON cn.label = ct.label AND cn.token = vo.token),
      scored AS (
        SELECT e.doc_id, e.actual, ct.label,
               ct.prior_nanos
                 + CAST(sum(e.tcnt * coalesce(m.term_nanos, ct.unk_nanos))
                     AS BIGINT) AS score
        FROM toks e CROSS JOIN ct
        LEFT JOIN model m ON m.label = ct.label AND m.token = e.token
        WHERE NOT e.is_train
        GROUP BY e.doc_id, e.actual, ct.label, ct.prior_nanos)"""

  /** Active-learning acquisition batch (uncertainty sampling): the 20
    * held-out documents where the NB student's top-two class scores
    * are closest — the rows whose annotation buys the most signal per
    * label, i.e. the next batch a human-in-the-loop curation pipeline
    * sends out. Pure consumer of the published NB score table: per doc
    * the bounded class-score list sorts IN-ROW (class count rows), the
    * margin is an exact BIGINT difference of nano log-likelihoods, and
    * the 20-row cut is a bounded two-sided heap aggregate — no global
    * sort, no second corpus pass. Ties → smaller doc_id; argmax ties →
    * smaller class name (both replayed by the oracle). */
  val qActiveBatch: Q = Q(
    "q_active_batch",
    (spark, dir) => {
      val perDoc = graft.operators.NbScoresArtifact.scores(spark, dir)
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct((-col("score")).as("neg"),
          col("label")))).as("srt"))
        .select(col("doc_id"),
          col("srt")(0).getField("label").as("predicted"),
          (col("srt")(1).getField("neg") - col("srt")(0).getField("neg"))
            .as("margin_nanos"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      perDoc
        .select((-col("margin_nanos")).as("score"),
          lpad(col("doc_id").cast("string"), 12, "0").as("item"))
        .groupBy()
        .agg(graft.functions.TopKLongAgg(col("score"), col("item"), 20)
          .as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("int").as("rnk"),
          col("col.item").cast("long").as("doc_id"),
          (-col("col.score")).as("margin_nanos"))
        .join(perDoc.select(col("doc_id"), col("predicted")), "doc_id")
        .select(col("rnk"), col("doc_id"), col("predicted"),
          col("margin_nanos"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH $teacherToksCte,
      $nbScoredCte,
      r AS (
        SELECT doc_id, label, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, label) AS rn
        FROM scored),
      pd AS (
        SELECT a.doc_id, a.label AS predicted,
               a.score - b.score AS margin_nanos
        FROM r a JOIN r b ON a.doc_id = b.doc_id AND b.rn = 2
        WHERE a.rn = 1),
      cut AS (
        SELECT CAST(row_number() OVER (ORDER BY margin_nanos ASC, doc_id)
                 AS INT) AS rnk,
               doc_id, predicted, margin_nanos
        FROM pd)
      SELECT rnk, doc_id, predicted, margin_nanos
      FROM cut WHERE rnk <= 20 ORDER BY rnk
    """.trim))

  /** Programmatic weak-supervision panel (the Snorkel labeling-function
    * audit): four deterministic labeling functions vote keep(+1) /
    * abstain(0) / drop(−1) on every document, and the query reports the
    * label-model diagnostics a data-programming run reads before
    * trusting the fused labels — per-LF coverage and polarity, overlap
    * (votes alongside another LF), conflict (votes against an
    * opposite-sign vote), and disagreement with the majority-vote
    * label. The LFs are the classic corpus-quality rules: token-length
    * gate, digit-density gate, English-stopword evidence, and a
    * repetition gate — each an exact integer predicate both engines
    * replay bit-for-bit (character counts, not bytes; the regex strips
    * ALL digits on both sides).
    *
    * Scale: everything is computed in-row on one corpus scan (the four
    * votes, the per-doc vote tallies, the majority sign), then a 4-way
    * in-row unpivot feeds ONE hash aggregate keyed by the 4-value LF
    * name — map-side combinable, no joins, no windows, output is 4
    * rows regardless of corpus size. */
  /** Shared per-doc LF votes + majority (engine side): doc_id, source,
    * v_digit/v_len/v_rep/v_stop, n_posv, n_negv, majority. */
  private def weakVotes(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.Tables
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val nToks = size(toks)
    val nDig = length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))
    val nStop = size(filter(toks,
      t => lower(t).isin("the", "and", "of")))
    val nUniq = size(array_distinct(toks))
    val vLen = when(nToks >= 40, 1L).when(nToks < 8, -1L).otherwise(0L)
    val vDig = when(nDig * 10 > length(col("text")), -1L)
      .when(nDig === 0, 1L).otherwise(0L)
    val vStop = when(nStop >= 2, 1L).when(nStop === 0, -1L).otherwise(0L)
    val vRep = when(nUniq * 2 < nToks, -1L).otherwise(0L)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), vDig.as("v_digit"),
        vLen.as("v_len"), vRep.as("v_rep"), vStop.as("v_stop"))
      .withColumn("n_posv",
        expr("cast(v_digit = 1 as long) + cast(v_len = 1 as long)" +
          " + cast(v_rep = 1 as long) + cast(v_stop = 1 as long)"))
      .withColumn("n_negv",
        expr("cast(v_digit = -1 as long) + cast(v_len = -1 as long)" +
          " + cast(v_rep = -1 as long) + cast(v_stop = -1 as long)"))
      .withColumn("majority",
        expr("case when v_digit + v_len + v_rep + v_stop > 0 then 1" +
          " when v_digit + v_len + v_rep + v_stop < 0 then -1 else 0 end"))
  }

  /** Shared oracle CTE producing the identical per-doc vote table. */
  private val weakVotesCte: String = """
      WITH d AS (
        SELECT doc_id, source, text,
               string_split_regex(text, '\s+') AS toks,
               len(text) AS n_chars,
               len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS n_dig
        FROM documents),
      v AS (
        SELECT doc_id, source,
               CASE WHEN n_dig * 10 > n_chars THEN -1
                    WHEN n_dig = 0 THEN 1 ELSE 0 END AS v_digit,
               CASE WHEN len(toks) >= 40 THEN 1
                    WHEN len(toks) < 8 THEN -1 ELSE 0 END AS v_len,
               CASE WHEN len(list_distinct(toks)) * 2 < len(toks)
                    THEN -1 ELSE 0 END AS v_rep,
               CASE WHEN len(list_filter(toks,
                        x -> lower(x) IN ('the','and','of'))) >= 2 THEN 1
                    WHEN len(list_filter(toks,
                        x -> lower(x) IN ('the','and','of'))) = 0 THEN -1
                    ELSE 0 END AS v_stop
        FROM d),
      m AS (
        SELECT doc_id, source, v_digit, v_len, v_rep, v_stop,
               CAST(v_digit = 1 AS INT) + CAST(v_len = 1 AS INT)
                 + CAST(v_rep = 1 AS INT) + CAST(v_stop = 1 AS INT) AS n_posv,
               CAST(v_digit = -1 AS INT) + CAST(v_len = -1 AS INT)
                 + CAST(v_rep = -1 AS INT) + CAST(v_stop = -1 AS INT) AS n_negv,
               CASE WHEN v_digit + v_len + v_rep + v_stop > 0 THEN 1
                    WHEN v_digit + v_len + v_rep + v_stop < 0 THEN -1
                    ELSE 0 END AS majority
        FROM v)"""

  val qWeakLabels: Q = Q(
    "q_weak_labels",
    (spark, dir) => {
      weakVotes(spark, dir)
        .select(col("n_posv"), col("n_negv"), col("majority"),
          explode(array(
            struct(lit("lf_digit").as("lf"), col("v_digit").as("v")),
            struct(lit("lf_len").as("lf"), col("v_len").as("v")),
            struct(lit("lf_rep").as("lf"), col("v_rep").as("v")),
            struct(lit("lf_stop").as("lf"), col("v_stop").as("v"))))
            .as("x"))
        .select(col("x.lf").as("lf"), col("x.v").as("v"),
          col("n_posv"), col("n_negv"), col("majority"))
        .groupBy(col("lf"))
        .agg(
          sum(when(col("v") =!= 0, 1L).otherwise(0L)).as("n_votes"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("v") === -1, 1L).otherwise(0L)).as("n_neg"),
          sum(when(col("v") =!= 0 &&
            (col("n_posv") + col("n_negv")) >= 2, 1L).otherwise(0L))
            .as("n_overlap"),
          sum(when((col("v") === 1 && col("n_negv") >= 1) ||
            (col("v") === -1 && col("n_posv") >= 1), 1L).otherwise(0L))
            .as("n_conflict"),
          sum(when(col("v") =!= 0 && col("majority") =!= 0 &&
            col("v") =!= col("majority"), 1L).otherwise(0L))
            .as("n_against_majority"))
        .orderBy(col("lf"))
    },
    Some(s"""$weakVotesCte,
      u AS (
        SELECT unnest(['lf_digit','lf_len','lf_rep','lf_stop']) AS lf,
               unnest([v_digit, v_len, v_rep, v_stop]) AS v,
               n_posv, n_negv, majority
        FROM m)
      SELECT lf,
             CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_votes,
             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN v = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN v <> 0 AND n_posv + n_negv >= 2
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             CAST(sum(CASE WHEN (v = 1 AND n_negv >= 1)
                             OR (v = -1 AND n_posv >= 1)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_conflict,
             CAST(sum(CASE WHEN v <> 0 AND majority <> 0 AND v <> majority
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_against_majority
      FROM u GROUP BY lf ORDER BY lf
    """.trim))

  /** Accuracy-weighted label fusion — the data-programming second
    * step after the `q_weak_labels` audit: each labeling function
    * earns a weight equal to its agreement rate with the majority
    * vote (exact ppm over the docs where both it and the majority
    * commit — the one-step label-model estimate of LF accuracy), and
    * the fused label is the sign of the weight-weighted vote sum.
    * Reports the per-source fused keep/drop/abstain funnel against
    * the plain-majority one — the delta IS what the label model buys
    * (down-weighting unreliable LFs flips the docs where a weak
    * voter had out-shouted reliable ones).
    *
    * Scale: two corpus passes over the in-row vote columns (one to
    * estimate the 4 weights — a single 1-row aggregate that
    * broadcasts back — one to fuse), zero joins wider than the 1-row
    * weight table, output is per-source. A degenerate LF that never
    * votes alongside a majority gets weight 0 by the guarded
    * division, mirrored in the oracle. */
  val qWeakLabelModel: Q = Q(
    "q_weak_label_model",
    (spark, dir) => {
      val votes = weakVotes(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def wExpr(v: String): org.apache.spark.sql.Column =
        expr(s"""case when sum(cast($v <> 0 and majority <> 0 as long)) = 0
          then 0L else sum(cast($v <> 0 and majority <> 0 and $v = majority
          as long)) * 1000000 div sum(cast($v <> 0 and majority <> 0 as long))
          end""")
      val weights = votes.agg(
        wExpr("v_digit").as("w_digit"), wExpr("v_len").as("w_len"),
        wExpr("v_rep").as("w_rep"), wExpr("v_stop").as("w_stop"))
      votes.crossJoin(broadcast(weights))
        .withColumn("s",
          expr("v_digit * w_digit + v_len * w_len" +
            " + v_rep * w_rep + v_stop * w_stop"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("s") > 0, 1L).otherwise(0L)).as("n_keep"),
          sum(when(col("s") < 0, 1L).otherwise(0L)).as("n_drop"),
          sum(when(col("s") === 0, 1L).otherwise(0L)).as("n_abstain"),
          sum(when(col("majority") > 0, 1L).otherwise(0L))
            .as("n_keep_majority"),
          sum(when(expr("sign(s) <> majority"), 1L).otherwise(0L))
            .as("n_flipped"))
        .orderBy(col("source"))
    },
    Some(s"""$weakVotesCte,
      w AS (
        SELECT
          CASE WHEN sum(CASE WHEN v_digit <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) = 0 THEN 0
            ELSE sum(CASE WHEN v_digit <> 0 AND majority <> 0
                 AND v_digit = majority THEN 1 ELSE 0 END) * 1000000
              // sum(CASE WHEN v_digit <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) END AS w_digit,
          CASE WHEN sum(CASE WHEN v_len <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) = 0 THEN 0
            ELSE sum(CASE WHEN v_len <> 0 AND majority <> 0
                 AND v_len = majority THEN 1 ELSE 0 END) * 1000000
              // sum(CASE WHEN v_len <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) END AS w_len,
          CASE WHEN sum(CASE WHEN v_rep <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) = 0 THEN 0
            ELSE sum(CASE WHEN v_rep <> 0 AND majority <> 0
                 AND v_rep = majority THEN 1 ELSE 0 END) * 1000000
              // sum(CASE WHEN v_rep <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) END AS w_rep,
          CASE WHEN sum(CASE WHEN v_stop <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) = 0 THEN 0
            ELSE sum(CASE WHEN v_stop <> 0 AND majority <> 0
                 AND v_stop = majority THEN 1 ELSE 0 END) * 1000000
              // sum(CASE WHEN v_stop <> 0 AND majority <> 0
                 THEN 1 ELSE 0 END) END AS w_stop
        FROM m),
      fused AS (
        SELECT source, majority,
               v_digit * w_digit + v_len * w_len
                 + v_rep * w_rep + v_stop * w_stop AS s
        FROM m, w)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_drop,
             CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_abstain,
             CAST(sum(CASE WHEN majority > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep_majority,
             CAST(sum(CASE WHEN sign(s) <> majority THEN 1 ELSE 0 END)
               AS BIGINT) AS n_flipped
      FROM fused GROUP BY source ORDER BY source
    """.trim))

  val all: Seq[Q] = Seq(qNbDistill, qRocchio, qStudentsAgree, qConformal,
    qActiveBatch, qWeakLabels, qWeakLabelModel)
}
