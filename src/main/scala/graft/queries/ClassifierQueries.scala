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
    * ([[graft.operators.TeacherArtifact]]): it forces the teacher
    * label + tokenization pass and writes it as parquet — pricing the
    * shared corpus pass here, once — then trains/scores the NB student
    * off the written tables, exactly as the other two students do. */
  val qNbDistill: Q = Q(
    "q_nb_distill",
    (spark, dir) => {
      TeacherArtifact.materialize(spark, dir)
      Classify.nbConfusionFrom(TeacherArtifact.labeled(spark, dir),
        TeacherArtifact.toks(spark, dir))
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
    (spark, dir) =>
      Classify.rocchioConfusionFrom(TeacherArtifact.labeled(spark, dir),
        TeacherArtifact.toks(spark, dir)),
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
      Classify
        .studentPredictionsFrom(TeacherArtifact.labeled(spark, dir),
          TeacherArtifact.toks(spark, dir))
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

  val all: Seq[Q] = Seq(qNbDistill, qRocchio, qStudentsAgree)
}
