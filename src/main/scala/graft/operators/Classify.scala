package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine classifier distillation — the pattern LLM data pipelines
  * use to scale an expensive labeler: label a slice with the costly
  * rule/model, train a cheap linear classifier on it, apply that at
  * corpus scale. Here the "teacher" is any deterministic label column
  * and the student is multinomial Naive Bayes over whitespace tokens
  * with add-one smoothing.
  *
  * Every probability enters the score as `floor(ln(p)·10⁹)` of an
  * exact rational — both engines compute the same double quotient,
  * the same `ln`, the same floor — so per-document scores are plain
  * BIGINT sums (order-independent, engine-exact) and the argmax is a
  * deterministic integer comparison with ties toward the smaller
  * class name.
  *
  * Scale shape: the model is (classes × vocab) rows with vocab cut to
  * `maxVocab` by global train frequency (count desc, token asc — a
  * deterministic bounded cut, same pattern as the `q_text_vocab`
  * head), so it broadcasts at any corpus width. Training is two hash
  * aggregates over the train slice (per-doc token counts, then
  * per-(class, token) counts; vocab and its marginals derive from the
  * tiny class-count table, never a second corpus pass); scoring is
  * one broadcast join per eval token — the corpus never shuffles
  * except the per-doc score aggregate. Out-of-vocab tokens take the
  * class's smoothed unknown mass via coalesce, so the scorer is
  * total. Measured cost is ~85% fixed stage latency (2.6 s at sf0.01
  * vs 3.1 s at 10× the data, local[32]): the ~10-job model-build DAG
  * dominates, and its stage count is independent of corpus size.
  */
object Classify {

  /** A trained NB model as two broadcastable tables:
    * `classTable(label, prior_nanos, nc, v, unk_nanos)` and
    * `model(label, token, term_nanos)`. Both are lazy plans — persist
    * them when scoring repeatedly (e.g. per micro-batch in a
    * Structured Streaming `foreachBatch` serving loop). */
  final case class NbModel(classTable: DataFrame, model: DataFrame)

  /** Build the model tables from per-train-doc class labels
    * (`perDoc`: doc_id, actual) and train token counts
    * (`trainToks`: actual, token, tcnt — per-doc or pre-aggregated,
    * counts sum either way). */
  private def buildModel(perDoc: DataFrame, trainToks: DataFrame,
                         maxVocab: Int): NbModel = {
    val nTrain = perDoc.agg(count(lit(1)).as("n_train"))
    val classes = perDoc.groupBy(col("actual").as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(nTrain))
      .select(col("label"),
        floor(log(col("n_docs").cast("double") / col("n_train").cast("double"))
          * lit(1e9)).cast("long").as("prior_nanos"))

    // ONE train-wide aggregate: per-(class, token) counts; the vocab
    // cut and its marginals derive from this class-count table (tiny),
    // not from a second pass over the token stream
    val countsAll = trainToks
      .groupBy(col("actual").as("label"), col("token"))
      .agg(sum(col("tcnt")).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded vocabulary: top maxVocab train tokens, deterministic cut
    val vocab = countsAll.groupBy(col("token"))
      .agg(sum(col("cnt")).as("gc"))
      .orderBy(col("gc").desc, col("token"))
      .limit(maxVocab)
      .select(col("token"))
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val counts = countsAll.join(broadcast(vocab), Seq("token"))
    val nc = counts.groupBy(col("label")).agg(sum(col("cnt")).as("nc"))
    val classTable = broadcast(classes.join(nc, Seq("label"))
      .crossJoin(broadcast(vsize))
      .select(col("label"), col("prior_nanos"), col("nc"), col("v"),
        floor(log(lit(1.0) / (col("nc") + col("v")).cast("double")) * lit(1e9))
          .cast("long").as("unk_nanos")))
    val model = broadcast(classTable
      .select(col("label"), col("nc"), col("v"))
      .crossJoin(broadcast(vocab))
      .join(counts, Seq("label", "token"), "left")
      .select(col("label"), col("token"),
        floor(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double")
          / (col("nc") + col("v")).cast("double")) * lit(1e9))
          .cast("long").as("term_nanos")))
    NbModel(classTable, model)
  }

  /** Per-doc token counts with the per-DOC columns evaluated in their
    * own projection BELOW the explode: `select(expr, explode(...))`
    * analyzes to Project(expr) ABOVE the Generate, re-evaluating every
    * carried expression once per TOKEN row — measured 18 s vs 1 s at
    * sf0.1 for the teacher label (same per-row pitfall as the
    * shinglesHof note in TextAnalysis). Callers pass an already-
    * projected frame; `carry` names its columns to keep. */
  private[operators] def tokenCounts(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val cols = carry.map(col)
    docs.select(cols :+ explode(TextAnalysis.tokens(col("text"))).as("token"): _*)
      .filter(length(col("token")) > 0)
      .groupBy(cols :+ col("token"): _*)
      .agg(count(lit(1)).as("tcnt"))
  }

  /** Train an NB model from a labeled slice (doc_id, actual, text). */
  def nbTrain(train: DataFrame, maxVocab: Int = 256): NbModel = {
    val slim = train.select(col("doc_id"), col("actual"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    buildModel(slim.select(col("doc_id"), col("actual")),
      tokenCounts(slim, Seq("doc_id", "actual")), maxVocab)
  }

  /** Score docs (doc_id, text) under a model → (doc_id, predicted).
    * The serving path: model tables broadcast, the corpus (or each
    * streaming micro-batch) is scan-scored — its payload never
    * shuffles, only (doc, class, BIGINT) partial sums. */
  def nbPredict(docs: DataFrame, m: NbModel): DataFrame =
    tokenCounts(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .crossJoin(broadcast(m.classTable
        .select(col("label"), col("prior_nanos"), col("unk_nanos"))))
      .join(m.model, Seq("label", "token"), "left")
      .groupBy(col("doc_id"), col("label"), col("prior_nanos"))
      .agg(sum(col("tcnt")
        * coalesce(col("term_nanos"), col("unk_nanos"))).as("ll"))
      .select(col("doc_id"), col("label"),
        (col("prior_nanos") + col("ll")).as("score"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("neg"), col("label"))).as("best"))
      .select(col("doc_id"), col("best.label").as("predicted"))

  /** Conformal ROUTING under a frozen model + frozen threshold — the
    * serving form of the `q_conformal_threshold` gate: per doc the
    * prediction set is {c : best − score_c ≤ thrNanos}; a singleton
    * set auto-labels with the argmax, anything wider routes to
    * review (the expensive teacher). Stateless given (model, thr), so
    * it serves identically per micro-batch in `foreachBatch` — the
    * set/route math runs IN-ROW over the bounded per-doc class-score
    * list, the corpus never shuffles beyond the per-doc score
    * aggregate. Returns (doc_id, predicted, set_size, route). */
  def nbConformalRoute(docs: DataFrame, m: NbModel,
                       thrNanos: Long): DataFrame =
    tokenCounts(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .crossJoin(broadcast(m.classTable
        .select(col("label"), col("prior_nanos"), col("unk_nanos"))))
      .join(m.model, Seq("label", "token"), "left")
      .groupBy(col("doc_id"), col("label"), col("prior_nanos"))
      .agg(sum(col("tcnt")
        * coalesce(col("term_nanos"), col("unk_nanos"))).as("ll"))
      .select(col("doc_id"), col("label"),
        (col("prior_nanos") + col("ll")).as("score"))
      .groupBy(col("doc_id"))
      .agg(max(col("score")).as("best"),
        min(struct((-col("score")).as("neg"), col("label")))
          .getField("label").as("predicted"),
        collect_list(col("score")).as("scores"))
      .select(col("doc_id"), col("predicted"),
        expr(s"cast(size(filter(scores, s -> best - s <= ${thrNanos}L))" +
          " as bigint)").as("set_size"))
      .select(col("doc_id"), col("predicted"), col("set_size"),
        when(col("set_size") === 1L, lit("auto")).otherwise(lit("review"))
          .as("route"))

  /** Confusion matrix of a Naive-Bayes student against the teacher
    * label on held-out docs. `docs` needs (doc_id, text); `label` is
    * the teacher column (computed from the row, or joined in);
    * `trainCutBp` is the hash-split boundary in basis points (8000 =
    * 80/20 train/eval on the same key-stable split as
    * [[Sampling.splitLabel]]). Fused path: train and eval share ONE
    * explode + token-count aggregate over the corpus. */
  def nbConfusion(docs: DataFrame, label: Column, trainCutBp: Int = 8000,
                  maxVocab: Int = 256): DataFrame =
    nbHeldOutPredictions(docs, label, trainCutBp, maxVocab)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))

  /** Per-held-out-doc NB predictions `(doc_id, actual, predicted)` —
    * the pre-aggregation form of [[nbConfusion]], exposed so
    * student-vs-student audits can join predictions doc by doc. */
  def nbHeldOutPredictions(docs: DataFrame, label: Column,
                           trainCutBp: Int = 8000,
                           maxVocab: Int = 256): DataFrame = {
    val (labeled, toks) = teacherToks(docs, label, trainCutBp)
    nbHeldOutFrom(labeled, toks, maxVocab)
  }

  /** One persisted teacher/tokenization pass, shared by every student
    * that trains on the same task — the agreement audit builds this
    * ONCE instead of per student. */
  private def teacherToks(docs: DataFrame, label: Column,
                          trainCutBp: Int): (DataFrame, DataFrame) = {
    val labeled = docs.select(col("doc_id"), label.as("actual"),
      (Sampling.hashBasisPoints(col("doc_id")) < trainCutBp).as("is_train"),
      col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = tokenCounts(labeled, Seq("doc_id", "actual", "is_train"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (labeled, toks)
  }

  /** Per-doc join of both students' held-out predictions off ONE
    * shared teacher/token pass: `(doc_id, actual, nb_pred, rc_pred)`. */
  def studentPredictions(docs: DataFrame, label: Column,
                         trainCutBp: Int = 8000,
                         maxVocab: Int = 256): DataFrame = {
    val (labeled, toks) = teacherToks(docs, label, trainCutBp)
    studentPredictionsFrom(labeled, toks, maxVocab)
  }

  /** [[studentPredictions]] over an already-materialized teacher pass
    * (`labeled`: doc_id/actual/is_train, `toks`: + token/tcnt) — the
    * artifact-consumer form (see [[TeacherArtifact]]). */
  def studentPredictionsFrom(labeled: DataFrame, toks: DataFrame,
                             maxVocab: Int = 256): DataFrame =
    nbHeldOutFrom(labeled, toks, maxVocab)
      .withColumnRenamed("predicted", "nb_pred")
      .join(rocchioHeldOutFrom(labeled, toks, maxVocab)
        .withColumnRenamed("predicted", "rc_pred"),
        Seq("doc_id", "actual"))

  /** [[nbConfusion]] over an already-materialized teacher pass — the
    * artifact-consumer form (see [[TeacherArtifact]]). */
  def nbConfusionFrom(labeled: DataFrame, toks: DataFrame,
                      maxVocab: Int = 256): DataFrame =
    nbHeldOutFrom(labeled, toks, maxVocab)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))

  /** [[rocchioConfusion]] over an already-materialized teacher pass —
    * the artifact-consumer form (see [[TeacherArtifact]]). */
  def rocchioConfusionFrom(labeled: DataFrame, toks: DataFrame,
                           maxVocab: Int = 256): DataFrame =
    rocchioHeldOutFrom(labeled, toks, maxVocab)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))

  /** Per-(held-out doc, class) NB scores `(doc_id, actual, label,
    * score)` — every class scored against every eval doc (the frame
    * the argmax, margin, and conformal machinery all read). Scores
    * are exact BIGINT nano log-likelihoods. */
  def nbHeldOutScoresFrom(labeled: DataFrame, toks: DataFrame,
                          maxVocab: Int = 256): DataFrame = {
    // teacher-label priors straight off the per-doc table — never a
    // distinct over the exploded token stream
    val m = buildModel(
      labeled.filter(col("is_train")).select(col("doc_id"), col("actual")),
      toks.filter(col("is_train")), maxVocab)

    // score held-out docs: BIGINT sum of per-token nanos + class prior
    toks.filter(!col("is_train"))
      .crossJoin(broadcast(m.classTable
        .select(col("label"), col("prior_nanos"), col("unk_nanos"))))
      .join(m.model, Seq("label", "token"), "left")
      .groupBy(col("doc_id"), col("actual"), col("label"), col("prior_nanos"))
      .agg(sum(col("tcnt")
        * coalesce(col("term_nanos"), col("unk_nanos"))).as("ll"))
      .select(col("doc_id"), col("actual"), col("label"),
        (col("prior_nanos") + col("ll")).as("score"))
  }

  private def nbHeldOutFrom(labeled: DataFrame, toks: DataFrame,
                            maxVocab: Int): DataFrame =
    nbHeldOutScoresFrom(labeled, toks, maxVocab)
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("score")).as("neg"), col("label"))).as("best"))
      .select(col("doc_id"), col("actual"),
        col("best.label").as("predicted"))

  /** Rocchio nearest-centroid classifier over tf-idf — the
    * vector-space sibling of the NB student (same teacher, same
    * hash-stable split, same bounded-vocab discipline; a different
    * inductive bias, so disagreement between the two is itself a
    * labeling-quality signal). Per train class, the centroid is the
    * UNNORMALIZED integer sum of per-doc tf·idf weights (tcnt ×
    * floor(ln(N/df)·10⁶) — exact BIGINTs); a held-out doc's score
    * against a class is `dot / sqrt(S2)` where both the dot product
    * and the centroid's squared norm are exact DECIMAL(38) integer
    * sums — one cast, one sqrt, one division on identical expression
    * trees, so both engines rank identically (the doc's own norm is
    * constant across classes and drops out of the argmax). Ties go to
    * the smaller class name; a doc sharing no nonzero-idf vocab token
    * with any centroid falls back to the alphabetically-first class.
    *
    * Scale shape: vocab and idf are one bounded broadcast table;
    * centroids are (classes × vocab) rows, broadcast; scoring is one
    * broadcast join per eval token and a per-(doc, class) integer
    * aggregate — the corpus never shuffles wider than that. */
  def rocchioConfusion(docs: DataFrame, label: Column,
                       trainCutBp: Int = 8000, maxVocab: Int = 256): DataFrame =
    rocchioHeldOutPredictions(docs, label, trainCutBp, maxVocab)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))

  /** Per-held-out-doc Rocchio predictions `(doc_id, actual,
    * predicted)` — the pre-aggregation form of [[rocchioConfusion]],
    * exposed for student-vs-student audits. */
  def rocchioHeldOutPredictions(docs: DataFrame, label: Column,
                                trainCutBp: Int = 8000,
                                maxVocab: Int = 256): DataFrame = {
    val (labeled, toks) = teacherToks(docs, label, trainCutBp)
    rocchioHeldOutFrom(labeled, toks, maxVocab)
  }

  private[operators] def rocchioHeldOutFrom(labeled: DataFrame, toks: DataFrame,
                                 maxVocab: Int): DataFrame = {
    val train = toks.filter(col("is_train"))
    // labeled is one row per doc; train toks are unique per
    // (doc, token) — so both "distinct doc" counts are plain counts,
    // no distinct expansion in either aggregate
    val nTrain = labeled.filter(col("is_train"))
      .agg(count(lit(1)).as("n_train"))
    // bounded vocab head (count desc, token asc) with integer idf
    val vocabIdf = broadcast(
      train.groupBy(col("token"))
        .agg(sum(col("tcnt")).as("gc"), count(lit(1)).as("df"))
        .orderBy(col("gc").desc, col("token"))
        .limit(maxVocab)
        .crossJoin(broadcast(nTrain))
        .select(col("token"),
          floor(log(col("n_train").cast("double") / col("df").cast("double"))
            * lit(1e6)).cast("long").as("idf_micros")))
    // class centroids: exact integer component sums; all-zero
    // components (idf 0 everywhere) are dropped so S2 > 0 for every
    // scored class and no NaN can enter the ranking
    val cent = train.join(vocabIdf, "token")
      .groupBy(col("actual").as("label"), col("token"))
      .agg(sum(col("tcnt") * col("idf_micros")).as("c"))
      .filter(col("c") =!= 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s2 = cent.groupBy(col("label"))
      .agg(sum(col("c").cast("decimal(19,0)") * col("c")).as("s2"))
    val dots = toks.filter(!col("is_train"))
      .join(vocabIdf, "token")
      .select(col("doc_id"), col("actual"), col("token"),
        (col("tcnt") * col("idf_micros")).as("wt"))
      .join(broadcast(cent), "token")
      .groupBy(col("doc_id"), col("actual"), col("label"))
      .agg(sum(col("wt").cast("decimal(19,0)") * col("c")).as("dot"))
    val pred = dots.join(broadcast(s2), "label")
      .select(col("doc_id"), col("actual"), col("label"),
        (col("dot").cast("double") / sqrt(col("s2").cast("double")))
          .as("score"))
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("score")).as("neg"), col("label")))
        .getField("label").as("predicted"))
    val fallback = cent.agg(min(col("label")).as("fb"))
    // eval universe = docs with ≥1 token (same convention as the NB
    // scorer: a token-less doc has no feature vector to classify)
    toks.filter(!col("is_train"))
      .select(col("doc_id"), col("actual")).distinct()
      .join(pred, Seq("doc_id", "actual"), "left")
      .crossJoin(broadcast(fallback))
      .select(col("doc_id"), col("actual"),
        coalesce(col("predicted"), col("fb")).as("predicted"))
  }
}
