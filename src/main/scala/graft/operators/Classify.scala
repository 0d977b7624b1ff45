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

  /** Confusion matrix of a Naive-Bayes student against the teacher
    * label on held-out docs. `docs` needs (doc_id, text); `label` is
    * the teacher column (computed from the row, or joined in);
    * `trainCutBp` is the hash-split boundary in basis points (8000 =
    * 80/20 train/eval on the same key-stable split as
    * [[Sampling.splitLabel]]). */
  def nbConfusion(docs: DataFrame, label: Column, trainCutBp: Int = 8000,
                  maxVocab: Int = 256): DataFrame = {
    // Evaluate the per-DOC columns in their own projection BELOW the
    // explode: `select(expr, explode(...))` analyzes to Project(expr)
    // ABOVE the Generate, re-evaluating the teacher label (three full
    // text re-tokenizations) and the md5 split once per TOKEN row —
    // measured 18 s vs 1 s at sf0.1. Two selects pin the Project under
    // the Generate (same per-row pitfall as the shinglesHof note in
    // TextAnalysis).
    val labeled = docs.select(col("doc_id"), label.as("actual"),
      (Sampling.hashBasisPoints(col("doc_id")) < trainCutBp).as("is_train"),
      col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = labeled.select(col("doc_id"), col("actual"), col("is_train"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val toks = base.groupBy(col("doc_id"), col("actual"), col("is_train"),
        col("token"))
      .agg(count(lit(1)).as("tcnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = toks.filter(col("is_train"))

    // teacher-label priors straight off the per-doc table — never a
    // distinct over the exploded token stream
    val perDoc = labeled.filter(col("is_train"))
      .select(col("doc_id"), col("actual"))
    val nTrain = perDoc.agg(count(lit(1)).as("n_train"))
    val classes = perDoc.groupBy(col("actual").as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(nTrain))
      .select(col("label"),
        floor(log(col("n_docs").cast("double") / col("n_train").cast("double"))
          * lit(1e9)).cast("long").as("prior_nanos"))

    // ONE train-wide aggregate: per-(class, token) counts; the vocab
    // cut and its marginal derive from this class-count table (tiny),
    // not from a second pass over the token stream
    val countsAll = train
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

    // score held-out docs: BIGINT sum of per-token nanos + class prior
    val scored = toks.filter(!col("is_train"))
      .crossJoin(broadcast(classTable
        .select(col("label"), col("prior_nanos"), col("unk_nanos"))))
      .join(model, Seq("label", "token"), "left")
      .groupBy(col("doc_id"), col("actual"), col("label"), col("prior_nanos"))
      .agg(sum(col("tcnt")
        * coalesce(col("term_nanos"), col("unk_nanos"))).as("ll"))
      .select(col("doc_id"), col("actual"), col("label"),
        (col("prior_nanos") + col("ll")).as("score"))
    scored.groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("score")).as("neg"), col("label"))).as("best"))
      .groupBy(col("actual"), col("best.label").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))
  }
}
