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
  * aggregates over the train slice; scoring is one broadcast join per
  * eval token — the corpus never shuffles except the per-doc score
  * aggregate. Out-of-vocab tokens take the class's smoothed unknown
  * mass via coalesce, so the scorer is total.
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
    val base = docs.select(col("doc_id"), label.as("actual"),
      (Sampling.hashBasisPoints(col("doc_id")) < trainCutBp).as("is_train"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val toks = base.groupBy(col("doc_id"), col("actual"), col("is_train"),
        col("token"))
      .agg(count(lit(1)).as("tcnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = toks.filter(col("is_train"))

    // teacher-label priors over train docs
    val perDoc = train.select(col("doc_id"), col("actual")).distinct()
    val nTrain = perDoc.agg(count(lit(1)).as("n_train"))
    val classes = perDoc.groupBy(col("actual").as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(nTrain))
      .select(col("label"),
        floor(log(col("n_docs").cast("double") / col("n_train").cast("double"))
          * lit(1e9)).cast("long").as("prior_nanos"))

    // bounded vocabulary: top maxVocab train tokens, deterministic cut
    val vocab = train.groupBy(col("token"))
      .agg(sum(col("tcnt")).as("gc"))
      .orderBy(col("gc").desc, col("token"))
      .limit(maxVocab)
      .select(col("token"))
    val vsize = vocab.agg(count(lit(1)).as("v"))

    // per-(class, vocab token) counts -> smoothed log-likelihood table
    val counts = train.join(broadcast(vocab), Seq("token"))
      .groupBy(col("actual").as("label"), col("token"))
      .agg(sum(col("tcnt")).as("cnt"))
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
