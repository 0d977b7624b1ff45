package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023) over
  * hashed-unigram buckets — the engine's importance-weighted corpus
  * selection core, shared by the batch verify queries
  * (`q_dsir_score` / `q_dsir_resample`, queries/CurationQueries.scala)
  * and the streaming serving path (a FROZEN (ratio table, s_max) pair
  * gates arriving documents per micro-batch; DsirServingSpec proves
  * stream = batch).
  *
  * Log-free by design (the `q_text_lm_score` argument): transcendental
  * `ln` is not correctly-rounded across engines, so the per-bucket
  * importance is the exact add-one-smoothed RATIO in ppm
  * (`(n_t+1)(N_r+B)·10⁶ ÷ (n_r+1)(N_t+B)`, DECIMAL(38) products) and
  * the per-doc score is the exact mean bucket ratio — a monotone
  * surrogate of the geometric-mean likelihood ratio that DuckDB
  * replays bit-for-bit. Acceptance is a deterministic Bernoulli draw:
  * keep iff `u·s_max < score·10⁶` with u the doc's md5-uniform draw in
  * [0, 10⁶).
  *
  * Scale: the model is B=256 rows (broadcastable by construction, the
  * hashing trick — no vocabulary table); scoring joins the broadcast
  * model to the token stream and aggregates per doc; the gate is
  * stateless given the frozen pair, so it serves identically per
  * micro-batch. */
object Dsir {

  val B = 256

  /** Token stream with bucket assignment: (doc_id, source, bucket,
    * is_t). Target distribution = English documents. */
  def tokenBuckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      (col("lang") === "en").as("is_t"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), col("source"),
        pmod(conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
          lit(B.toLong)).as("bucket"),
        col("is_t"))

  /** The importance model: (bucket, n_t, n_r, ratio_ppm) — built once
    * per corpus, exactly B rows. DENSE over all B buckets: a bucket
    * the reference corpus never observed still gets its add-one-
    * smoothed zero-count ratio, so under the frozen-model streaming
    * gate a token hashing to an unseen bucket contributes the
    * smoothed prior instead of silently vanishing from the score
    * mean — and a document whose tokens ALL land in unseen buckets
    * still receives a gate decision rather than dropping out of the
    * stream with neither keep nor reject. */
  def bucketRatios(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    val observed = toks.groupBy(col("bucket"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n_r"))
    val cnt = spark.range(B.toLong).select(col("id").as("bucket"))
      .join(broadcast(observed), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_t"), lit(0L)).as("n_t"),
        coalesce(col("n_r"), lit(0L)).as("n_r"))
    val tot = cnt.agg(sum(col("n_t")).as("cap_t"), sum(col("n_r")).as("cap_r"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_t"), col("n_r"),
        expr(s"cast(cast(n_t + 1 as decimal(38,0)) * (cap_r + $B) * 1000000" +
          s" div (cast(n_r + 1 as decimal(38,0)) * (cap_t + $B)) as bigint)")
          .as("ratio_ppm"))
  }

  /** Per-document importance scores off a (frozen or just-built)
    * ratio table: (doc_id, source, n_toks, score_ppm). */
  def scores(toks: DataFrame, ratio: DataFrame): DataFrame =
    toks.join(broadcast(ratio.select("bucket", "ratio_ppm")), "bucket")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_toks"),
        sum(col("ratio_ppm").cast("decimal(38,0)")).as("s_sum"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        expr("cast(s_sum div n_toks as bigint)").as("score_ppm"))

  /** The deterministic Bernoulli acceptance gate under a frozen
    * normalizer: (doc_id, source, score_ppm, kept). Stateless given
    * (ratio, sMax) — the streaming serving path applies it per
    * micro-batch and DsirServingSpec pins stream = batch. */
  def gate(docs: DataFrame, ratio: DataFrame, sMax: Long): DataFrame =
    scores(tokenBuckets(docs), ratio)
      .select(col("doc_id"), col("source"), col("score_ppm"),
        (pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long"), lit(1000000L))
          * lit(sMax) < col("score_ppm") * lit(1000000L)).as("kept"))
}
