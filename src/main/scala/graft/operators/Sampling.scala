package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * At corpus scale, `rand()`-based sampling is a liability: it is not
  * reproducible across retries/engines, and it cannot be pushed into
  * each side of a join consistently. Hashing a stable key into basis
  * points gives a sample that is (a) reproducible everywhere md5
  * exists, (b) consistent — the same key is in or out of the sample in
  * every table and every run, so sampled fact/dim joins stay aligned,
  * and (c) a pure scalar predicate: no shuffle, no state, codegen'd
  * into the scan.
  */
object Sampling {

  /** Stable hash of a key into basis points [0, 10000): the first
    * 8 hex chars of md5 as an integer, mod 10⁴. Engine-portable (the
    * DuckDB oracles recompute it digit-by-digit). */
  def hashBasisPoints(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(10000L))

  /** Uniform deterministic sample: keeps ~`fraction` of rows, exactly
    * the same rows on every run/engine. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBasisPoints(key) < math.round(fraction * 10000).toInt)

  /** Stratified deterministic sample: per-stratum keep fractions with
    * a default for unlisted strata — downsample over-represented
    * classes (the canonical training-mix operation) without a shuffle
    * or a count pass. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 1.0): DataFrame = {
    val threshold = fractions.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, f)) => acc.when(stratum === s, lit(math.round(f * 10000).toInt))
    }.otherwise(lit(math.round(defaultFraction * 10000).toInt))
    df.filter(hashBasisPoints(key) < threshold)
  }

  /** Weighted deterministic sample: each row's keep probability is a
    * per-row weight expression in [0, 1] (e.g. a quality score — the
    * quality-weighted mixing step of corpus prep). Acceptance is
    * `hash(key) bp < floor(weight·10⁴ + 0.5)`: still a pure scalar
    * predicate (no shuffle, no count pass), reproducible everywhere,
    * and monotone in the weight — raising a doc's quality can only
    * move it INTO the sample, never out past another. Weight must be
    * deterministic per row (the same row samples identically in every
    * run and engine). */
  def weightedHashSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.filter(hashBasisPoints(key) <
      floor(weight.cast("double") * lit(10000d) + lit(0.5)).cast("long"))

  /** Fixed-size per-group sample: exactly `min(k, |group|)` rows per
    * group, chosen by ranking each group on `md5(key)` — the
    * deterministic analogue of per-stratum reservoir sampling
    * (eval-set carving, per-source spot-check pulls). The md5 order is
    * uniform and independent of storage order, so the k rows are an
    * unbiased fixed-seed draw, identical on every run and engine.
    *
    * Scale shape (round 5): the draw is the k smallest (md5, key)
    * items per group through the bounded top-k aggregate
    * ([[graft.functions.TopKLongAgg]] with a constant score — ties
    * resolve item-ascending, i.e. md5 order), and the selected keys
    * broadcast-join back to restore the payload. The input is scanned
    * twice but NEVER shuffles (the earlier window formulation
    * shuffled and sorted every group); the selection table is
    * k·groups rows, broadcastable at any corpus width. Null keys are
    * never drawn (md5(null) is null — same exclusion either way for
    * the non-null keys this samples). */
  def fixedKPerGroup(df: DataFrame, key: Column, group: Column,
                     k: Int): DataFrame = {
    // md5 hex is fixed 32 chars, so item order = (md5, key) order;
    // the NUL separator sits below every key character
    val sel = df
      .select(group.as("_g"),
        concat(md5(key.cast("string")), lit("\u0000"),
          key.cast("string")).as("_item"))
      .groupBy(col("_g"))
      .agg(graft.functions.TopKLongAgg(lit(0L), col("_item"), k).as("_top"))
      .select(col("_g"), posexplode(col("_top")))
      .select(col("_g"), expr("substring(col.item, 34)").as("_key"),
        (col("pos") + 1).cast("int").as("sample_rank"))
    df.join(broadcast(sel),
        group === col("_g") && key.cast("string") === col("_key"))
      .drop("_g", "_key")
  }

  /** Weighted fixed-size per-group sample — the deterministic
    * Efraimidis-Spirakis reservoir: each row draws the key
    * u^(1/w) with u the md5-derived uniform (bp + 0.5)/10⁴ and w its
    * weight, and the k LARGEST keys per group win. Inclusion
    * probability is proportional to weight (the quality-weighted eval
    * draw), raising a row's weight can only pull it INTO the sample,
    * and the whole draw replays identically on every run/engine.
    *
    * Ranking happens on the monotone transform floor(ln(u)/w · 10⁹):
    * ln(u) and the divide are single IEEE ops on identical doubles in
    * both engines, and the floor makes the comparison integer-exact —
    * the same ln-nanos contract as the JSD/entropy gauges. Weights
    * clamp below at 10⁻⁶ (a zero weight would divide to -∞; clamped
    * rows still rank strictly below any realistically-weighted row).
    *
    * Scale shape: identical to [[fixedKPerGroup]] — map tasks keep k
    * entries per group through the bounded top-k aggregate, the
    * k·groups selection broadcast-joins the payload back; two scans,
    * zero input shuffle. */
  def weightedFixedKPerGroup(df: DataFrame, key: Column, group: Column,
                             weight: Column, k: Int): DataFrame = {
    val u = (hashBasisPoints(key).cast("double") + lit(0.5)) / lit(10000d)
    val score = floor(log(u)
      / greatest(weight.cast("double"), lit(1e-6)) * lit(1e9)).cast("long")
    val sel = df
      .select(group.as("_g"), score.as("_s"), key.cast("string").as("_item"))
      .groupBy(col("_g"))
      .agg(graft.functions.TopKLongAgg(col("_s"), col("_item"), k).as("_top"))
      .select(col("_g"), posexplode(col("_top")))
      .select(col("_g"), col("col.item").as("_key"),
        (col("pos") + 1).cast("int").as("sample_rank"))
    df.join(broadcast(sel),
        group === col("_g") && key.cast("string") === col("_key"))
      .drop("_g", "_key")
  }

  /** Deterministic train/val/test (or arbitrary) split assignment:
    * each row's split label is decided by its key's hash basis points
    * against cumulative upper bounds, e.g.
    * `Seq("train" -> 9800, "val" -> 9900, "test" -> 10000)`.
    *
    * The split is a pure scalar expression of the key — no shuffle, no
    * global sort, no count pass — and carries the two properties a
    * training pipeline needs at corpus scale: the same document lands
    * in the same split in every run, engine, and table it appears in
    * (so features/labels/metadata never straddle splits), and
    * re-running over a grown corpus never reassigns an existing key.
    * The final bound must be 10000 so every row gets a label. */
  def splitLabel(key: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 10000,
      "cuts must be cumulative basis-point bounds ending at 10000")
    val bp = hashBasisPoints(key)
    cuts.init.foldLeft(when(lit(false), lit(""))) {
      case (acc, (name, hi)) => acc.when(bp < hi, lit(name))
    }.otherwise(lit(cuts.last._1))
  }
}
