package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch — the frequency-estimation
  * counterpart of [[Bloom]]'s membership sketch. A training-data
  * pipeline uses it to find heavy hitters (boilerplate n-grams, spam
  * templates, hot join keys) without materializing the full exact
  * frequency table: the sketch is `Depth × Width` counters regardless
  * of key cardinality, so it broadcasts at any corpus size.
  *
  * Construction is md5-based and engine-portable (the DuckDB oracle
  * rebuilds the identical sketch): hash row `i` of a key indexes
  * counter `chunk_i(md5(key)) mod Width`, where `chunk_i` is the
  * i-th independent 32-bit big-endian slice of the digest — the same
  * position recipe [[Bloom]] uses for bits.
  *
  * Estimates are biased one way only: `est >= exact` always (each
  * counter sums the true count plus non-negative collision mass), and
  * taking the MIN over the `Depth` rows makes large overestimates
  * exponentially unlikely. That one-sided error is what makes the
  * sketch safe as a screen — a key the sketch calls rare IS rare.
  *
  * Scale shape: the build is one hash aggregate over `(row, col)`
  * cells — map-side `count` partials, shuffle of at most
  * `Depth × Width` rows per partition; the finished sketch is at most
  * `Depth × Width` rows total, broadcastable by construction. Probing
  * is a broadcast join plus a min aggregate over `Depth` rows per key.
  */
object Sketches {

  /** Independent hash rows (md5 has 4 disjoint 32-bit chunks). */
  val Depth = 4

  /** Counters per row; 4096 × 4 rows ≈ 128 KiB of longs — raise for
    * bigger key spaces, mechanics unchanged. */
  val Width = 4096

  /** The per-row counter positions of a key: md5 chunk i mod Width. */
  def positions(key: Column): Seq[Column] =
    (0 until Depth).map { i =>
      conv(substring(md5(key), i * 8 + 1, 8), 16, 10).cast("long") % lit(Width.toLong)
    }

  /** Build the sketch from a key column (one input row = one
    * occurrence): `(hr, hc, cnt)`, one row per non-zero counter. */
  def build(df: DataFrame, key: Column): DataFrame =
    df.select(posexplode(array(positions(key): _*)).as(Seq("hr", "hc")))
      .groupBy(col("hr"), col("hc"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate occurrence counts for the keys in `keys`
    * (distinct rows, one key column named `keyCol`): min over the
    * Depth row counters. A key never inserted estimates 0. */
  def estimate(keys: DataFrame, keyCol: String, sketch: DataFrame): DataFrame =
    keys
      .select(col(keyCol),
        posexplode(array(positions(col(keyCol)): _*)).as(Seq("hr", "hc")))
      .join(broadcast(sketch), Seq("hr", "hc"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** AMS-style equi-join cardinality estimate from two sketches built
    * by [[build]] over the respective join keys: per hash row, the
    * inner product of co-located counters; the estimate is the MIN
    * over rows. `est >= |A ⋈ B|` always — each cell product is the
    * true per-key frequency product plus non-negative collision
    * cross-terms — the same one-sided guarantee as [[estimate]].
    * Both inputs are ≤ Depth × Width rows, so the estimate costs a
    * tiny join + agg no matter how large the sketched inputs were:
    * this is the planner probe that decides broadcast vs shuffle vs
    * skew-salting BEFORE paying for the join. Products accumulate in
    * DECIMAL(38,0) — two 100 TB-scale counters can multiply past
    * BIGINT. One row, one BIGINT column `cms_est`. */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame): DataFrame =
    sketchA.withColumnRenamed("cnt", "cnt_a")
      .join(sketchB.withColumnRenamed("cnt", "cnt_b"), Seq("hr", "hc"))
      .groupBy(col("hr"))
      .agg(sum(col("cnt_a").cast("decimal(19,0)") * col("cnt_b")).as("dot"))
      .agg(coalesce(min(col("dot")), lit(0)).as("dotmin"))
      // saturate, don't null: a min-dot beyond Long range would turn
      // into NULL under Spark's non-ANSI decimal→long cast; the probe
      // should degrade to "as large as representable" instead
      .select(least(col("dotmin"), lit(Long.MaxValue).cast("decimal(38,0)"))
        .cast("long").as("cms_est"))

  /** HyperLogLog registers (m = [[HllM]]): first md5 chunk mod m
    * buckets the key, the 1-based leading-zero rank of the second
    * 32-bit chunk is the observation, MAX per (group, register) is
    * the state. Insertion is idempotent (duplicates free) and the
    * state is mergeable by register-wise max — the two properties
    * that let a 1000-executor rollup combine partial sketches without
    * re-reading anything. ≤ m rows per group. */
  def hllRegisters(df: DataFrame, key: Column, group: Column): DataFrame =
    df.select(group.as("g"), md5(key).as("hx"))
      .select(col("g"),
        (conv(substring(col("hx"), 1, 8), 16, 10).cast("long")
          % lit(HllM.toLong)).as("idx"),
        conv(substring(col("hx"), 9, 8), 16, 10).cast("long").as("c1"))
      .select(col("g"), col("idx"), expr(HllRankCaseSql).as("rank"))
      .groupBy(col("g"), col("idx")).agg(max(col("rank")).as("mr"))

  /** Merge register tables across groups into one labelled group —
    * register-wise max, the HLL union. */
  def hllMerge(regs: DataFrame, label: String): DataFrame =
    regs.groupBy(col("idx")).agg(max(col("mr")).as("mr"))
      .select(lit(label).as("g"), col("idx"), col("mr"))

  /** Raw HLL cardinality estimate per group from a register table:
    * the harmonic sum Σ 2^(-rank) is carried as an exact BIGINT
    * scaled by 2^40 (absent registers contribute 2^40 = rank 0), so
    * the single double division at the end is the only inexact step.
    * No small-range (linear-counting) correction — callers get the
    * raw estimator and judge it against ground truth. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("g"))
      .agg(sum(expr("CAST(pow(2, 40 - mr) AS BIGINT)")).as("s_nz"),
        count(lit(1)).as("nz"))
      .select(col("g"),
        (col("s_nz") + (lit(HllM.toLong) - col("nz")) * lit(1L << 40)).as("s"))
      .select(col("g"), expr(HllEstSql).as("est_raw"))

  /** Deterministic bottom-k sample per group (KMV-style): the k rows
    * whose unique key has the smallest md5 rank — a uniform sample
    * that every engine and every run draws identically. Mergeable:
    * the global bottom-k of a union is a subset of the concatenated
    * per-part bottom-k samples (a global winner wins its part too),
    * so partial samples roll up via [[bottomKResample]] without
    * revisiting any input row. The per-group window sorts only within
    * hash partitions of the group key — no global exchange. Output
    * `(g, id, v)`. */
  def bottomKSample(df: DataFrame, key: Column, value: Column,
                    group: Column, k: Int): DataFrame =
    df.select(group.as("g"), key.cast("string").as("id"), value.as("v"))
      .withColumn("hk", md5(col("id")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("hk"), col("id"))))
      .filter(col("rn") <= k)
      .select(col("g"), col("id"), col("v"))

  /** Merge partial bottom-k samples into one group: re-rank the union
    * under the SAME hash and keep the global bottom-k. Deliberately an
    * `orderBy().limit()` — Spark plans a distributed
    * TakeOrderedAndProject (per-partition top-k + tiny driver merge),
    * never a single-partition window, and the input is already ≤
    * k·groups rows. */
  def bottomKResample(samples: DataFrame, label: String, k: Int): DataFrame =
    samples.select(lit(label).as("g"), col("id"), col("v"))
      .withColumn("hk", md5(col("id")))
      .orderBy(col("hk"), col("id"))
      .limit(k)
      .select(col("g"), col("id"), col("v"))

  /** Discrete (type-1) quantiles from bottom-k samples: per group, the
    * sample value at 1-based index `((n−1)·pbp) div 10000 + 1` of the
    * value-sorted sample, `pbp` in basis points — pure integer index
    * selection, no interpolation, so both engines pick the identical
    * element. Windows span ≤ k rows per group. Output
    * `(g, pbp, est)`. */
  def sampleDiscQuantiles(sample: DataFrame, pbps: Seq[Int]): DataFrame = {
    val ranked = sample.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v"), col("id"))))
    val wanted = sample.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .select(col("g"), col("n"),
        explode(array(pbps.map(p => lit(p)): _*)).as("pbp"))
      .withColumn("rn", expr("((n - 1) * pbp) div 10000 + 1"))
    ranked.join(wanted, Seq("g", "rn"))
      .select(col("g"), col("pbp"), col("v").as("est"))
  }

  /** HLL register count (2^8 buckets → ~6.5% standard error). */
  val HllM = 256

  /** Rank of the first set bit of the 32-bit value `c1` (1-based
    * leading-zero count, 33 for zero) — generated CASE text shared
    * verbatim with oracle SQL so both engines run the same branches. */
  val HllRankCaseSql: String = (1 to 32)
    .map(r => s"WHEN c1 >= ${1L << (32 - r)} THEN $r")
    .mkString("CASE ", " ", " ELSE 33 END")

  /** alpha_256 · m² · 2^40 / s over the scaled harmonic sum `s`. The
    * e0 exponents force DOUBLE literals in both engines — a bare
    * 0.7213 parses as DECIMAL in both Spark and DuckDB, whose
    * decimal-division scale rules differ. */
  val HllEstSql: String = "0.7213e0 / (1e0 + 1.079e0 / 256e0) * 65536e0" +
    " * 1099511627776e0 / CAST(s AS DOUBLE)"

  /** Self-join (second frequency moment) estimate from ONE sketch:
    * Σ cnt² per row, min over rows — identical values to
    * [[joinSizeEstimate]](s, s) (the self-join matches each cell with
    * itself exactly once) from a single build and no sketch join. */
  def selfJoinSizeEstimate(sketch: DataFrame): DataFrame =
    sketch.groupBy(col("hr"))
      .agg(sum(col("cnt").cast("decimal(19,0)") * col("cnt")).as("dot"))
      .agg(coalesce(min(col("dot")), lit(0)).as("dotmin"))
      // same saturating cast as joinSizeEstimate
      .select(least(col("dotmin"), lit(Long.MaxValue).cast("decimal(38,0)"))
        .cast("long").as("cms_est"))

  /** Exact second frequency moment Σ na² from one frequency
    * aggregate — the self-join ground truth without the
    * frequency-table self-join. */
  def exactSelfJoinSize(a: DataFrame, aKey: Column): DataFrame =
    a.groupBy(aKey.as("k")).agg(count(lit(1)).as("na"))
      .agg(coalesce(sum(col("na").cast("decimal(19,0)") * col("na")), lit(0))
        .cast("long").as("n_exact"))

  /** Exact equi-join cardinality WITHOUT materializing the join:
    * per-key frequencies on each side (map-side-combinable counts),
    * one key-aligned join of the two (distinct-key-sized) frequency
    * tables, then Σ na·nb. The ground truth [[joinSizeEstimate]] is
    * judged against — and itself the scale-sane way to size a join. */
  def exactJoinSize(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column): DataFrame =
    a.groupBy(aKey.as("k")).agg(count(lit(1)).as("na"))
      .join(b.groupBy(bKey.as("k")).agg(count(lit(1)).as("nb")), "k")
      .agg(coalesce(sum(col("na").cast("decimal(19,0)") * col("nb")), lit(0))
        .cast("long").as("n_exact"))
}
