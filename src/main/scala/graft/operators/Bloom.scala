package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter membership sketch — the screening
  * primitive for incremental ingest dedup: before the (join-heavy)
  * exact/near-dup machinery runs, a new batch probes a compact bit
  * sketch of the existing corpus's canonical fingerprints and only
  * "maybe present" rows continue to exact verification. False
  * positives cost one extra verification; false negatives are
  * impossible — exactly the asymmetry an ingest screen wants.
  *
  * Construction is md5-based and engine-portable (the DuckDB oracle
  * rebuilds the identical sketch): the k=4 bit positions of a key are
  * the 4 independent 32-bit chunks of its md5 digest mod m. Words are
  * 32 bits wide so every mask value stays positive in BIGINT on both
  * engines (1L << 63 overflow semantics differ; 32-bit words never get
  * there).
  *
  * Scale shape: the build is one hash aggregate over (word, mask) rows
  * — map-side `bit_or` partials, shuffle of at most `NumWords` rows
  * per partition; the finished sketch is `NumWords` rows total,
  * broadcastable by construction at any corpus size (size the filter
  * by raising NumWords — mechanics unchanged). Probing is a broadcast
  * join of the sketch against the batch's exploded positions plus one
  * count-matches aggregate. */
object Bloom {

  val BitsPerWord = 32
  val NumWords = 8192 // m = 2^18 bits: ~0.3% FP at ~20k keys, k=4
  val NumHashes = 4

  val NumBits: Int = NumWords * BitsPerWord
  private val M = NumBits

  /** The k bit positions of a key: md5 chunk i (32-bit big-endian) mod
    * m, for i in 0 until k. */
  def positions(key: Column): Seq[Column] =
    (0 until NumHashes).map { i =>
      conv(substring(md5(key), i * 8 + 1, 8), 16, 10).cast("long") % lit(M)
    }

  /** Exploded `(word, mask)` rows for a key column. */
  private def wordMasks(df: DataFrame, key: Column): DataFrame =
    df.select(explode(array(positions(key): _*)).as("pos"))
      .select((col("pos") / lit(BitsPerWord)).cast("long").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $BitsPerWord AS INT))")
          .as("mask"))

  /** Build the sketch from a key column: `(word, bits)`, one row per
    * word that has at least one bit set. */
  def build(df: DataFrame, key: Column): DataFrame =
    wordMasks(df, key)
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("bits"))

  /** Probe: for each row of `batch`, `maybe = true` iff all k bits of
    * `key` are set in the sketch. Returns `batch` with the extra
    * boolean column. `idCol` must identify probe rows uniquely. */
  def probe(batch: DataFrame, idCol: String, key: Column,
            sketch: DataFrame): DataFrame = {
    val probes = batch
      .select(col(idCol), explode(array(positions(key): _*)).as("pos"))
      .select(col(idCol),
        (col("pos") / lit(BitsPerWord)).cast("long").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $BitsPerWord AS INT))")
          .as("mask"))
    val hits = probes.join(broadcast(sketch), "word")
      .filter((col("bits").bitwiseAND(col("mask"))) =!= 0)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    batch.join(hits, Seq(idCol), "left")
      .withColumn("maybe",
        coalesce(col("n_hits"), lit(0L)) === lit(NumHashes.toLong))
      .drop("n_hits")
  }
}
