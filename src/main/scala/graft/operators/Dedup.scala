package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash), canonical-form (fingerprint), n-gram
  * Jaccard, MinHash+LSH, SimHash. All are built from shuffle-aware
  * primitives:
  *
  *  - exact/fingerprint dedup is a hash aggregate on the digest — one
  *    shuffle on a high-cardinality key, map-side partial aggregation.
  *  - Jaccard/MinHash avoid the O(n²) all-pairs comparison by joining
  *    on shared shingles / LSH band buckets, so cost follows the number
  *    of genuinely-similar pairs, not n².
  *  - SimHash pairs use pigeonhole blocking (4 blocks of 4 bits:
  *    hamming ≤ 3 ⟹ at least one block identical), turning the
  *    all-pairs scan into 4 equality joins.
  *
  * Hashes are md5-based so results are engine-portable (the DuckDB
  * oracles compute the identical digests).
  */
object Dedup {

  /** Distinct shingles per document: `(doc_id, shingle)`. */
  def docShingles(documents: DataFrame, n: Int = 5): DataFrame =
    documents.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.shingles(col("text"), n))).as("shingle"))

  /** Exact + canonical-form duplication stats (single row): total docs,
    * distinct raw texts, distinct canonical fingerprints. */
  def exactStats(documents: DataFrame): DataFrame =
    documents.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique_exact"),
      countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_unique_canonical"))

  /** N-gram Jaccard near-duplicate pairs: join docs on shared shingles,
    * count the intersection, derive |A∪B| from per-doc set sizes.
    * Pairs sharing zero shingles never materialize — the join IS the
    * candidate filter. */
  def jaccardPairs(documents: DataFrame, threshold: Double, n: Int = 5): DataFrame = {
    val sh = docShingles(documents, n)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("sz", "sa"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("sz", "sb"), "db")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("sa") + col("sb") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  val MinhashSeeds = 16
  val BandSize = 4

  /** Portable MinHash: h_seed(shingle) = md5(seed ++ ":" ++ shingle),
    * minimum taken lexicographically over the hex digest — identical in
    * any engine with md5. Returns `(doc_id, seed, minhash)`. */
  def minhashSignatures(documents: DataFrame, n: Int = 5): DataFrame =
    docShingles(documents, n)
      .select(col("doc_id"), col("shingle"),
        explode(sequence(lit(0), lit(MinhashSeeds - 1))).as("seed"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed"), lit(":"), col("shingle")))).as("minhash"))

  /** MinHash LSH near-duplicate candidates with estimated similarity:
    * band the 16-slot signature into 4 bands of 4, bucket-join on
    * identical bands, then estimate J as the fraction of agreeing
    * signature slots. Only same-bucket pairs are ever compared. */
  def minhashLshPairs(documents: DataFrame, minEstSim: Double, n: Int = 5): DataFrame = {
    val sigs = minhashSignatures(documents, n)
    val bands = sigs
      .withColumn("band", floor(col("seed") / BandSize))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws("|",
        transform(sort_array(collect_list(struct(col("seed"), col("minhash")))),
          s => s("minhash")))).as("bandhash"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bandhash") === col("b.bandhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val agree = cands
      .join(sigs.as("sa"), col("da") === col("sa.doc_id"))
      .join(sigs.as("sb"),
        col("db") === col("sb.doc_id") && col("sa.seed") === col("sb.seed"))
      .groupBy(col("da"), col("db"))
      .agg((sum(when(col("sa.minhash") === col("sb.minhash"), 1).otherwise(0)) /
        lit(MinhashSeeds.toDouble)).as("est_sim"))
    agree.filter(col("est_sim") >= minEstSim)
      .select(col("da"), col("db"), round(col("est_sim"), 6).as("est_sim"))
      .orderBy(col("da"), col("db"))
  }

  val SimhashBits = 16

  /** Portable 16-bit SimHash: bit i of a token's contribution is the
    * top bit of nibble i of md5(token) (hex char ≥ '8'); per-doc bit i
    * is set iff the signed sum over tokens is positive. */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val bitExprs = (0 until SimhashBits).map { i =>
      val contrib = aggregate(
        transform(toks, t =>
          when(substring(md5(t), i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
            .otherwise(-1)),
        lit(0), (acc, x) => acc + x)
      when(contrib > 0, lit(1 << i)).otherwise(lit(0))
    }
    bitExprs.reduce(_ + _)
  }

  /** SimHash near-duplicate pairs (hamming ≤ maxHamming ≤ 3) via
    * pigeonhole blocking: split the 16-bit hash into 4 nibble blocks;
    * any pair within hamming 3 shares ≥1 exact block, so 4 equality
    * joins on (block index, block value) replace the n² scan. */
  def simhashPairs(documents: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "pigeonhole blocking holds for hamming <= 3")
    val hashed = documents.select(col("doc_id"), simhash(col("text")).as("sh"))
    val blkval = (0 until 4).map(i =>
        when(col("blk") === i, shiftright(col("sh"), i * 4).bitwiseAND(lit(15))))
      .reduceRight((a, b) => a.otherwise(b))
    val blocks = hashed.select(col("doc_id"), col("sh"),
      explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blkval", blkval)
    val cands = blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blkval") === col("b.blkval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("a.sh").as("sha"),
        col("b.doc_id").as("db"), col("b.sh").as("shb"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }
}
