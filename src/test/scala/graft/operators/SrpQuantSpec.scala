package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the signed-random-projection LSH near-dup path and
  * the int8 scalar-quantization search path. Ground truth is
  * brute-force cosine over the same corpus. */
class SrpQuantSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("native FloatL2Sq is bit-identical to the zip_with/aggregate formulation") {
    import spark.implicits._
    // real embeddings, both full vectors and PQ-shaped 8-dim slices
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
      .select(
        graft.functions.VectorExpressions.floatL2Sq(col("x"), col("y"))
          .as("native"),
        Similarity.l2sqHof(col("x"), col("y")).as("hof"),
        graft.functions.VectorExpressions
          .floatL2Sq(slice(col("x"), 9, 8), slice(col("y"), 9, 8))
          .as("native_slice"),
        Similarity.l2sqHof(slice(col("x"), 9, 8), slice(col("y"), 9, 8))
          .as("hof_slice"))
      .as[(Double, Double, Double, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (n, h, ns, hs) =>
      assert(java.lang.Double.doubleToRawLongBits(n)
        == java.lang.Double.doubleToRawLongBits(h))
      assert(java.lang.Double.doubleToRawLongBits(ns)
        == java.lang.Double.doubleToRawLongBits(hs))
    }
  }

  test("SRP pairs are verified near-dups: every emitted pair meets the threshold") {
    val emb = graft.Tables.embeddings(spark, dir)
    val pairs = Similarity.srpNearDupPairs(emb, minCos = 0.3).collect()
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.3))
    assert(pairs.forall(r => r.getAs[Long]("va") < r.getAs[Long]("vb")))
    // no pair appears twice (band-collision dedup worked)
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("SRP bucketing is a real filter: candidates stay far below all-pairs") {
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    // at threshold -1 every candidate survives verification, so the
    // output size IS the deduplicated candidate count
    val candidates = Similarity.srpNearDupPairs(emb, minCos = -1.0).count()
    assert(candidates < allPairs / 4,
      s"$candidates candidates of $allPairs pairs — bucketing not selective")
  }

  test("int8 quantization stays in range and preserves the max component") {
    val emb = graft.Tables.embeddings(spark, dir)
    val q = emb.select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .select(array_max(col("q")).as("mx"), array_min(col("q")).as("mn"),
        array_max(transform(col("q"), v => abs(v))).as("amax"))
      .collect()
    assert(q.forall(r => r.getAs[Long]("mx") <= 127L && r.getAs[Long]("mn") >= -127L))
    // scale = 127/max|v| means some component hits ±127 (unless zero vec)
    assert(q.forall(r => r.getAs[Long]("amax") == 127L || r.getAs[Long]("amax") == 0L))
  }

  test("quantized recall@5 is high against the exact baseline") {
    val emb = graft.Tables.embeddings(spark, dir)
    val rec = Similarity.quantizedRecall(emb, queryMaxId = 8, k = 5)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(rec >= 0.6, s"mean recall@5 $rec — int8 quantization lost too much")
  }

  test("PQ/ADC search finds reasonable neighbors and valid codes") {
    val emb = graft.Tables.embeddings(spark, dir)
    val pq = Similarity.pqSearch(emb, queryMaxId = 8, corpusMinId = 16, k = 5)
      .collect()
    assert(pq.length == 8 * 5)
    assert(pq.forall(_.getAs[Long]("vec_id") >= 16L))
    // ADC distances non-decreasing within each query's ranking
    pq.groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("adc"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // codes stay within the codebook range
    val cb = Similarity.pqCodebook(emb)
    assert(cb.count() == 8L * 16L)
  }

  test("BPE pre-tokenizer class counts partition the combined count") {
    import TextAnalysis._
    val df = spark.createDataFrame(Seq(
      (1L, """click {"k": 42} v=-314"""),
      (2L, "plain words only"),
      (3L, "x9y {a:[1,2]} !!")
    )).toDF("id", "line")
    val r = df.select(
      bpeTokenCount(col("line")).as("all"),
      (bpeTokenCount(col("line"), BpeAlpha) + bpeTokenCount(col("line"), BpeNum) +
        bpeTokenCount(col("line"), BpeOther)).as("sum"),
      bpeCharMass(col("line"), BpeAlpha).as("am")).collect()
    r.foreach(row => assert(row.getAs[Int]("all") == row.getAs[Int]("sum")))
    assert(r.forall(_.getAs[Long]("am") > 0L))
  }
}
