package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ quality: Lloyd-refining the codebooks (per-subspace k-means)
  * must monotonically reduce quantization error — THE k-means
  * guarantee, asserted exactly. Recall@k is additionally bounded:
  * it follows quantization error only statistically, and at this
  * fixture scale (8 queries × top-5 = 40 hit slots) a single rank
  * flip moves recall by 0.025, so the spec allows one flip of noise
  * rather than asserting strict recall monotonicity on a gauge that
  * granular. Ground truth is brute-force squared-L2 top-k over the
  * same corpus universe (ADC approximates L2; on unnormalized
  * vectors cosine ranks differently and would gauge the wrong
  * target). */
class PqRecallSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val (qMax, corpusMin, k) = (8L, 16L, 5)

  private def resultSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def recall(found: Map[Long, Set[Long]],
                     truth: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (q, t) =>
      (found.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }
    hits.sum / truth.size
  }

  private def exactTruth: Map[Long, Set[Long]] = {
    val emb = graft.Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < qMax)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val l2 = aggregate(
      zip_with(col("qvec"), col("embedding"), (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }), lit(0d), (acc, x) => acc + x)
    val scored = emb.filter(col("vec_id") >= corpusMin).crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"), l2.as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id"))
    resultSet(scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k))
  }

  /** Total squared-L2 quantization error of the corpus under a
    * codebook — the per-subspace k-means objective. */
  private def quantError(cb: org.apache.spark.sql.DataFrame): Double = {
    val emb = graft.Tables.embeddings(spark, dir)
    val subs = emb.select(col("vec_id"),
      explode(array((0 until Similarity.PqNumSub).map(s =>
        struct(lit(s).as("sub"),
          slice(col("embedding"), s * Similarity.PqSubDim + 1,
            Similarity.PqSubDim).as("svec"))): _*)).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.svec").as("svec"))
    val l2 = aggregate(
      zip_with(col("svec"), col("cvec"), (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }), lit(0d), (acc, x) => acc + x)
    subs.join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"),
        struct(l2.as("d"), col("cidx")).as("c"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(col("c")).getField("d").as("d"))
      .agg(sum(col("d"))).head().getDouble(0)
  }

  test("refinement monotonically reduces quantization error; recall holds within one flip") {
    val emb = graft.Tables.embeddings(spark, dir)
    val sseSeeded = quantError(Similarity.pqCodebook(emb))
    val sse1 = quantError(Similarity.pqCodebookRefined(emb, 1))
    val sse2 = quantError(Similarity.pqCodebookRefined(emb, 2))
    // k-means' monotone-decrease proof assumes EXACT means; the
    // engine-portable means are millionth-quantized and float-cast,
    // which can shift SSE by up to ~1e-2 at this scale — allow that
    // slack (real per-iteration improvements here are ~10-75)
    val eps = 0.01
    assert(sse1 <= sseSeeded + eps, s"1-iter SSE $sse1 > seeded $sseSeeded")
    assert(sse2 <= sse1 + eps, s"2-iter SSE $sse2 > 1-iter $sse1")

    val truth = exactTruth
    val seeded = resultSet(Similarity.pqSearch(emb, qMax, corpusMin, k))
    val refined = resultSet(
      Similarity.pqSearch(emb, qMax, corpusMin, k, iterations = 2))
    val (rSeeded, rRefined) = (recall(seeded, truth), recall(refined, truth))
    val flip = 1.0 / (truth.size * k) // one rank flip of gauge noise
    assert(rRefined >= rSeeded - flip - 1e-9,
      s"refined recall $rRefined more than one flip below seeded $rSeeded")
    assert(rRefined > 0.0)
  }

  test("refinement preserves the encoding invariant (8 codes per corpus vector)") {
    val emb = graft.Tables.embeddings(spark, dir)
    val cb = Similarity.pqCodebookRefined(emb, iterations = 2)
    // still <= NumCodes codewords per subspace, all 8 subspaces present
    val bySub = cb.groupBy(col("sub")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySub.keySet == (0 until Similarity.PqNumSub).toSet)
    assert(bySub.values.forall(_ <= Similarity.PqNumCodes))
    val enc = Similarity.pqEncode(
      emb.filter(col("vec_id") >= corpusMin), cb)
    val perVec = enc.groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
    assert(perVec.filter(col("n") =!= Similarity.PqNumSub).count() == 0)
  }
}
