package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch operator unit tests on tiny literal datasets (the oracle
  * parity harness covers the full testdata; these pin the semantics on
  * hand-checkable inputs). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("canonicalizeType: aliases, case-insensitivity, fallback") {
    val df = Seq("SIGNUP", "event-purchase", "click", "garbage", "Sign-Up")
      .toDF("raw")
      .select(Unify.canonicalizeType(col("raw"), lit("fallback")).as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("signup", "purchase", "click", "fallback", "signup"))
  }

  test("shingles: 5-gram windows, short docs yield empty") {
    val df = Seq("a b c d e f", "a b").toDF("text")
      .select(TextAnalysis.shingles(col("text")).as("s"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c d e", "b c d e f"))
    assert(got(1).isEmpty)
  }

  test("quality score components on a known doc") {
    val df = Seq("the cat sat on the mat").toDF("text").select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.stopwordCount(col("text")).as("stop"),
      TextAnalysis.distinctTokenCount(col("text")).as("uniq"))
    val r = df.collect().head
    assert(r.getInt(0) == 6 && r.getInt(1) == 2 && r.getInt(2) == 5)
  }

  test("fingerprint is formatting-insensitive") {
    val df = Seq("Hello,  World!", "hello world").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("jaccardPairs finds near-dups and skips dissimilar docs") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"), // shares 5 of 11 shingle-sets
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("containmentPairs catches subsumption that Jaccard misses") {
    // doc 1 (10 tokens) appears verbatim inside doc 2 (30 tokens):
    // containment of 1 in 2 is exactly 1.0, while Jaccard is
    // 6/26 ≈ 0.23 (6 shared shingles, 26 in the union) — below any
    // useful near-dup threshold.
    val inner = (1 to 10).map(i => s"w$i").mkString(" ")
    val outer = ((1 to 10).map(i => s"w$i") ++
      (1 to 20).map(i => s"z$i")).mkString(" ")
    val docs = Seq(
      (1L, inner), (2L, outer),
      (3L, (1 to 10).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, 0.9)
      .select("da", "db", "c_ab", "c_ba")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(cont == Seq((1L, 2L, 1.0, 0.230769))) // round(6/26, 6)
    assert(Dedup.jaccardPairs(docs, 0.5).count() == 0)
  }

  test("df-cap above the corpus max df is a no-op for both overlap metrics") {
    val docs = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")),
      (2L, ((1 to 9).map(i => s"w$i") ++ Seq("x", "y", "z")).mkString(" ")),
      (3L, (1 to 12).map(i => s"p$i").mkString(" "))
    ).toDF("doc_id", "text")
    // max shingle df here is 2; a cap of 100 must change nothing
    val jExact = Dedup.jaccardPairs(docs, 0.1).collect().toSeq
    val jCapped = Dedup.jaccardPairs(docs, 0.1, maxDf = Some(100)).collect().toSeq
    assert(jExact == jCapped && jExact.nonEmpty)
    val cExact = Dedup.containmentPairs(docs, 0.1).collect().toSeq
    val cCapped = Dedup.containmentPairs(docs, 0.1, maxDf = Some(100)).collect().toSeq
    assert(cExact == cCapped && cExact.nonEmpty)
  }

  test("subsumptionTrim drops the contained doc, not the min id") {
    // doc 2 (the SMALLER id) is the larger, containing doc: a min-id
    // keep rule would wrongly keep the fragment 5 and drop 2
    val inner = (1 to 10).map(i => s"w$i").mkString(" ")
    val outer = ((1 to 10).map(i => s"w$i") ++
      (1 to 20).map(i => s"z$i")).mkString(" ")
    val docs = Seq(
      (5L, inner, "s0"), (2L, outer, "s0"),
      (9L, (1 to 10).map(i => s"q$i").mkString(" "), "s1")
    ).toDF("doc_id", "text", "source")
    val rows = Dedup.subsumptionTrim(docs, 0.9)
      .select("source", "n_docs", "n_kept", "n_subsumed")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(("s0", 2L, 1L, 1L), ("s1", 1L, 1L, 0L)))
    // and the survivor is the container (doc 2), not the fragment
    val victims = Dedup.containmentPairs(docs, 0.9)
      .select("da", "db", "c_ab", "c_ba")
      .as[(Long, Long, Double, Double)].collect().head
    assert(victims._3 < victims._4) // da=2 (container) less contained than db=5
  }

  test("quality gates: every rule is exercised in both directions") {
    val rows = graft.queries.TextQueries.qTextGates
      .run(spark, "/root/testdata/sf0.001")
      .select(col("n_docs"), col("n_pass_len"), col("n_pass_wordlen"),
        col("n_pass_stopword"), col("n_pass_repetition"), col("n_pass_all"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val total = rows.map(_._1).sum
    def sumCol(f: ((Long, Long, Long, Long, Long, Long)) => Long) = rows.map(f).sum
    // a gate that passes or fails EVERYTHING is dead weight — each must
    // discriminate somewhere in the corpus
    Seq[((Long, Long, Long, Long, Long, Long)) => Long](
      _._2, _._3, _._4, _._5).foreach { f =>
      assert(sumCol(f) > 0 && sumCol(f) < total, s"degenerate gate: ${sumCol(f)}/$total")
    }
    // all-gates pass is the intersection: never exceeds any single gate
    assert(sumCol(_._6) <= Seq(sumCol(_._2), sumCol(_._3), sumCol(_._4), sumCol(_._5)).min)
  }

  test("OOV rate: top-25 vocab leaves a real but minority tail") {
    val rows = graft.queries.CurationQueries.qTextOov
      .run(spark, "/root/testdata/sf0.001")
      .select(col("n_tokens"), col("n_oov"), col("oov_rate"))
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 20)
    rows.foreach { case (nt, oov, rate) =>
      assert(oov > 0 && oov < nt / 2, s"$oov of $nt OOV")
      assert(rate > 0.0 && rate < 0.5)
    }
  }

  test("simhash of identical docs matches; near-identical within hamming 3") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "qq ww ee rr tt yy uu ii")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, 3)
      .select("da", "db", "hamming").as[(Long, Long, Int)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0)))
  }

  test("cosine: orthogonal=0, identical=1, known angle") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(1f, 0f), Array(1f, 1f))
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect().toSeq
    assert(got(0) == 0.0 && got(1) == 1.0 && math.abs(got(2) - 0.707107) < 1e-6)
  }

  test("knnBruteForce ranks by cosine desc with id tiebreak") {
    val e = Seq(
      (0L, Array(1f, 0f), 0), // query
      (10L, Array(1f, 0.1f), 1),
      (11L, Array(1f, 1f), 1),
      (12L, Array(-1f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnBruteForce(e, queryMaxId = 1, k = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L))
  }

  test("vectorHealth: empty and null embeddings count as zero-norm, not NULL") {
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f), 0),
      (2L, Array.empty[Float], 0),
      (3L, null.asInstanceOf[Array[Float]], 0)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.vectorHealth(vecs)
      .select(col("dim"), col("norm")).as[(Long, Double)].collect().toSet
    // the degenerate rows surface as (0, 0.0) — countable by the gate —
    // instead of vanishing from min/max/avg as NULLs
    assert(rows == Set((2L, 5.0), (0L, 0.0)))
  }

  test("embedding health gate: unit-norm corpus reads clean") {
    val rows = graft.queries.SimilarityQueries.qEmbedHealth
      .run(spark, "/root/testdata/sf0.001")
      .select(col("dim_lo"), col("dim_hi"), col("n_zero"), col("norm_lo"),
        col("norm_hi"), col("avg_norm"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lo, hi, zero, nlo, nhi, avg) =>
      assert(lo == 64L && hi == 64L, "mixed dimensions")
      assert(zero == 0L, "zero-norm vectors present")
      // unit-normalized fixture: the whole envelope hugs 1.0
      assert(nlo > 0.999 && nhi < 1.001 && math.abs(avg - 1.0) < 1e-3)
    }
  }

  test("multimodal decodeBatch: stub metadata + content hash") {
    val recs = spark.createDataset(Seq(Multimodal.MediaRecord(
      7L, "hello".getBytes("UTF-8"), "text/plain")))(Multimodal.mediaRecordEnc)
    val meta = Multimodal.decodeBatch(recs).collect().head
    assert(meta.id == 7L && meta.nBytes == 5L)
    assert(meta.contentHash == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(meta.width == 64 + 5 && meta.height == 64 + 5)
  }

  test("minhash LSH: identical docs always candidate with est_sim 1.0") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "p q r s t u v w x y")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(docs, 0.5)
      .select("da", "db", "est_sim").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
  }
}
