package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the batch text/dedup operators' invariants
  * (complementing the exact oracle parity): fingerprint formatting
  * insensitivity, Jaccard bounds/symmetry, simhash self-identity. */
object TextPropSpec extends Properties("TextOps") {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // every case runs Spark jobs; 15 cases per property is plenty
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[String] = Gen.choose(5, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  property("fingerprint ignores case, punctuation and extra whitespace") =
    forAll(doc) { d =>
      val mangled = "  " + d.toUpperCase.replace(" ", "  !! ") + " ,"
      val fps = Seq(d, mangled).toDF("text")
        .select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
      fps(0) == fps(1)
    }

  property("shingle count = max(0, tokens - 4)") = forAll(doc) { d =>
    val got = Seq(d).toDF("text")
      .select(size(TextAnalysis.shingles(col("text")))).as[Int].collect().head
    val n = d.split("\\s+").length
    got == math.max(0, n - 4)
  }

  // messier generator for the native-vs-builtin differential: leading /
  // trailing / repeated whitespace, punctuation, short docs
  private val messyDoc: Gen[String] = for {
    nWords <- Gen.choose(0, 12)
    words <- Gen.listOfN(nWords,
      Gen.oneOf(word, Gen.const("a!b"), Gen.const("..."), Gen.const("x")))
    lead <- Gen.oneOf("", " ", "\t ")
    sep <- Gen.oneOf(" ", "  ", " \t")
    trail <- Gen.oneOf("", " ")
  } yield lead + words.mkString(sep) + trail

  property("native WordShingles == built-in HOF formulation (n=2 and n=5)") =
    forAll(messyDoc) { d =>
      val rows = Seq(d).toDF("text").select(
        TextAnalysis.shingles(col("text"), 5).as("nat5"),
        TextAnalysis.shinglesHof(col("text"), 5).as("hof5"),
        TextAnalysis.shingles(col("text"), 2).as("nat2"),
        TextAnalysis.shinglesHof(col("text"), 2).as("hof2"))
        .as[(Seq[String], Seq[String], Seq[String], Seq[String])].head()
      rows._1 == rows._2 && rows._3 == rows._4
    }

  property("native SimHash64 == built-in aggregate formulation") =
    forAll(Gen.listOfN(3, messyDoc)) { ds =>
      val docs = ds.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val nat = Dedup.simhashDocs(docs)
        .as[(Long, Long)].collect().toMap
      val agg = Dedup.simhashDocsAgg(docs)
        .as[(Long, Long)].collect().toMap
      nat == agg
    }

  property("null-text docs drop from simhash in both formulations") =
    forAll(doc) { d =>
      val docs = Seq((1L, d), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      val nat = Dedup.simhashDocs(docs).as[(Long, Long)].collect().toMap
      val agg = Dedup.simhashDocsAgg(docs).as[(Long, Long)].collect().toMap
      nat == agg && nat.keySet == Set(1L)
    }

  property("native RollingTokenHashes == built-in HOF formulation") =
    forAll(messyDoc) { d =>
      val rows = Seq(d).toDF("text").select(
        TextAnalysis.rollingHashes(col("text")).as("nat"),
        TextAnalysis.rollingHashesHof(col("text")).as("hof"))
        .as[(Seq[Long], Seq[Long])].head()
      rows._1 == rows._2
    }

  property("identical docs: jaccard 1.0; est_sim 1.0; simhash hamming 0") =
    forAll(doc) { d =>
      val docs = Seq((1L, d), (2L, d)).toDF("doc_id", "text")
      val j = Dedup.jaccardPairs(docs, 0.99).select("jaccard").as[Double].collect()
      val m = Dedup.minhashLshPairs(docs, 0.99).select("est_sim").as[Double].collect()
      val s = Dedup.simhashPairs(docs, 0).select("hamming").as[Int].collect()
      j.sameElements(Array(1.0)) && m.sameElements(Array(1.0)) &&
        s.sameElements(Array(0))
    }

  property("quality score stays within [0, 1]") = forAll(doc) { d =>
    val q = Seq(d).toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).as[Double].collect().head
    q >= 0.0 && q <= 1.0
  }

  // containment dominates jaccard: J = common/union <= common/|side|
  // for both sides, so any pair's jaccard never exceeds min(c_ab, c_ba)
  property("jaccard <= min containment on every pair") =
    forAll(doc, doc) { (d1, d2) =>
      val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      val cont = Dedup.containmentPairs(docs, 0.0)
        .select("c_ab", "c_ba").as[(Double, Double)].collect()
      val jac = Dedup.jaccardPairs(docs, 0.0)
        .select("jaccard").as[Double].collect()
      (cont.isEmpty && jac.isEmpty) || {
        val (ab, ba) = cont.head
        // 6dp rounding on each side leaves at most 1e-6 of slack
        jac.head <= math.min(ab, ba) + 1e-6 &&
          ab >= 0.0 && ab <= 1.0 && ba >= 0.0 && ba <= 1.0
      }
    }
}
