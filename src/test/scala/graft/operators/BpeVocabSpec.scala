package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the learned BPE vocabulary artifact
  * ([[BpeVocabArtifact]]): merge rules are well-formed and the stored
  * decompositions are faithful (symbols re-concatenate to the word;
  * every merged symbol is either a single char or a learned merge
  * product; symbol counts bound by word length). */
class BpeVocabSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("learned merges: distinct adjacent pairs, rank-1 is the global best pair") {
    import spark.implicits._
    val merges = BpeVocabArtifact.merges(spark, dir)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(merges.length == BpeVocabArtifact.Rounds)
    assert(merges.map(_._1).toSeq == (1 to BpeVocabArtifact.Rounds))
    // each rule merges exactly two symbols
    merges.foreach { case (_, pair, merged, cnt) =>
      assert(pair.split(" ").length == 2 && merged == pair.replace(" ", ""))
      assert(cnt > 0)
    }
    assert(merges.map(_._2).distinct.length == merges.length,
      "the same pair cannot win twice: after merging it never recurs")
    // rank-1 = the most frequent character bigram over the raw
    // word-frequency table, recomputed brute force
    val words = graft.Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect()
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      val cs = w.toCharArray
      (0 until cs.length - 1).foreach { i =>
        val p = s"${cs(i)} ${cs(i + 1)}"
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
      }
    }
    val best = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert((merges.head._2, merges.head._4) == best)
  }

  test("stored decompositions are faithful and consistent with the rules") {
    import spark.implicits._
    val merged = BpeVocabArtifact.merges(spark, dir)
      .select(col("merged")).as[String].collect().toSet
    val reprs = BpeVocabArtifact.reprs(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(reprs.nonEmpty)
    reprs.foreach { case (w, repr, _, nSym) =>
      val syms = repr.trim.split("  ")
      assert(syms.length.toLong == nSym)
      assert(syms.mkString("") == w, s"symbols must reconstruct '$w'")
      assert(nSym >= 1 && nSym <= w.length.toLong)
      // every multi-char symbol must be a learned merge product
      syms.filter(_.length > 1).foreach { s =>
        assert(merged.contains(s), s"unexplained symbol '$s' in '$w'")
      }
    }
  }
}
