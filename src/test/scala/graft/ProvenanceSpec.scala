package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-document provenance manifest, pinned for INTERNAL
  * consistency and CROSS-QUERY consistency: the row-level ledger must
  * partition the corpus, respect the pipeline's precedence order, and
  * roll up to exactly the per-source manifest `q_corpus_prep`
  * publishes — two independently-written compositions of the same
  * pipeline must tell one story. */
class ProvenanceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def runQ(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  test("statuses partition the corpus and respect precedence") {
    import org.apache.spark.sql.functions._
    val m = runQ("q_provenance_manifest").collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(m.length.toLong == nDocs, "one ledger row per document")
    val statuses = m.map(_.getString(7)).toSet
    assert(statuses.subsetOf(Set("eval_source", "low_quality",
      "duplicate", "contaminated", "kept")))
    m.foreach { r =>
      val (src, q, csize, contam, status) = (r.getString(1), r.getDouble(4),
        r.getLong(5), r.getLong(6), r.getString(7))
      if (src == "src0") assert(status == "eval_source")
      else if (q < 0.64) assert(status == "low_quality")
      // stages after a drop are never evaluated
      if (status == "eval_source" || status == "low_quality") {
        assert(csize == 0L, s"cluster size leaked into dropped row $r")
        assert(contam == 0L, s"contamination leaked into dropped row $r")
      }
      if (status == "duplicate")
        assert(contam == 0L, "contamination never evaluated for duplicates")
      if (status == "kept" || status == "contaminated")
        assert(csize >= 1L, "survivors sit in a cluster of at least themselves")
    }
  }

  test("kept rows roll up to exactly q_corpus_prep's per-source manifest") {
    val kept = runQ("q_provenance_manifest").collect()
      .filter(_.getString(7) == "kept")
      .groupBy(_.getString(1))
      .map { case (src, rows) =>
        src -> (rows.length.toLong, rows.map(_.getLong(3)).sum)
      }
    val prep = runQ("q_corpus_prep").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept.keySet == prep.keySet,
      "both compositions keep documents from the same sources")
    kept.foreach { case (src, (n, toks)) =>
      assert(prep(src) == (n, toks),
        s"source $src: ledger keeps $n docs/$toks tokens, " +
          s"corpus_prep reports ${prep(src)}")
    }
  }
}
