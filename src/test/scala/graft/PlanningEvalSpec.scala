package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the planning/eval gauges added in round 5:
  * `q_eval_auc` (rank-sum AUC must equal the brute-force pairwise
  * definition) and `q_shard_mix_audit` (window formulation must equal
  * an independent in-memory replication of serpentine striping +
  * hash-order adjacency). The oracle parity harness re-checks the
  * cross-engine values at sf0.01; these prove the MATH, not just
  * engine agreement. */
class PlanningEvalSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_eval_auc equals the brute-force pairwise AUC definition") {
    import spark.implicits._
    val labels = graft.operators.ClusterArtifact
      .labels(spark, dir, 0.5, graft.queries.DedupQueries.JaccardCap)
      .select(col("doc_id")).as[Long].collect().toSet
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, String, Double)].collect()
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val (dup, uniq) = rows.partition(r => labels.contains(r._1))
      if (dup.isEmpty || uniq.isEmpty) None
      else {
        // wins = dup scored ABOVE a unique doc (AUC of q predicting dup)
        val wins = (for (d <- dup; u <- uniq) yield
          if (d._3 > u._3) 2L else if (d._3 == u._3) 1L else 0L).sum
        val micros = wins * 1000000L / (2L * dup.length * uniq.length)
        Some((src, dup.length.toLong, uniq.length.toLong, micros))
      }
    }.sortBy(_._1)
    val got = q("q_eval_auc").run(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.forall(r => r._4 >= 0L && r._4 <= 1000000L))
  }

  test("q_shard_mix_audit equals an independent striping + adjacency replay") {
    import spark.implicits._
    val sized = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      .as[(Long, String, Long)].collect()
    val numShards = 8
    // serpentine striping: per-source (tokens desc, doc_id) ranking
    val assigned = sized.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).zipWithIndex.map { case (r, rk) =>
        val pos = rk % numShards
        val shard = if ((rk / numShards) % 2 == 0) pos
                    else numShards - 1 - pos
        (shard.toLong, r._1, r._2)
      }
    }
    val expected = assigned.groupBy(_._1).toSeq.map { case (shard, rows) =>
      val emit = rows.sortBy(r => (md5hex(r._2.toString), r._2))
      val n = emit.length.toLong
      val adjSame = emit.sliding(2).count {
        case Seq(a, b) => a._3 == b._3
        case _ => false
      }.toLong
      val samePairs = emit.groupBy(_._3).values
        .map(g => g.length.toLong * (g.length - 1)).sum
      val adjMicros = adjSame * 1000000L / (n - 1)
      val randMicros = samePairs * 1000000L / (n * (n - 1))
      (shard, n, emit.map(_._3).distinct.length.toLong,
        adjMicros, randMicros, adjMicros - randMicros)
    }.sortBy(_._1)
    val got = q("q_shard_mix_audit").run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == sized.length.toLong)
  }
}
