package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 query additions, pinned DIFFERENTIALLY against plain
  * in-memory reimplementations (the UnigramVocabSpec pattern): the
  * binary-segmentation changepoint fitter and the bounded-hop Brandes
  * betweenness estimator must reproduce exactly what a from-scratch
  * sequential replay of the same exact-integer arithmetic produces. */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def runQ(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  // ---- changepoint ----

  /** (gain_milli, k) of the best split of series[a-1 .. b-1]
    * (1-based bounds), replaying the query's exact formula. */
  private def bestSplit(s: Array[Long], a: Int, b: Int): (Long, Int) = {
    val n = b - a + 1
    var best = (Long.MinValue, 0)
    val t = (a to b).map(i => s(i - 1)).sum
    var l = 0L
    for (k <- a until b) {
      l += s(k - 1)
      val r = t - l
      val nl = k - a + 1; val nr = b - k
      val gain = (1000L * (l * l * nr * n + r * r * nl * n - t * t * nl * nr)) /
        (nl.toLong * nr * n)
      if (gain > best._1) best = (gain, k)
    }
    best
  }

  test("q_changepoint_binseg matches a sequential replay; gains nonnegative") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect()
    val xs = daily.map(_.getLong(1))
    val days = daily.map(_.getDate(0))
    val n = xs.length
    val (g1, k1) = bestSplit(xs, 1, n)

    val got = runQ("q_changepoint_binseg").collect()
    assert(got.nonEmpty && got.forall(_.getLong(6) >= 0L),
      "split gains must be nonnegative")
    val lvl1 = got.filter(_.getInt(0) == 1)
    assert(lvl1.length == 1)
    assert(lvl1.head.getDate(3) == days(k1 - 1), "level-1 split day")
    assert(lvl1.head.getLong(6) == g1, "level-1 gain")
    // level-2 rows replay the same argmax inside each half
    got.filter(_.getInt(0) == 2).foreach { r =>
      val a = days.indexOf(r.getDate(1)) + 1
      val b = days.indexOf(r.getDate(2)) + 1
      val (g, k) = bestSplit(xs, a, b)
      assert(r.getDate(3) == days(k - 1), s"level-2 split day of [$a,$b]")
      assert(r.getLong(6) == g, s"level-2 gain of [$a,$b]")
      // means are the exact integer milli-units of each side
      val lMean = 1000L * (a to k).map(i => xs(i - 1)).sum / (k - a + 1)
      val rMean = 1000L * ((k + 1) to b).map(i => xs(i - 1)).sum / (b - k)
      assert((r.getLong(7), r.getLong(8)) == (lMean, rMean))
    }
  }

  // ---- betweenness ----

  /** Sequential bounded-hop Brandes with the query's ppm flooring. */
  private def brandes(sym: Map[Long, Seq[Long]], seeds: Seq[Long], h: Int)
      : Map[Long, Long] = {
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    seeds.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      for (d <- 1 to h) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        frontier.foreach { u =>
          sym.getOrElse(u, Nil).foreach { v =>
            if (!dist.contains(v)) next(v) = next.getOrElse(v, 0L) + sigma(u)
          }
        }
        // anti-join semantics: a node entered THIS round keeps summing
        val fresh = next.keys.filterNot(dist.contains).toSeq
        fresh.foreach { v => dist(v) = d; sigma(v) = next(v) }
        frontier = fresh
      }
      val delta = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for (d <- (h - 1) to 1 by -1) {
        dist.filter(_._2 == d).keys.foreach { v =>
          var acc2 = 0L
          sym.getOrElse(v, Nil).foreach { w =>
            if (dist.get(w).contains(d + 1))
              acc2 += sigma(v) * (1000000L + delta(w)) / sigma(w)
          }
          delta(v) = acc2
          acc(v) += acc2
        }
      }
    }
    acc.toMap
  }

  test("q_graph_betweenness matches a sequential Brandes replay") {
    import org.apache.spark.sql.functions._
    val e = graft.operators.EdgeArtifact.edges(spark, dir)
      .select("pa", "pb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (e.map(p => (p._1, p._2)) ++ e.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val seeds = sym.toSeq.map { case (n, nb) => (n, nb.size) }
      .sortBy { case (n, d) => (-d, n) }.take(8).map(_._1)
    val exp = brandes(sym, seeds, 4).toSeq
      .sortBy { case (n, b) => (-b, n) }.take(20)

    val got = runQ("q_graph_betweenness").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == exp.length)
    assert(got.toSeq == exp, "top-20 brokers with exact ppm dependencies")
    assert(got.forall(_._2 >= 0L))
  }
}
