package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the sequence family on sf0.001 — oracle parity
  * re-checks full values at sf0.01; these assert the invariants a
  * hash can't name (spine density, fill carry, island arithmetic,
  * decile balance). */
class SequenceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  test("q_gap_fill: per-user spine is dense, fill only changes on observation") {
    import spark.implicits._
    val rows = q("q_gap_fill").run(spark, dir)
      .select(col("user_id"), col("day"), col("n_events"),
        col("filled_cents"), col("is_observed"))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, days) =>
      val sorted = days.sortBy(_._2)
      // dense daily spine between first and last activity day
      assert(sorted.last._2 - sorted.head._2 + 1 == sorted.length)
      // endpoints are observed; unobserved days carry value forward
      assert(sorted.head._5 && sorted.last._5)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (!b._5) assert(b._4 == a._4 && b._3 == 0L)
        case _ => ()
      }
    }
  }

  test("q_streaks: streak lengths and day accounting agree with raw data") {
    import spark.implicits._
    val res = q("q_streaks").run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val activeDays = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(res.keySet == activeDays.keySet)
    activeDays.foreach { case (u, days) =>
      // recompute best streak imperatively
      val runs = days.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
        if (acc.nonEmpty && acc.last.last == d - 1) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val best = runs.maxBy(r => (r.length, -r.head))
      val (_, bestLen, bestStart, nStreaks) = res(u)
      assert(bestLen == best.length && bestStart == best.head)
      assert(nStreaks == runs.length)
    }
  }

  test("q_ntile_features: deciles partition users, sizes balanced within 1") {
    import spark.implicits._
    val rows = q("q_ntile_features").run(spark, dir)
      .select(col("event_type"), col("decile"), col("n_users"),
        col("lo_cents"), col("hi_cents"))
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, ds) =>
      val sizes = ds.map(_._3)
      assert(sizes.max - sizes.min <= 1, "ntile buckets balanced within 1")
      // bucket bounds are non-decreasing across deciles
      val sorted = ds.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4 || a._5 <= b._5)
        case _ => ()
      }
    }
  }
}
