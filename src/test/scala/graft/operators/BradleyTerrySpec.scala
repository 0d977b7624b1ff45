package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Bradley-Terry MM fit must respond to the win structure, not
  * just the win counts — these fixtures pin ordering, symmetry,
  * zero-win collapse, and the strength-of-schedule property that
  * distinguishes BT from a naive win-rate ranking. */
class BradleyTerrySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def fit(wins: Seq[(String, String, Long)]): Map[String, Long] =
    BradleyTerry.strengths(wins.toDF("winner", "loser", "n"), iters = 2)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap

  test("a dominant item ranks above a dominated one") {
    val s = fit(Seq(("a", "b", 9L), ("b", "a", 1L)))
    assert(s("a") > s("b"))
    assert(s("a") > BradleyTerry.S && s("b") < BradleyTerry.S,
      "strengths move off the flat start in opposite directions")
  }

  test("a perfectly symmetric record fits equal strengths") {
    val s = fit(Seq(("a", "b", 5L), ("b", "a", 5L),
      ("b", "c", 3L), ("c", "b", 3L), ("a", "c", 2L), ("c", "a", 2L)))
    assert(s("a") == s("b") && s("b") == s("c"))
  }

  test("an item with zero wins collapses toward zero strength") {
    val s = fit(Seq(("a", "b", 4L), ("c", "b", 4L), ("a", "c", 2L),
      ("c", "a", 2L)))
    assert(s("b") == 0L, "W_b = 0 forces the MM numerator to 0")
    assert(s("a") > 0L && s("c") > 0L)
  }

  test("strength of schedule: beating a strong opponent outranks the same " +
    "record against a weak one") {
    // d goes 1-1 entirely against the strong item a; e goes 1-1
    // entirely against the weak item b. A win-RATE ranking ties them;
    // Bradley-Terry must rank d's schedule higher. (Note: BT's
    // sufficient statistics are per-item wins + per-pair game counts,
    // so the schedules must actually DIFFER in n_ij — two 1-1 records
    // against the same opponents tie exactly, whoever won which game.)
    val duels = Seq(
      ("a", "b", 8L), ("b", "a", 1L), // a strong, b weak
      ("d", "a", 1L), ("a", "d", 1L), // d splits with the strong item
      ("e", "b", 1L), ("b", "e", 1L)) // e splits with the weak item
    val s = fit(duels)
    assert(s("d") > s("e"),
      s"equal 1-1 records, but d played the stronger schedule: $s")
  }

  test("intransitivity: rock-paper-scissors counts exactly one cyclic triple") {
    def audit(wins: Seq[(String, String, Long)]): (Long, Long, Long) = {
      val r = BradleyTerry
        .intransitivity(wins.toDF("winner", "loser", "n"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // r beats s, s beats p, p beats r: one majority cycle
    assert(audit(Seq(("r", "s", 3L), ("s", "p", 3L), ("p", "r", 3L))) ==
      ((3L, 0L, 1L)))
    // reverse one majority edge: transitive, zero cycles
    assert(audit(Seq(("r", "s", 3L), ("s", "p", 3L), ("r", "p", 3L))) ==
      ((3L, 0L, 0L)))
    // a tied pair drops out of cycle counting and is reported
    assert(audit(Seq(("r", "s", 2L), ("s", "r", 2L), ("s", "p", 3L),
      ("p", "r", 3L))) == ((3L, 1L, 0L)))
    // two overlapping cycles among 4 items count separately:
    // a>b>c>a and a>b>d>a share the edge a>b
    assert(audit(Seq(("a", "b", 2L), ("b", "c", 2L), ("c", "a", 2L),
      ("b", "d", 2L), ("d", "a", 2L))) == ((5L, 0L, 2L)))
  }

  test("wins/games accounting matches the duel table") {
    val out = BradleyTerry
      .strengths(Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L))
        .toDF("winner", "loser", "n"), iters = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((3L, 4L)))
    assert(out("b") == ((2L, 5L)))
    assert(out("c") == ((1L, 3L)))
  }
}
