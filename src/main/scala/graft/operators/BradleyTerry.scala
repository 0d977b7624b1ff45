package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley-Terry pairwise-preference strength fitting — the model an
  * RLHF/preference-data pipeline runs over duel outcomes (annotator
  * A/B choices, model-vs-model win records) to turn win counts into
  * item strengths. Fitted with Hunter's MM iteration
  * (w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j)), which monotonically
  * increases the likelihood each round.
  *
  * Log-free and engine-portable by the repo's standard trick: a FIXED
  * iteration count with every update in exact integer arithmetic —
  * strengths live in ppm (S = 10⁶), each MM term is one BIGINT
  * floor-division `n_ij·S² div (w_i + w_j)`, and the update is
  * `W_i·S² div Σ terms` — so Spark and DuckDB derive bit-identical
  * strengths with no transcendental in sight (unlike the usual
  * logit-space fit). Magnitudes: n·S² ≤ 10⁴·10¹² = 10¹⁶, inside
  * BIGINT.
  *
  * Scale: duels reduce to one (winner, loser) count aggregate — the
  * only corpus-sized pass; everything after operates on the
  * item×item win matrix (items = a small vocabulary: models,
  * annotator cohorts, content classes), which broadcasts. Each MM
  * round is two broadcast joins + one hash aggregate over that tiny
  * matrix, NOT over the corpus — at 100 TB of duel logs the iteration
  * cost is unchanged. */
object BradleyTerry {

  val S = 1000000L

  /** Fit strengths from a win-count table `(winner, loser, n)`.
    * Returns `(item, n_wins, n_games, strength_ppm)` after `iters`
    * exact-integer MM rounds from a flat start (every strength = S).
    * Items with zero wins converge toward 0; `greatest(·, 1)` guards
    * the all-zero pair denominator. */
  def strengths(wins: DataFrame, iters: Int): DataFrame = {
    // PERSIST the duel-reduction outputs: `games` and `wTot` are tiny
    // (items²/items rows) but their LINEAGE is the corpus-sized duel
    // reduction — without caching, every MM round re-evaluates them
    // (twice per round via the a/b self-joins) plus once more for
    // nGames, turning the advertised one-corpus-pass into ~6+ full
    // window scans. With the cache, the corpus is read exactly once
    // per input DataFrame and every round iterates over the in-memory
    // matrix. (Callers composing further over the same `wins` should
    // persist it too — see qPrefCalibration.)
    val games = wins
      .select(col("winner").as("i"), col("loser").as("j"), col("n"))
      .unionAll(wins.select(col("loser").as("i"), col("winner").as("j"),
        col("n")))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wTot = wins.groupBy(col("winner").as("i")).agg(sum(col("n")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = games.select(col("i")).distinct()
      .select(col("i"), lit(S).as("s"))
    for (_ <- 0 until iters) {
      val a = cur.select(col("i"), col("s").as("si"))
      val b = cur.select(col("i").as("j"), col("s").as("sj"))
      cur = games
        .join(broadcast(a), "i").join(broadcast(b), "j")
        .withColumn("term",
          expr(s"n * ${S * S} div greatest(si + sj, 1)"))
        .groupBy(col("i")).agg(sum(col("term")).as("d"))
        .join(broadcast(wTot), Seq("i"), "left")
        .select(col("i"),
          expr(s"coalesce(w, 0) * ${S * S} div d").as("s"))
    }
    val nGames = games.groupBy(col("i")).agg(sum(col("n")).as("n_games"))
    val res = cur.join(broadcast(nGames), "i")
      .join(broadcast(wTot), Seq("i"), "left")
      .select(col("i").as("item"),
        coalesce(col("w"), lit(0L)).as("n_wins"),
        col("n_games"),
        col("s").as("strength_ppm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (items-row) fit, then drop the duel-reduction
    // caches so repeated fits in one session don't accumulate blocks
    res.count()
    games.unpersist()
    wTot.unpersist()
    res
  }

  /** Intransitivity audit over a win-count table: one row with
    * `(n_pairs, n_ties, n_cyclic_triples)` — majority-direction edges
    * per unordered pair, then directed 3-cycles (a beats b beats c
    * beats a), each counted once via its smallest-item rotation. A
    * cycle-heavy corpus cannot be represented by any single-strength
    * model, whatever the fit. The pair/edge tables are items²-sized
    * (broadcast), so the triple join never touches the duel corpus. */
  def intransitivity(wins: DataFrame): DataFrame = {
    val w1 = wins.select(col("winner").as("i"), col("loser").as("j"),
      col("n"))
    val pairs = w1
      .unionAll(w1.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("n")))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n_ij"))
      .join(
        w1.select(col("j").as("i"), col("i").as("j"), col("n").as("m"))
          .unionAll(w1.select(col("i"), col("j"), lit(0L).as("m")))
          .filter(col("i") < col("j"))
          .groupBy(col("i"), col("j")).agg(sum(col("m")).as("n_ji")),
        Seq("i", "j"), "full")
      .select(col("i"), col("j"),
        coalesce(col("n_ij"), lit(0L)).as("n_ij"),
        coalesce(col("n_ji"), lit(0L)).as("n_ji"))
    val edges = pairs
      .filter(col("n_ij") =!= col("n_ji"))
      .select(
        when(col("n_ij") > col("n_ji"), col("i")).otherwise(col("j"))
          .as("src"),
        when(col("n_ij") > col("n_ji"), col("j")).otherwise(col("i"))
          .as("dst"))
    val e1 = edges.select(col("src").as("a"), col("dst").as("b"))
    val e2 = edges.select(col("src").as("b"), col("dst").as("c"))
    val e3 = edges.select(col("src").as("c"), col("dst").as("a2"))
    val cyc = e1.join(e2, "b").join(e3, "c")
      .filter(col("a2") === col("a"))
      // each 3-cycle appears once per rotation; anchor on the
      // smallest item so it is counted exactly once
      .filter(col("a") < col("b") && col("a") < col("c"))
    pairs.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("n_ij") === col("n_ji"), 1L).otherwise(0L))
        .as("n_ties"))
      .crossJoin(broadcast(cyc.agg(count(lit(1)).as("n_cyclic_triples"))))
  }
}
