package graft.queries

import graft.{Q, Tables}
import graft.operators.SuffixArray
import org.apache.spark.sql.functions._

/** Suffix-array family — exact-substring duplicate discovery at
  * ARBITRARY match length, the capability the fixed-n shingle passes
  * (`q_dedup_substring*`) cannot express: a suffix array orders every
  * suffix of the corpus, so the longest repeated substrings fall out
  * of rank adjacency (the mechanism behind the public ExactSubstr
  * dedup result, Lee et al. 2022). Construction is prefix doubling —
  * the distributed-memory SA algorithm of Flick & Aluru (SC'15):
  * log2(window) rounds of join + distributed sort-and-scan re-rank,
  * no single-partition step anywhere (see [[SuffixArray]]).
  *
  * The DuckDB oracles replay the identical doubling rounds as
  * MATERIALIZED CTEs (each level feeds two downstream reads — without
  * materialization the CTE tree re-evaluates exponentially) with
  * `dense_rank() - 1` playing the distributed ordinal-scan role; the
  * two rankings agree exactly because a dense rank over distinct keys
  * IS the sorted ordinal. */
object SuffixQueries {

  /** Chars of the suffix window — 128 keeps the doubling at 7 rounds
    * and caps reported matches at 128 chars (a match that long is a
    * duplicated document prefix, which is what the trim/drop decision
    * needs; the window widens by adding rounds, one per doubling). */
  private val MaxLen = graft.operators.SuffixArtifact.MaxLen
  private val Rounds = 7 // log2(MaxLen)

  /** Doubling-round CTE chain `pos, r0 .. r{Rounds}` shared by both
    * oracles. MATERIALIZED: every level is read twice (as both join
    * sides of the next level) and the LCP walk reads all levels. */
  private def doublingCte: String = {
    val blocks = Seq(
      s"""pos AS MATERIALIZED (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |         CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS code
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1, least(length(text), $MaxLen))) AS i
         |        FROM documents))""".stripMargin,
      "r0 AS MATERIALIZED (SELECT doc_id, pos, dense_rank() OVER " +
        "(ORDER BY code) - 1 AS rank FROM pos)") ++
      (1 to Rounds).flatMap { k =>
        val off = 1 << (k - 1)
        Seq(
          s"""p$k AS (
             |  SELECT a.doc_id, a.pos, a.rank AS k1, coalesce(b.rank, -1) AS k2
             |  FROM r${k - 1} a LEFT JOIN r${k - 1} b
             |    ON b.doc_id = a.doc_id AND b.pos = a.pos + $off)""".stripMargin,
          s"r$k AS MATERIALIZED (SELECT doc_id, pos, dense_rank() OVER " +
            s"(ORDER BY k1, k2) - 1 AS rank FROM p$k)")
      }
    "WITH " + blocks.mkString(",\n")
  }

  /** The suffix array itself, smoke-sized: the 100 lexicographically
    * smallest suffixes (rank, position, 16-char prefix). Rank ties =
    * identical truncated suffixes; order is fully deterministic via
    * (rank, doc_id, pos). This is the REGISTERED BUILD STEP of the
    * rank-table artifact ([[graft.operators.SuffixArtifact]]): it
    * pays the full doubling construction once; `q_dedup_lrs` consumes
    * the stored levels. */
  val qSuffixArray: Q = Q(
    "q_suffix_array",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      graft.operators.SuffixArtifact.materialize(spark, dir)
      graft.operators.SuffixArtifact.last(spark, dir)
        .orderBy(col("rank"), col("doc_id"), col("pos"))
        .limit(100)
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("rank").as("sa_rank"), col("doc_id"), col("pos"),
          col("text").substr(col("pos").cast("int") + 1, lit(16)).as("prefix"))
        .orderBy(col("sa_rank"), col("doc_id"), col("pos"))
    },
    Some(doublingCte + s""",
      top AS (
        SELECT CAST(rank AS BIGINT) AS sa_rank, doc_id, pos
        FROM r$Rounds ORDER BY rank, doc_id, pos LIMIT 100)
      SELECT t.sa_rank, t.doc_id, t.pos,
             substr(d.text, CAST(t.pos AS INT) + 1, 16) AS prefix
      FROM top t JOIN documents d USING (doc_id)
      ORDER BY sa_rank, doc_id, pos
    """))

  /** Longest repeated substrings (exact, arbitrary length, capped at
    * $MaxLen): top-20 left-maximal rank-adjacent suffix pairs by LCP.
    * Equal final ranks contribute their shared truncated-suffix
    * length; consecutive ranks get the classic greedy rank-table LCP
    * walk (one lookup per level). The left-maximality filter (prior
    * characters differ, or a suffix starts at 0) collapses the shadow
    * family a length-L match drags behind it (its L-1 suffixes) to
    * the single maximal row — without it the output is the same match
    * reported L times. lcp = $MaxLen means "the entire window" — an
    * exact duplicated document prefix. */
  val qDedupLrs: Q = Q(
    "q_dedup_lrs",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pos = SuffixArray.positions(docs, MaxLen)
      val prevA = pos.select(col("doc_id").as("doc_a"),
        (col("pos") + 1).as("pos_a"), col("code").as("code_a"))
      val prevB = pos.select(col("doc_id").as("doc_b"),
        (col("pos") + 1).as("pos_b"), col("code").as("code_b"))
      // consume the stored rank table (lazy build if absent) — the
      // LCP walk reads every level, never re-running the doubling
      val levels = graft.operators.SuffixArtifact.levels(spark, dir)
      SuffixArray.longestRepeated(docs, levels, MaxLen)
        .join(prevA, Seq("doc_a", "pos_a"), "left")
        .join(prevB, Seq("doc_b", "pos_b"), "left")
        .filter(col("code_a").isNull || col("code_b").isNull ||
          col("code_a") =!= col("code_b"))
        .filter(col("lcp") >= 10)
        .orderBy(col("lcp").desc, col("doc_a"), col("pos_a"),
          col("doc_b"), col("pos_b"))
        .limit(20)
        .join(docs.select(col("doc_id").as("doc_a"), col("text")),
          Seq("doc_a"))
        .select(col("lcp"), col("doc_a"), col("pos_a"),
          col("doc_b"), col("pos_b"),
          col("text").substr(col("pos_a").cast("int") + 1,
            col("lcp").cast("int")).as("snippet"),
          (col("doc_a") === col("doc_b")).as("same_doc"))
        .orderBy(col("lcp").desc, col("doc_a"), col("pos_a"),
          col("doc_b"), col("pos_b"))
    },
    Some(doublingCte + s""",
      sa AS MATERIALIZED (
        SELECT r.doc_id, r.pos, r.rank,
               least(length(d.text), $MaxLen) - r.pos AS suffix_len
        FROM r$Rounds r JOIN documents d USING (doc_id)),
      mem AS MATERIALIZED (
        SELECT rank, doc_id, pos, suffix_len,
               row_number() OVER (PARTITION BY rank
                 ORDER BY doc_id, pos) AS rn,
               min(suffix_len) OVER (PARTITION BY rank) AS min_len
        FROM sa),
      eqp AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b,
               b.pos AS pos_b, CAST(a.min_len AS BIGINT) AS lcp
        FROM mem a JOIN mem b ON a.rank = b.rank AND a.rn = 1 AND b.rn = 2),
      reps AS MATERIALIZED (
        SELECT rank, doc_id, pos, min_len FROM mem WHERE rn = 1),
      w${Rounds + 1} AS (
        SELECT x.doc_id AS doc_a, x.pos AS pos_a, y.doc_id AS doc_b,
               y.pos AS pos_b, least(x.min_len, y.min_len) AS cap,
               CAST(0 AS BIGINT) AS lcp
        FROM reps x JOIN reps y ON y.rank = x.rank + 1)""" +
      (Rounds to 0 by -1).map { k =>
        s""",
      w$k AS (
        SELECT f.doc_a, f.pos_a, f.doc_b, f.pos_b, f.cap,
               CASE WHEN ra.rank IS NOT NULL AND ra.rank = rb.rank
                    THEN f.lcp + ${1 << k} ELSE f.lcp END AS lcp
        FROM w${k + 1} f
        LEFT JOIN r$k ra ON ra.doc_id = f.doc_a AND ra.pos = f.pos_a + f.lcp
        LEFT JOIN r$k rb ON rb.doc_id = f.doc_b AND rb.pos = f.pos_b + f.lcp)"""
      }.mkString + s""",
      allp AS (
        SELECT * FROM eqp UNION ALL
        SELECT doc_a, pos_a, doc_b, pos_b, least(lcp, cap) AS lcp FROM w0),
      lm AS (
        SELECT p.* FROM allp p
        LEFT JOIN pos ca ON ca.doc_id = p.doc_a AND ca.pos = p.pos_a - 1
        LEFT JOIN pos cb ON cb.doc_id = p.doc_b AND cb.pos = p.pos_b - 1
        WHERE ca.code IS NULL OR cb.code IS NULL OR ca.code <> cb.code),
      top AS (
        SELECT * FROM lm WHERE lcp >= 10
        ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b LIMIT 20)
      SELECT t.lcp, t.doc_a, t.pos_a, t.doc_b, t.pos_b,
             substr(d.text, CAST(t.pos_a AS INT) + 1, CAST(t.lcp AS INT))
               AS snippet,
             t.doc_a = t.doc_b AS same_doc
      FROM top t JOIN documents d ON d.doc_id = t.doc_a
      ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b
    """))

  val all: Seq[Q] = Seq(qSuffixArray, qDedupLrs)
}
