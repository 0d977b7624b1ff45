package graft.queries

import graft.{Q, Tables}
import graft.operators.Dedup

/** Deduplication verify queries over the `documents` table. The DuckDB
  * oracles use *different algorithms* where possible (e.g.
  * list_intersect vs shingle-join for Jaccard) so the comparison is an
  * independent check of the math, not a translation of the plan. */
object DedupQueries {

  val qDedupExact: Q = Q(
    "q_dedup_exact",
    (spark, dir) => Dedup.exactStats(Tables.documents(spark, dir)),
    Some("""
      SELECT count(*) AS n_docs,
             count(DISTINCT md5(text)) AS n_unique_exact,
             count(DISTINCT md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               '\s+', ' ', 'g')))) AS n_unique_canonical
      FROM documents
    """.trim))

  /** 5-gram Jaccard near-dup pairs at >= 0.8 — Spark joins on shared
    * shingles (pair cost ∝ actual overlap); the oracle brute-forces
    * list_intersect over all pairs. Same math, different plan. */
  val qDedupNgramJaccard: Q = Q(
    "q_dedup_ngram_jaccard",
    (spark, dir) => Dedup.jaccardPairs(Tables.documents(spark, dir), 0.8),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(tl[i:i+4], ' ')
                              FOR i IN generate_series(1, len(tl) - 4)]) AS sl
        FROM toks WHERE len(tl) >= 5)
      SELECT a.doc_id AS da, b.doc_id AS db,
             round(CAST(len(list_intersect(a.sl, b.sl)) AS DOUBLE) /
                   (len(a.sl) + len(b.sl) - len(list_intersect(a.sl, b.sl))), 6) AS jaccard
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sl, b.sl)) AS DOUBLE) /
            (len(a.sl) + len(b.sl) - len(list_intersect(a.sl, b.sl))) >= 0.8
      ORDER BY da, db
    """.trim))

  /** MinHash (16 portable md5-based slots) + LSH (4 bands of 4):
    * candidates share >= 1 band; estimated similarity = agreeing
    * slots / 16, kept at >= 0.5. */
  val qDedupMinhash: Q = Q(
    "q_dedup_minhash",
    (spark, dir) => Dedup.minhashLshPairs(Tables.documents(spark, dir), 0.5),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS tl FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(tl[i:i+4], ' ')
                  FOR i IN generate_series(1, len(tl) - 4)])) AS shingle
        FROM toks WHERE len(tl) >= 5),
      sigs AS (
        SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
        FROM sh, unnest(generate_series(0, 15)) s(seed)
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(minhash, '|' ORDER BY seed)) AS bandhash
        FROM sigs GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bandhash = b.bandhash AND a.doc_id < b.doc_id),
      agree AS (
        SELECT da, db,
               sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 16.0 AS est
        FROM cand
        JOIN sigs sa ON sa.doc_id = da
        JOIN sigs sb ON sb.doc_id = db AND sb.seed = sa.seed
        GROUP BY da, db)
      SELECT da, db, round(est, 6) AS est_sim FROM agree
      WHERE est >= 0.5 ORDER BY da, db
    """.trim))

  /** 32-bit portable SimHash pairs within hamming distance 3. Spark
    * uses pigeonhole block joins; the oracle brute-forces all pairs.
    * The oracle SQL is generated so the per-bit sums stay in sync
    * with [[Dedup.SimhashBits]]. */
  val qDedupSimhash: Q = {
    val bitSums = (0 until Dedup.SimhashBits).map { i =>
      s"sum(CASE WHEN substring(hx, ${i + 1}, 1) IN " +
        s"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$i"
    }.mkString(",\n               ")
    val valExpr = (0 until Dedup.SimhashBits).map { i =>
      s"CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    Q(
      "q_dedup_simhash",
      (spark, dir) => Dedup.simhashPairs(Tables.documents(spark, dir), 3),
      Some(s"""
      WITH t AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
      h AS (SELECT doc_id, md5(tok) AS hx FROM t),
      s AS (
        SELECT doc_id,
               $bitSums
        FROM h GROUP BY doc_id),
      v AS (SELECT doc_id, $valExpr AS sh FROM s)
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
      FROM v a JOIN v b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 3
      ORDER BY da, db
      """.trim))
  }

  def all: Seq[Q] = Seq(qDedupExact, qDedupNgramJaccard, qDedupMinhash, qDedupSimhash)
}
