package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.Unify

/** Verify queries for the reference's core pipeline operators
  * (SURVEY.md §2). Each Spark implementation has a DuckDB oracle in the
  * same semantics; column names and row order match exactly (the driver
  * sorts columns by name and hash-compares values). */
object CoreQueries {

  /** Flagship — the whole unify pipeline as one batch query
    * (SURVEY.md §7 phase 1): filter → canonicalize → bucket →
    * first-wins dedup → complete-groups-only → priority-ordered
    * payload. Exercises P1, P2, U1, G2-G5, G8. */
  val qUnifyProjection: Q = Q(
    "q_unify_projection",
    (spark, dir) => Unify.projection(Tables.events(spark, dir)),
    Some("""
      WITH canon AS (
        SELECT event_id, user_id, event_type, ts,
               CASE event_type WHEN 'signup' THEN 10 WHEN 'purchase' THEN 20
                    WHEN 'click' THEN 30 ELSE 1000 END AS priority,
               CAST(floor(date_part('epoch', ts) / 86400) AS BIGINT) AS bucket
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          AND lower(event_type) IN ('signup', 'purchase', 'click')
      ), firsts AS (
        SELECT *, row_number() OVER (
                 PARTITION BY user_id, bucket, event_type
                 ORDER BY ts, event_id) AS rn
        FROM canon
      )
      SELECT user_id, bucket,
             string_agg(event_type || ':' || event_id, ','
                        ORDER BY priority, event_id) AS payload
      FROM firsts WHERE rn = 1
      GROUP BY user_id, bucket
      HAVING count(DISTINCT event_type) = 3
      ORDER BY user_id, bucket
    """.stripMargin.trim))

  def all: Seq[Q] = Seq(qUnifyProjection)
}
