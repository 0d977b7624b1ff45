package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Similarity.ivfAppend]] — incremental IVF maintenance:
  *  - centroids are FROZEN on the base: per-cell `n_base` equals the
  *    occupancy of an IVF trained and assigned on the base alone
  *    (appending cannot perturb stored assignments);
  *  - occupancy conserves the corpus: Σ n_new = batch size,
  *    Σ n_total = corpus size, every centroid cell present;
  *  - the rebalance flag is exactly `n_total · C > 2 · N`;
  *  - determinism: two runs produce identical rows. */
class IvfAppendSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val (c, iters, batch) = (8, 2, 8)

  private def emb = graft.Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding"))

  private lazy val appended =
    Similarity.ivfAppend(emb, c, iters, batch).collect()

  test("frozen centroids: n_base equals the base-only IVF occupancy") {
    val m = emb.agg(max(col("vec_id"))).head().getLong(0) - (batch - 1)
    val baseOcc = Similarity
      .ivfCells(emb.filter(col("vec_id") < m), c, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    appended.foreach { r =>
      assert(r.getLong(1) == baseOcc.getOrElse(r.getLong(0), 0L),
        s"cell ${r.getLong(0)}: append n_base ${r.getLong(1)} != " +
          s"base-only ${baseOcc.getOrElse(r.getLong(0), 0L)}")
    }
  }

  test("occupancy conserves the corpus; all cells present") {
    val n = emb.count()
    assert(appended.map(_.getLong(2)).sum == batch.toLong)
    assert(appended.map(_.getLong(3)).sum == n)
    assert(appended.map(_.getLong(0)).sorted.sameElements(
      (0 until c).map(_.toLong)))
  }

  test("rebalance flag is exactly n_total*C > 2*N") {
    val n = emb.count()
    appended.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(3) * c > 2 * n))
    }
  }

  test("determinism: two runs produce identical rows") {
    val again = Similarity.ivfAppend(emb, c, iters, batch).collect()
    assert(appended.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }
}
