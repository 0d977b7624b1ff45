package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the isotropy gauge and the farthest-point
  * coreset sampler: both are recomputed independently in plain Scala
  * from the raw embeddings and compared field-for-field, so the
  * fused-aggregate plumbing and the greedy loop cannot drift from the
  * published math. */
class CoresetIsotropySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  /** (vec_id, quantized vector) for the whole sf0.001 corpus — the
    * same 1e6 micro-quantization both engines apply. */
  private lazy val quantized: Array[(Long, Array[Long])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        (id, v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong))
      }
      .sortBy(_._1)
  }

  test("q_embed_isotropy replays from a plain-Scala diagonal recompute") {
    import spark.implicits._
    val d = 64
    val n = quantized.length.toLong
    val sI = Array.tabulate(d)(i => quantized.map(_._2(i)).sum)
    val sII = Array.tabulate(d)(i =>
      quantized.map(r => r._2(i) * r._2(i)).sum)
    val m = Array.tabulate(d)(i =>
      ((BigInt(n) * sII(i) - BigInt(sI(i)) * sI(i)) / n).toLong)
    val tr = m.map(BigInt(_)).sum
    val mu2 = sI.map(s => BigInt(s) * s).sum
    val expected = (n, d.toLong, m.min, m.max,
      ((BigInt(m.max) * 1000) / BigInt(m.min).max(1)).toLong,
      ((mu2 * 1000) / (mu2 + n * tr)).toLong)
    val row = q("q_embed_isotropy").run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(row.length == 1)
    assert(row.head == expected)
  }

  test("q_embed_coreset matches a plain-Scala greedy farthest-point replay") {
    import spark.implicits._
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    // seed = max squared norm, ties to the smallest vec_id
    val seed = quantized.maxBy { case (id, v) =>
      (v.map(x => x * x).sum, -id)
    }
    var selected = Vector(seed)
    var expected = Vector((0, seed._1, 0L))
    for (r <- 1 to 7) {
      val (winner, mind) = quantized
        .map(c => (c, selected.map(s => d2(c._2, s._2)).min))
        .maxBy { case ((id, _), mind) => (mind, -id) }
      selected :+= winner
      expected :+= ((r, winner._1, mind))
    }
    val rows = q("q_embed_coreset").run(spark, dir)
      .as[(Int, Long, Long)].collect().toVector
    assert(rows == expected)
    // coverage radius weakly decreasing after the seed
    val radii = rows.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a },
      s"radius curve must be weakly decreasing: $radii")
    assert(rows.map(_._2).distinct.length == rows.length,
      "selected centers must be distinct")
  }
}
