package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the layout/CDC operators' invariants:
  * the Morton interleave is an exact bijection (deinterleaving the
  * cell recovers both inputs), and the aggregate latest-wins snapshot
  * is indistinguishable from the window formulation on arbitrary
  * changelogs — including ts ties. */
object LayoutPropSpec extends Properties("LayoutOps") {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // every case runs Spark jobs; keep the case count moderate
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private val byte255: Gen[Long] = Gen.choose(0L, 255L)

  property("zorderCell deinterleaves back to its inputs") =
    forAll(Gen.listOfN(20, Gen.zip(byte255, byte255))) { pts =>
      val rows = pts.toDF("a", "b")
        .select(col("a"), col("b"),
          Layout.zorderCell(col("a"), col("b"), 8).as("z"))
        .as[(Long, Long, Long)].collect()
      rows.forall { case (a, b, z) =>
        val da = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
        val db = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
        da == a && db == b
      }
    }

  private val changelog: Gen[List[(Long, Long, Long, String)]] =
    Gen.choose(5, 60).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.choose(0L, 6L)
        t <- Gen.choose(0L, 9L) // small ts domain -> frequent ties
        v <- Gen.alphaStr.map(_.take(4))
      } yield (k, t, v))
        .map(_.zipWithIndex.map { case ((k, t, v), id) => (id.toLong, k, t, v) })
    }

  property("latestSnapshot == row_number-window formulation, ties included") =
    forAll(changelog) { rows =>
      val df = rows.toDF("id", "k", "t", "v")
      val viaAgg = Layout.latestSnapshot(df, col("k"), col("t"),
          col("id"), Seq(col("v")))
        .select(col("key"), col("ts"), col("__p0"))
        .as[(Long, Long, String)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("t").desc, col("id").desc)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("k"), col("t"), col("v"))
        .as[(Long, Long, String)].collect().toSet
      viaAgg == viaWindow
    }
}
