package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded top-k aggregate must agree with the ranking-
  * window formulation row for row — including under repartitioning
  * (which exercises partial aggregation + buffer serialization, the
  * paths a single-partition run never touches). */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def windowTop3(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("item"))
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("key"), col("rnk"), col("score"), col("item"))
      .orderBy(col("key"), col("rnk"))
  }

  private def aggTop3(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("key"))
      .agg(TopKLongAgg(col("score"), col("item"), 3).as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.score").as("score"), col("col.item").as("item"))
      .orderBy(col("key"), col("rnk"))

  test("agg == window on deterministic data, across partitionings") {
    import spark.implicits._
    // ties everywhere: few distinct scores, duplicated items per key
    val rows = for {
      key <- 0 until 17
      i <- 0 until 23
    } yield (key.toLong, ((key * 31 + i * 7) % 5).toLong, f"it${(i * 13) % 19}%03d")
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("key", "score", "item").repartition(parts)
      val want = windowTop3(df).collect().toSeq
      val got = aggTop3(df).collect().toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("buffer serialization round-trips and merge keeps the best k") {
    val buf = new TopKLongAgg.Buffer(3)
    Seq((5L, "e"), (1L, "a"), (9L, "x"), (9L, "b"), (2L, "c")).foreach {
      case (s, i) => buf.offer(s, UTF8String.fromString(i))
    }
    val back = TopKLongAgg.Buffer.fromBytes(3, buf.toBytes)
    var got = List.empty[(Long, String)]
    back.foreach((s, i) => got ::= (s, i.toString))
    // best 3 of the stream: (9,b), (9,x), (5,e) — tie prefers smaller item
    assert(got.sortBy(e => (-e._1, e._2)) == List((9L, "b"), (9L, "x"), (5L, "e")))
  }

  test("fewer rows than k yields all rows, best-first") {
    import spark.implicits._
    val df = Seq((1L, 4L, "b"), (1L, 4L, "a")).toDF("key", "score", "item")
    val got = aggTop3(df).as[(Long, Int, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1, 4L, "a"), (1L, 2, 4L, "b")))
  }
}
