package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pin for the context-window packing audit: the shard
  * assignment, cumulative concat order, window count and straddle
  * arithmetic are all recomputed independently in plain Scala and
  * compared field-for-field, so neither engine's window/aggregate
  * plumbing can drift from the concat-and-chunk math. */
class SeqPackSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Cap = 2048L

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_seq_pack matches a plain-Scala concat-and-chunk replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, text) =>
        val shard = Integer.parseInt(md5hex(id.toString).substring(0, 1), 16) % 8
        // Spark's split(text, "\s+") keeps trailing empty strings
        // (limit -1), unlike bare Java String.split
        (shard.toLong, id, text.split("\\s+", -1).length.toLong)
      }
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (shard, rows) =>
        val ordered = rows.sortBy(_._2)
        val cums = ordered.scanLeft(0L)(_ + _._3).drop(1)
        val total = cums.last
        val nWindows = (total + Cap - 1) / Cap
        val straddling = ordered.zip(cums).count { case ((_, _, n), cum) =>
          (cum - 1) / Cap > (cum - n) / Cap
        }
        (shard, ordered.length.toLong, total, nWindows, straddling.toLong,
          total * 1000 / (nWindows * Cap))
    }
    val rows = Registry.all.find(_.name == "q_seq_pack").get
      .run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == expected)
    // every shard's fill ratio is positive and at most 1000 (only the
    // final partial window can waste tokens under concat-and-chunk)
    assert(rows.forall(r => r._6 > 0 && r._6 <= 1000))
  }
}
