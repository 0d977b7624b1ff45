package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pin for the boundary-respecting packing audit: the shard
  * assignment, the folded (serpentine) stripe deal and the
  * padding/makespan arithmetic are all recomputed independently in
  * plain Scala and compared field-for-field, so neither engine's
  * rank/window plumbing can drift from the published zigzag-LPT
  * scheme. */
class SeqPackSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Cap = 2048L

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_seq_pack matches a plain-Scala folded-striping replay") {
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
        val total = rows.map(_._3).sum
        val k = (total + Cap - 1) / Cap
        val loads = new Array[Long](k.toInt)
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex.foreach {
          case ((_, _, n), r) =>
            val pos = r % k
            val win = if ((r / k) % 2 == 0) pos else k - 1 - pos
            loads(win.toInt) += n
        }
        val occupied = loads.filter(_ > 0)
        (shard, rows.length.toLong, total, occupied.length.toLong,
          occupied.min, occupied.max,
          occupied.map(l => math.max(Cap - l, 0L)).sum,
          occupied.max * 1000 / Cap)
    }
    val rows = Registry.all.find(_.name == "q_seq_pack").get
      .run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows == expected)
    // folded striping must land within 2x of the capacity lower bound
    // on this corpus (LPT-style spreads cannot stack all big docs in
    // one window), and padding is bounded by n_windows * capacity -
    // total tokens when nothing overflows
    rows.foreach { r =>
      assert(r._8 < 2000, s"makespan blew past 2x capacity: $r")
      assert(r._7 <= r._4 * Cap, s"padding exceeds total capacity: $r")
    }
  }
}
