package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting must be result-invisible: on a heavily skewed key
  * distribution (90% of left rows share one key) the salted join
  * returns exactly the plain join's multiset of rows. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("salted equi-join equals the plain join on a skewed key") {
    import spark.implicits._
    val left = (1 to 1000).map { i =>
      val key = if (i <= 900) 7L else (i % 50).toLong
      (i.toLong, key)
    }.toDF("row_id", "k")
    val right = (0 to 60).map(k => (k.toLong, s"dim_$k")).toDF("rk", "name")

    val plain = left.join(right, col("k") === col("rk"))
      .select(col("row_id"), col("k"), col("name"))
    val salted = SaltedJoin.saltedEquiJoin(
      left, col("k"), col("row_id"), right, col("rk"), nSalts = 8)
      .select(col("row_id"), col("k"), col("name"))

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's rows really did spread across salts
    val hotSalts = left.filter(col("k") === 7L)
      .withColumn("s", pmod(xxhash64(col("row_id")), lit(8L)))
      .select(countDistinct(col("s"))).head().getLong(0)
    assert(hotSalts == 8L, s"hot key only used $hotSalts of 8 salts")
  }
}
