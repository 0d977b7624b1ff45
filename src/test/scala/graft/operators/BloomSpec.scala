package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Bloom sketch invariants: a member probe can NEVER come back
  * negative (the screening guarantee the ingest pipeline relies on),
  * and the sketch never exceeds its declared word budget. */
object BloomSpec extends Properties("Bloom") {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private val key: Gen[String] = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  property("no false negatives: every inserted key probes maybe=true") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val df = keys.distinct.toDF("k")
      val sketch = Bloom.build(df, col("k"))
      val probed = Bloom.probe(df, "k", col("k"), sketch)
      probed.filter(!col("maybe")).count() == 0
    }

  property("sketch stays within the word budget") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val sketch = Bloom.build(keys.distinct.toDF("k"), col("k"))
      val words = sketch.agg(count(lit(1)), max(col("word")), min(col("word")))
        .as[(Long, Long, Long)].head()
      words._1 <= Bloom.NumWords && words._2 < Bloom.NumWords && words._3 >= 0
    }
}
