package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Count-min sketch, fixed-k sampling, and substring-dup invariants:
  * CMS never underestimates (the one-sided-error theorem the screening
  * use depends on) and is exact when keys don't collide; fixedKPerGroup
  * returns exactly min(k, |group|) rows per group and the same rows on
  * every evaluation; duplicatedNgramStats scores a verbatim duplicate
  * pair at fraction 1 and a unique doc at 0. */
object SketchesSpec extends Properties("Sketches") {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private val key: Gen[String] = Gen.choose(1, 10)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  property("cms estimate >= exact count for every inserted key") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val df = keys.toDF("k")
      val sketch = Sketches.build(df, col("k"))
      val exact = df.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
      val est = Sketches.estimate(exact.select("k"), "k", sketch)
      exact.join(est, "k")
        .filter(col("cms_est") < col("n_exact")).count() == 0
    }

  property("cms is exact for an absent key (estimate 0 or collision mass only)") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val df = keys.toDF("k")
      val sketch = Sketches.build(df, col("k"))
      // A key outside the alphabet of `key` can only pick up collision
      // mass; its estimate is bounded by the total insert count.
      val probe = Seq("!absent-key!").toDF("k")
      val est = Sketches.estimate(probe, "k", sketch)
        .select(col("cms_est")).as[Long].head()
      est >= 0 && est <= keys.length
    }

  property("fixedKPerGroup returns min(k, group size) rows per group, deterministically") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 500L)))) { rows =>
      val df = rows.distinct.toDF("g", "id")
      val sizes = df.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val k = 2
      val sampled = Sampling.fixedKPerGroup(df, col("id"), col("g"), k)
      val got = sampled.groupBy(col("g")).agg(count(lit(1)).as("m"))
      val mismatch = sizes.join(got, "g")
        .filter(col("m") =!= least(col("n"), lit(k.toLong))).count()
      val first = sampled.select(col("g"), col("id")).collect().toSet
      val second = Sampling.fixedKPerGroup(df, col("id"), col("g"), k)
        .select(col("g"), col("id")).collect().toSet
      mismatch == 0 && first == second
    }

  private def esKeyNanos(id: Long, w: Double): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val bp = java.lang.Long.parseLong(hex, 16) % 10000
    math.floor(math.log((bp + 0.5) / 10000.0)
      / math.max(w, 1e-6) * 1e9).toLong
  }

  property("weightedFixedKPerGroup matches the brute-force ES reservoir") =
    forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 500L),
        Gen.choose(1, 100)))) { raw =>
      val rows = raw.map { case (g, id, w) => (g, id, w / 100.0) }
        .groupBy(_._2).map(_._2.head).toSeq // unique ids
      val df = rows.toDF("g", "id", "w")
      val k = 2
      val got = Sampling
        .weightedFixedKPerGroup(df, col("id"), col("g"), col("w"), k)
        .select(col("g"), col("id"), col("sample_rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(r => (r._2, esKeyNanos(r._2, r._3)))
          .sortBy { case (id, s) => (-s, id.toString) }
          .take(k).zipWithIndex
          .map { case ((id, _), i) => (g, id, i + 1) }
      }.toSet
      got == expected
    }

  property("weightedFixedKPerGroup: raising a row's weight never evicts it") = {
    val rows = (0L until 20L).map(id => (0, id, 0.2))
    val df = rows.toDF("g", "id", "w")
    val base = Sampling
      .weightedFixedKPerGroup(df, col("id"), col("g"), col("w"), 3)
      .select(col("id")).as[Long].collect().toSet
    // quintuple the weight of one already-selected row: still selected
    val boosted = rows.map { case (g, id, w) =>
      (g, id, if (id == base.head) 1.0 else w)
    }.toDF("g", "id", "w")
    val after = Sampling
      .weightedFixedKPerGroup(boosted, col("id"), col("g"), col("w"), 3)
      .select(col("id")).as[Long].collect().toSet
    after.contains(base.head)
  }

  property("joinSizeEstimate >= exact join size; exactJoinSize equals the real join count") =
    forAll(Gen.nonEmptyListOf(key), Gen.nonEmptyListOf(key)) { (ka, kb) =>
      val a = ka.toDF("k")
      val b = kb.toDF("k")
      val est = Sketches.joinSizeEstimate(
        Sketches.build(a, col("k")), Sketches.build(b, col("k")))
        .select(col("cms_est")).as[Long].head()
      val viaFreq = Sketches.exactJoinSize(a, col("k"), b, col("k"))
        .select(col("n_exact")).as[Long].head()
      val real = a.join(b, "k").count()
      est >= viaFreq && viaFreq == real
    }

  property("self-join specializations equal the two-sided forms") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val a = keys.toDF("k")
      val s = Sketches.build(a, col("k"))
      val estSelf = Sketches.selfJoinSizeEstimate(s)
        .select(col("cms_est")).as[Long].head()
      val estPair = Sketches.joinSizeEstimate(s, Sketches.build(a, col("k")))
        .select(col("cms_est")).as[Long].head()
      val exSelf = Sketches.exactSelfJoinSize(a, col("k"))
        .select(col("n_exact")).as[Long].head()
      val exPair = Sketches.exactJoinSize(a, col("k"), a, col("k"))
        .select(col("n_exact")).as[Long].head()
      estSelf == estPair && exSelf == exPair
    }

  property("hll: merged registers of a partition equal the registers of the union") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("p0", "p1", "p2"), key))) { rows =>
      val df = rows.toDF("part", "k")
      val partitioned = Sketches.hllRegisters(df, col("k"), col("part"))
      val merged = Sketches.hllMerge(partitioned, "u")
        .select(col("idx"), col("mr")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val direct = Sketches.hllRegisters(df, col("k"), lit("u"))
        .select(col("idx"), col("mr")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      merged == direct
    }

  property("hll: duplicate insertions do not change the registers") =
    forAll(Gen.nonEmptyListOf(key)) { keys =>
      val once = keys.distinct.toDF("k")
      val thrice = (keys ++ keys ++ keys).toDF("k")
      val a = Sketches.hllRegisters(once, col("k"), lit("g"))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
      val b = Sketches.hllRegisters(thrice, col("k"), lit("g"))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
      a == b
    }

  property("hll: estimate of 5000 distinct keys lands within 4 standard errors") = {
    val df = (0 until 5000).map(i => s"key-$i").toDF("k")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, col("k"), lit("g")))
      .select(col("est_raw")).as[Double].head()
    // sigma ≈ 1.04/sqrt(256) ≈ 6.5%; 4 sigma = 26%
    math.abs(est / 5000.0 - 1.0) < 0.26
  }

  property("bottom-k resample of per-part samples equals the one-shot global sample") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("p0", "p1", "p2"),
      Gen.choose(0L, 2000L), Gen.choose(0L, 100L)))) { raw =>
      val rows = raw.groupBy(_._2).map(_._2.head).toSeq // unique ids
      val df = rows.toDF("part", "id", "v")
      val k = 5
      val parts = Sketches.bottomKSample(df, col("id"), col("v"), col("part"), k)
      val merged = Sketches.bottomKResample(parts, "u", k)
        .select(col("id"), col("v")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val direct = Sketches.bottomKSample(df, col("id"), col("v"), lit("u"), k)
        .select(col("id"), col("v")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      merged == direct
    }

  property("sampleDiscQuantiles picks the exact sorted element at the integer index") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 5000L), Gen.choose(-50L, 50L)))) { raw =>
      val rows = raw.groupBy(_._1).map(_._2.head).toSeq // unique ids
      val df = rows.toDF("id", "v")
      val pbps = Seq(0, 5000, 9900, 10000)
      val got = Sketches.sampleDiscQuantiles(
        df.select(lit("g").as("g"), col("id").cast("string").as("id"), col("v")),
        pbps)
        .select(col("pbp"), col("est")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
      val sorted = rows.sortBy(r => (r._2, r._1.toString)).map(_._2)
      val n = sorted.length
      pbps.forall { p =>
        got(p) == sorted(((n - 1).toLong * p / 10000).toInt)
      }
    }

  property("duplicatedNgramStats: verbatim pair scores 1.0, unique doc scores 0.0") = {
    val text = (1 to 12).map(i => s"tok$i").mkString(" ")
    val unique = (1 to 12).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, unique)).toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramStats(docs, n = 10, minDf = 2)
      .select(col("doc_id"), col("dup_fraction"), col("trim_candidate"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    out == Set((1L, 1.0, true), (2L, 1.0, true), (3L, 0.0, false))
  }
}
