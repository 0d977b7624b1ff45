package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, an IVF-style
  * centroid partitioning as the scale path, and label-blocked
  * near-duplicate pairing.
  *
  * Scale design: brute-force is O(queries × corpus) — fine for small
  * query sets because the corpus side stays partitioned and the tiny
  * query side broadcasts. The IVF path cuts the searched corpus to one
  * cell per query (centroid assignment is a broadcast join against C
  * centroids; cells are co-partitioned by `repartition(cell)` for
  * repeated probes). All arithmetic is promoted to double with a fixed
  * evaluation order so results are reproducible across engines.
  */
object Similarity {

  /** Sequential-order dot product of two float arrays, in double —
    * the fused native expression ([[graft.functions.FloatDotProduct]],
    * whole-stage-codegen'd tight loop). Accumulation order matches the
    * `aggregate(zip_with(...))` built-in formulation bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.floatDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (ranking happens on the rounded
    * value so cross-engine ties resolve identically). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Pair cosine from precomputed norms — norms are O(corpus), pair
    * dots are O(pairs); never recompute norms inside the pair join. */
  private def pairCos(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  /** Decouple CPU parallelism from input file splits (the embeddings
    * table is one small file = one partition, but the pair loops it
    * feeds are the most compute-intense stages in the engine). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("vec_id"))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors by (cosine desc, vec_id asc). The query side is
    * tiny — broadcast it so the corpus never shuffles. */
  def knnBruteForce(embeddings: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val queries = broadcast(
      embeddings.filter(col("vec_id") < queryMaxId)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          norm(col("embedding")).as("qnrm")))
    val corpus = spread(embeddings.filter(col("vec_id") >= queryMaxId))
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val scored = corpus.crossJoin(queries)
      .select(col("qid"), col("vec_id"),
        pairCos(col("qvec"), col("embedding"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF-style cell assignment: centroids = the first C vectors; every
    * vector lands in the cell of its nearest centroid (cosine, ties to
    * the lower centroid id). Returns `(vec_id, cell)`. */
  def ivfAssign(embeddings: DataFrame, numCentroids: Int): DataFrame = {
    val centroids = broadcast(
      embeddings.filter(col("vec_id") < numCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          norm(col("embedding")).as("cnrm")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    spread(embeddings)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .crossJoin(centroids)
      .select(col("vec_id"), col("cid"),
        pairCos(col("embedding"), col("cvec"), col("nrm"), col("cnrm")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
  }

  /** Cell occupancy of the IVF partitioning (the index-build step). */
  def ivfCells(embeddings: DataFrame, numCentroids: Int): DataFrame =
    ivfAssign(embeddings, numCentroids)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("cell"))

  /** IVF search (single-probe): query vectors look only inside their
    * own cell — the join on `cell` is what makes ANN sub-linear; the
    * searched fraction is 1/C instead of the whole corpus. Queries are
    * vectors with `qMinId <= vec_id < qMaxId`; candidates are all other
    * vectors sharing the query's cell. */
  def ivfSearch(embeddings: DataFrame, numCentroids: Int,
                qMinId: Long, qMaxId: Long, k: Int): DataFrame = {
    val assigned = embeddings
      .join(ivfAssign(embeddings, numCentroids), "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = assigned
      .filter(col("vec_id") >= qMinId && col("vec_id") < qMaxId)
      .select(col("vec_id").as("qid"), col("cell"),
        col("embedding").as("qvec"), col("nrm").as("qnrm"))
    val scored = assigned
      .filter(col("vec_id") < qMinId || col("vec_id") >= qMaxId)
      .join(broadcast(queries), "cell")
      .select(col("qid"), col("vec_id"),
        pairCos(col("qvec"), col("embedding"), col("qnrm"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Label-blocked near-duplicate pairs: only same-label pairs are
    * compared (the blocking key stands in for an LSH bucket at scale),
    * keeping the pair count linear in block sizes instead of n². */
  def blockedNearDupPairs(embeddings: DataFrame, minCos: Double): DataFrame = {
    val e = spread(embeddings).select(col("vec_id"), col("label"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        col("a.label").as("label"),
        pairCos(col("a.embedding"), col("b.embedding"),
          col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("va"), col("vb"))
  }
}
