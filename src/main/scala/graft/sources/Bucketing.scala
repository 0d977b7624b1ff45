package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout management — the batch engine's co-location
  * tool (SURVEY.md §4: the reference's repartition topic ≙ a bucketed
  * layout in the batch world).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets Spark plan the join with NO exchange and NO sort: each
  * bucket pairs 1:1 across tables. At 100 TB the shuffle this avoids is
  * usually the dominant cost of the pipeline, and the layout is
  * reusable across every downstream query on the same key. */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the physical plan contains no Exchange on either
    * side (verify with `.explain` / `BucketingSpec`). */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
