package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed at-rest tables — the co-located-join path for fact-fact
  * joins too big to broadcast (SURVEY.md §4.2: the reference's
  * co-partitioned Kafka topics are the streaming analog; Spark's
  * bucketed tables are the at-rest one).
  *
  * Writing both join sides bucketed (and sorted) on the join key by the
  * same bucket count lets the SortMergeJoin consume them with ZERO
  * exchanges — at 100 TB that removes the dominant cost (a full shuffle
  * of each side) from every recurring join on that key; the price is
  * paid once at write time. Asserted plan-mechanically in BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed and sorted on `key`.
    * Bucket count should match the partitioning the downstream joins
    * want (a divisor/multiple of cluster parallelism). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key —
    * shuffle-free by construction. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
