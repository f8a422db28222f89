package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Normalized access to the driver-generated parquet tables
  * (TESTDATA.md). All queries go through here so ingest normalization
  * happens exactly once, mirroring the reference's pattern of casting
  * string-typed numerics at ingest (SURVEY.md §1.3;
  * covid19-stats/src/main/java/org/covid19/Covid19Stats.java:213-219).
  */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. `events.ts` is INT64 TIMESTAMP(NANOS) in parquet,
    * which Spark's vectorized reader refuses; with
    * `spark.sql.legacy.parquet.nanosAsLong` we read raw nanos and expose
    * both `ts` (TimestampType, µs) and `ts_ns` (LongType epoch-nanos).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime-settable session conf; set defensively in case the caller's
      // session (e.g. the driver's smoke runner) didn't configure it.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
