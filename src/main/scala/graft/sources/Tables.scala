package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Normalized access to the driver-generated parquet tables
  * (TESTDATA.md). All queries go through here so ingest normalization
  * happens exactly once, mirroring the reference's pattern of casting
  * string-typed numerics at ingest (SURVEY.md §1.3;
  * covid19-stats/src/main/java/org/covid19/Covid19Stats.java:213-219).
  */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. `events.ts` has shipped as INT64 TIMESTAMP(NANOS)
    * (which Spark's vectorized reader refuses without
    * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
    * without a UTC flag (which Spark reads as TIMESTAMP_NTZ), depending
    * on the generator vintage. Normalize both to the same downstream
    * contract: `ts` (TimestampType, µs, session tz pinned UTC) and
    * `ts_ns` (LongType epoch-nanos).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime-settable session conf; set defensively in case the caller's
      // session (e.g. the driver's smoke runner) didn't configure it.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case types.LongType => // INT64 nanos vintage
          raw.withColumn("ts_ns", col("ts"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case types.TimestampNTZType => // µs-without-UTC-flag vintage
          raw.withColumn("ts", col("ts").cast(types.TimestampType))
            .withColumn("ts_ns", unix_micros(col("ts").cast(types.TimestampType)) * lit(1000L))
        case _ => // already TimestampType
          raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
