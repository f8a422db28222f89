package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking. A bare `row_number() OVER (ORDER BY …)`
  * moves every row through ONE task (Spark warns "Moving all data to a
  * single partition") — fine for a 39-state dimension, dead at 100 TB.
  *
  * [[globalRowNumber]] is the two-phase form: range-partition on the
  * sort key, rank locally inside each range, then add per-partition
  * offsets. The offset table is one row per shuffle partition
  * (metadata-sized), joined back via broadcast after a triangular
  * self-join computes the running offsets — no global window anywhere
  * in the plan. Costs one extra counting pass over the input; every
  * stage is fully parallel.
  */
object Ranks {

  /** Global 1-based dense row numbering by `order` (which must be a
    * total order — include a unique tiebreaker — for deterministic
    * output). Result column `out` is IntegerType like `row_number`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // MUST materialize: repartitionByRange samples nondeterministically,
    // so the counts branch and the rank branch would otherwise recompute
    // DIFFERENT partition boundaries — offsets then disagree with actual
    // partition sizes and global ranks duplicate (seen at sf0.1). The
    // localCheckpoint pins one partitioning for both consumers and cuts
    // the lineage, at the cost of materializing the input once.
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    // running offset per partition id: triangular join over the
    // parts-row count table (broadcast × broadcast, no window)
    val offsets = counts.as("x")
      .join(broadcast(counts.as("y")), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(coalesce(sum(col("y.__n")), lit(0L)).as("__off"))
    val local = Window.partitionBy("__pid").orderBy(order: _*)
    ranged
      .withColumn("__lrn", row_number().over(local))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, (col("__off") + col("__lrn")).cast("int"))
      .drop("__pid", "__lrn", "__off")
  }
}
