package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Measurement aid (optimization rounds): writes `explain("formatted")`
  * for the named queries (or every registered query) to one text file
  * per query, so plan-shape claims (Exchange count, join strategy,
  * PushedFilters/ReadSchema) are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q01_x,q02_y,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.PlanDump <sfDir> <outDir> [q01_x,q02_y,...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.configure(SparkSession.builder(),
      GraftSession.defaultCpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(s"$outDir/$name.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          System.err.println(s"[plandump] $name ok")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        } finally GraftSession.releaseCaches(spark)
      }
    spark.stop()
  }
}
