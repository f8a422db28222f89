package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only scratch: timing/plan experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val dec = DecimalType(18, 2)
    for (_ <- 1 to 3) {
      time("window1day+groupBy") {
        ev.groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("s"))
          .count()
      }
      time("to_date+groupBy") {
        ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("s"))
          .count()
      }
      time("to_date+groupBy nodecimal") {
        ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
          .count()
      }
      time("plain count") { ev.count() }
    }
    spark.stop()
  }
}
