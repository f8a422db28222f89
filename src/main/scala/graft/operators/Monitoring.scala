package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-rate monitoring — the drift alarm layer over per-(key, day)
  * count series. Factored out of the q131 query body so the SAME
  * decision logic runs over a batch daily rollup (q131's oracled path)
  * and over a continuously-maintained streaming daily-count view (the
  * reference's cron-over-KTable monitoring pattern, spec'd in
  * MonitoringSpec): the alarm is a standing query over whichever form
  * of the daily series exists.
  */
object Monitoring {

  /** Trailing-window z-test on a (day, key, n) daily-count frame in
    * EXACT integer arithmetic: flag days where z² > zSq over the
    * `trail` preceding days — (trail·n − S)² > zSq·(trail·SS − S²)
    * with S = Σx, SS = Σx² — no float mean/stddev, so the flag is
    * bit-reproducible on any layout and any engine. Warm-up days
    * (fewer than `trail` predecessors) are excluded, not flagged.
    *
    * The window partitions by `keyCol` and sees only the
    * calendar-bounded per-key daily SERIES (a decade ≈ 3,650 rows per
    * key), never raw event volume — the upstream rollup compresses
    * map-side. Returns (day, keyCol, n, trail_sum, dev7) for flagged
    * days; dev7 = trail·n − S (sign = direction of the anomaly). */
  def rateAnomalies(daily: DataFrame, keyCol: String = "event_type",
      dayCol: String = "day", nCol: String = "n",
      trail: Int = 7, zSq: Int = 4): DataFrame = {
    require(trail >= 2, s"trail must be >= 2, got $trail")
    require(zSq >= 1, s"zSq must be >= 1, got $zSq")
    val tw = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(-trail, -1)
    val n = col(nCol)
    daily
      .withColumn("s", sum(n).over(tw))
      .withColumn("ss", sum(n * n).over(tw))
      .withColumn("k", count(lit(1)).over(tw))
      .filter(col("k") === trail &&
        (lit(trail) * n - col("s")) * (lit(trail) * n - col("s")) >
          lit(zSq) * (lit(trail) * col("ss") - col("s") * col("s")))
      .select(col(dayCol), col(keyCol), n,
        col("s").as("trail_sum"), (lit(trail) * n - col("s")).as("dev7"))
  }
}
