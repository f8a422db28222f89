package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch: timing/plan experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exactTop1 = graft.queries.Registry.byName("q31_knn_cosine").fn(spark, sf)
        .filter(col("rn") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val annSet = graft.queries.Registry.byName("q32_ann_lsh").fn(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = exactTop1.count { case (q, n) => annSet.contains((q, n)) }
      println(s"[probe] $sf recall@1 = $hits/${exactTop1.size}")
    }
    spark.stop()
  }
}
