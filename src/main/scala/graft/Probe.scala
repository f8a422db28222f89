package graft

/** Dev-only scratch: timing/plan experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.queries.Registry.byName("q27_ngram_jaccard").fn(spark, dir).count()
      println(f"[probe] q27 run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
