package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch: timing/plan experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = "/root/testdata/sf0.1"
    import graft.functions.{TextFunctions => T}
    import graft.functions.expressions.GraftExpressions.minhashSig
    val K = 64; val bandRows = 4; val nBands = K / bandRows
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), T.shingles3(T.words(col("text"))).as("shs"))
      .filter(size(col("shs")) > 0)
    val sigs = docs.select(col("doc_id"), minhashSig(col("shs"), K).as("sig"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    time("sig compute")(sigs.count())
    val bands = (0 until nBands).map { b =>
      val slice = (0 until bandRows).map(r => col("sig").getItem(b * bandRows + r))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("key"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val candIds = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("raw band matches")(candIds.count())
    time("distinct candidates")(candIds.dropDuplicates("doc_a", "doc_b").count())
    spark.stop()
  }
}
