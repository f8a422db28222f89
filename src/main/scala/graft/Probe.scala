package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch: timing/plan experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val sf = "/root/testdata/sf0.001"
    import graft.functions.{TextFunctions => T}
    // simhash signatures for all docs
    val tok = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(array_distinct(T.words(col("text")))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val sig = tok
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("sign", when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1))
      .groupBy("doc_id", "bit").agg(sum(col("sign")).as("bsum"))
      .groupBy("doc_id")
      .agg(sum(when(col("bsum") > 0, expr("shiftleft(1L, bit)")).otherwise(0L)).as("simhash"))
    val exact = graft.queries.Registry.byName("q27_ngram_jaccard").fn(spark, sf)
      .select("doc_a", "doc_b", "jaccard")
    exact.join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("sa")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("sb")), "doc_b")
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .orderBy(desc("hamming"))
      .show(30, truncate = false)
    spark.stop()
  }
}
