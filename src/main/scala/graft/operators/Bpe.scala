package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Byte-pair-encoding tokenizer TRAINING — the vocabulary-learning
  * stage of an LLM data pipeline (Sennrich et al., ACL 2016; the
  * algorithm behind GPT-2/RoBERTa-style tokenizers). The pipeline
  * split follows the standard scalable recipe (as in SentencePiece /
  * HF tokenizers over big corpora):
  *
  *   1. CORPUS-SIZED, distributed: word counting — one map-side-
  *      combining aggregation over the token stream; the only stage
  *      that touches all 100 TB.
  *   2. MODEL-SIZED, bounded: the merge loop runs over the DISTINCT
  *      word-frequency table capped to `maxWords` entries by count
  *      (TakeOrderedAndProject — per-partition bounded top-k, never a
  *      global sort). BPE statistics are a function of the
  *      word-frequency histogram, not of corpus layout, so the cap is
  *      the only approximation, and the dropped tail is the
  *      lowest-count words whose pair contributions are bounded by
  *      maxWords·|word| anyway.
  *
  * Everything is deterministic: ties in pair counts break
  * lexicographically, so two runs (or two engines) learn the
  * identical merge table.
  */
object Bpe {

  /** End-of-word marker symbol (a distinct symbol, never a char). */
  val EndMarker = "</w>"

  /** Distributed word counts — the corpus-sized stage. One exchange,
    * map-side partial counts; the word table out of this is
    * vocabulary-sized, not corpus-sized. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(T.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Vocabulary cap: top `maxWords` by (cnt desc, word asc).
    * `orderBy.limit` plans as TakeOrderedAndProject — each task keeps
    * a bounded heap and the driver merges k-sized partials, so the
    * cap never global-sorts the vocabulary. */
  def cappedVocab(wc: DataFrame, maxWords: Int): DataFrame =
    wc.orderBy(col("cnt").desc, col("w").asc).limit(maxWords)

  /** Distributed weighted symbol-pair counts for the INITIAL
    * char-level vocabulary — the scoring core of one BPE step, kept
    * distributed (and exactly SQL-oracle-able, q127) so the
    * first-merge statistics of a 100 TB corpus never need the driver.
    * Every word of length L contributes its L−1 adjacent char pairs
    * plus (last char, EndMarker), each weighted by the word's count. */
  def pairCounts(wc: DataFrame): DataFrame =
    wc.select(col("w"), col("cnt"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(expr("substr(w, i, 1)").as("l"),
        when(col("i") === length(col("w")), lit(EndMarker))
          .otherwise(expr("substr(w, i + 1, 1)")).as("r"),
        col("cnt"))
      .groupBy("l", "r").agg(sum(col("cnt")).as("cnt"))

  /** The merge loop over an in-memory word-frequency table — the
    * model-sized stage (the capped vocab collect is the same
    * model-sized-collect class as the ANN codebook). Greedy: each
    * round counts weighted adjacent symbol pairs, takes the max
    * (count desc, then (left, right) lexicographic asc — the
    * deterministic tie-break), merges it everywhere, repeats. Naive
    * recount per round costs O(numMerges · Σ|word|); at vocab caps
    * beyond ~10⁵ words × 10⁴ merges swap in the standard
    * pair-position-index incremental update — the merge TABLE is
    * identical either way. */
  def learnFromCounts(vocab: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = vocab.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndMarker, c)
    }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Merge every non-overlapping left-to-right occurrence of the pair. */
  private[operators] def applyMerge(syms: Array[String],
      m: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** End-to-end training: distributed count → bounded cap → driver
    * merge loop. Returns the ordered merge list. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int): Seq[(String, String)] =
    learnFromCounts(
      cappedVocab(wordCounts(docs, textCol), maxWords)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      numMerges)

  /** Merge table as a frame (rank, left, right, merged) — the
    * persistable tokenizer artifact. */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false)))
    val rows = merges.zipWithIndex.map { case ((l, r), i) =>
      Row(i.toLong, l, r, l + r)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Encode a document table with a learned merge list: adds
    * `subwords` (array of BPE tokens over all words in order). The
    * merge table rides the expression into the task binary —
    * broadcast once per executor by Spark's closure shipping; the
    * per-row work is embarrassingly parallel and layout-independent
    * (see [[graft.functions.expressions.BpeEncode]] for the greedy
    * lowest-rank merge semantics + the per-thread word memo that
    * makes Zipf-shaped corpora cheap). */
  def encode(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.withColumn("subwords",
      graft.functions.expressions.GraftExpressions
        .bpeEncode(T.words(col(textCol)), merges))
}
