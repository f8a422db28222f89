package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE trainer + encoder: the Sennrich ACL'16 worked example
  * (low/lower/newest/widest), hand-computed with the </w> marker and
  * the (count desc, pair lexicographic asc) tie-break. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val classicVocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnFromCounts reproduces the classic merge sequence") {
    // pair counts round 1: (e,s)=9 (s,t)=9 (t,</w>)=9 tie → 'e'<'s'<'t'
    // → es, est, est</w>, then (l,o)=7 (o,w)=7 tie → lo, then low
    val merges = Bpe.learnFromCounts(classicVocab, numMerges = 5)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("merge loop stops when no pair repeats and never fabricates merges") {
    val merges = Bpe.learnFromCounts(Seq(("ab", 1L)), numMerges = 10)
    // "ab" = a b </w>: merges (a,b) then (ab,</w>), then the word is
    // one symbol and the loop exhausts at 2 of the requested 10
    assert(merges === Seq(("a", "b"), ("ab", "</w>")))
    val exhausted = Bpe.learnFromCounts(Seq(("a", 1L)), numMerges = 10)
    assert(exhausted === Seq(("a", "</w>")))
  }

  test("encoder applies greedy lowest-rank merges (classic 'lowest')") {
    val merges = Bpe.learnFromCounts(classicVocab, numMerges = 5)
    val out = Bpe.encode(Seq((1L, "lowest")).toDF("doc_id", "text"),
        "text", merges)
      .select(col("subwords")).collect().head.getSeq[String](0)
    // l o w e s t </w> → es → est → est</w> → lo → low
    assert(out === Seq("low", "est</w>"))
  }

  test("encoder round-trips: concatenated subwords rebuild each word + marker") {
    val docs = graft.sources.Tables.load(spark, sf, "documents").limit(50)
    val merges = Bpe.learnMerges(docs, "text", numMerges = 40, maxWords = 5000)
    val bad = Bpe.encode(docs, "text", merges)
      .select(col("doc_id"), col("text"),
        concat_ws("", col("subwords")).as("rebuilt"))
      .withColumn("expected",
        concat(regexp_replace(col("text"), " ", "</w>"), lit("</w>")))
      // drop empty-token artifacts of double spaces if any: compare
      // after stripping marker-only runs
      .filter(col("rebuilt") =!= col("expected"))
      .count()
    assert(bad === 0L)
  }

  test("subword count is bounded: n_words <= n_subwords <= total chars + words") {
    val docs = graft.sources.Tables.load(spark, sf, "documents").limit(50)
    val merges = Bpe.learnMerges(docs, "text", numMerges = 40, maxWords = 5000)
    val viol = Bpe.encode(docs, "text", merges)
      .select(
        size(graft.functions.TextFunctions.words(col("text"))).as("nw"),
        size(col("subwords")).as("ns"),
        length(regexp_replace(col("text"), " ", "")).as("nc"))
      .filter(col("ns") < col("nw") || col("ns") > col("nc") + col("nw"))
      .count()
    assert(viol === 0L)
  }

  test("distributed pairCounts matches the driver loop's first-round stats") {
    val wc = classicVocab.toDF("w", "cnt")
    val m = Bpe.pairCounts(wc).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("e", "s")) === 9L)
    assert(m(("s", "t")) === 9L)
    assert(m(("t", "</w>")) === 9L)
    assert(m(("l", "o")) === 7L)
    assert(m(("o", "w")) === 7L)
    assert(m(("w", "e")) === 8L) // lower(2) + newest(6)
    assert(m(("w", "</w>")) === 5L)
  }
}
