package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus-selection relevance scoring (north-star surface): BM25
  * (Robertson/Spärck Jones; the q50 formula) generalized from a fixed
  * literal term set to a QUERY TABLE — the shape a real targeted-
  * selection pipeline runs, scoring the corpus against many queries in
  * one pass.
  *
  * Scale shape: the query workload is tiny relative to the corpus, so
  * the distinct term set broadcasts into the exploded token stream —
  * the corpus is never shuffled at token granularity; the only
  * shuffles key on (term, doc) postings (already filtered to query
  * terms) and on (query, doc) score groups. df/avgdl stats are one
  * scalar row, broadcast. Two corpus passes run: the posting pass
  * (tokens) and a pruned stats pass that materializes only per-doc
  * lengths (n_docs/avgdl must cover ALL docs, matched or not). A
  * recurring-workload deployment persists the (doc_id, dl) side table
  * and the postings once per corpus snapshot — the same persisted-
  * intermediate note as Dedup's shingle table.
  */
object Relevance {

  /** BM25 scores of every document matching ≥1 term of each query.
    *
    * `docs`: (doc_id, text); `queries`: (query_id, term) long form —
    * one row per query term (explode an array column upstream).
    * Returns (query_id, doc_id, score), docs with no matching term
    * omitted (their score is 0). Scores sum per-term contributions in
    * aggregation order — bit-identical to q50's fixed-order chain is
    * not guaranteed (q50 remains the oracled instance; spec asserts
    * 1e-9 relative agreement on its 6-term query).
    */
  def bm25(docs: DataFrame, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col("doc_id"), T.words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("dl"), explode(col("ws")).as("term"))
    val terms = queries.select("term").distinct()
    // postings restricted to query terms before any shuffle
    val postings = toks.join(broadcast(terms), Seq("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    // stats pass materializes only the per-doc length, not the tokens
    val stats = docs.select(size(T.words(col("text"))).as("dl")).agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("term_score",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // distinct: a duplicated (query_id, term) input row must not
    // double-count that term's contribution (scores are per-term sums,
    // not query-term-frequency-weighted)
    scored.join(broadcast(queries.select("query_id", "term").distinct()), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("term_score")).as("score"))
  }

  /** TF-IDF posting lists — the inverted index a corpus-selection or
    * retrieval stage builds once per snapshot: one row per (doc, term)
    * with its term frequency, document frequency, and weight.
    *
    * Determinism: idf = ln((N+1)/(df+1)) is micro-quantized to an
    * integer (×10⁶, the q50 technique — exact integer inputs, one libm
    * call, rounding granularity 10 orders above ulp divergence) and
    * the weight is the exact integer product tf · idf_q — no float
    * accumulation anywhere, so the whole index oracles hash-exact.
    *
    * Scale shape: tokenize-explode feeds a two-level aggregation —
    * (term, doc) tf counts combine map-side before the one shuffle on
    * the posting key, then df is a second partial-agg pass over the
    * postings (already term-partitioned from the first shuffle, so
    * Catalyst reuses the exchange). N is a 1-row broadcast. The df
    * re-join keys on term — co-partitioned with the postings shuffle,
    * no corpus-width data moves twice. */
  def tfidfPostings(docs: DataFrame): DataFrame = {
    val postings = docs
      .select(col("doc_id"), explode(T.words(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    postings
      .join(dfs, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("idf_q",
        round(log((col("n_docs") + 1).cast("double") / (col("df") + 1))
          * lit(1000000.0)).cast("long"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * col("idf_q")).as("tfidf_q"))
  }
}
