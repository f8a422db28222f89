package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Statistical language-model quality scoring — the KenLM-filter shape
  * of a training-data pipeline (perplexity gates à la CCNet/RefinedWeb)
  * reduced to a self-trained add-one-smoothed word-bigram model: train
  * counts over the corpus, score every document by its average negative
  * log-probability. High avg-NLL = improbable word sequences = the
  * rows a quality gate drops.
  *
  * Determinism (the oracle gate): each bigram's
  * -ln((c2+1)/(c1+V)) is micro-quantized to an integer (×10⁶, the q50
  * technique — the log's input is an IEEE division of exact integers,
  * and 10⁻⁶ rounding granularity sits ~10 orders above cross-libm ulp
  * divergence), and everything downstream — per-doc sums, counts — is
  * exact 64-bit integer math, order-independent under any shuffle or
  * accumulation schedule. The final avg divides two exact integers.
  *
  * Scale shape: the model is two aggregations with map-side combine
  * (bigram counts, history counts) joined back to the exploded corpus
  * on the bigram key — the canonical count-then-rejoin plan; nothing
  * keys on doc until the last per-doc rollup. Vocabulary size is a
  * 1-row broadcast. At 100 TB the bigram table is large but
  * hash-partitioned and combiner-compressed (distinct bigrams, not
  * occurrences, cross the wire); a recurring deployment persists it
  * once per corpus snapshot like Dedup's shingle table.
  */
object LangModel {

  /** Per-document bigram NLL scores: (doc_id, n_bigrams, nll_q_sum,
    * avg_nll). `nll_q_sum` is the exact integer sum of ×10⁶-quantized
    * per-bigram NLLs; `avg_nll` = nll_q_sum / n_bigrams / 10⁶. Docs
    * with fewer than 2 tokens carry no bigram and are omitted. */
  def bigramNll(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), T.words(col("text")).as("ws"))
    // consecutive (w1, w2) pairs; transform's index is 0-based and
    // Spark's ws[i] is 0-based (DuckDB's is 1-based — the oracle adjusts)
    val bigrams = toks.filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(slice(ws, 1, size(ws) - 1), (x, i) -> struct(x AS w1, ws[i + 1] AS w2))"))
          .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val model = c2.join(c1, Seq("w1")).crossJoin(broadcast(vocab))
      .withColumn("nll_q",
        round(-log((col("c2") + 1).cast("double") / (col("c1") + col("v")))
          * lit(1000000.0)).cast("long"))
      .select("w1", "w2", "nll_q")
    bigrams.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_q")).as("nll_q_sum"))
      .withColumn("avg_nll",
        col("nll_q_sum").cast("double") / col("n_bigrams") / lit(1000000.0))
  }

  /** Per-source unigram-distribution KL divergence from the whole
    * corpus — the domain-drift / outlier-source detector of a mixture
    * pipeline (a source whose KL(P_s ‖ P_corpus) jumps between
    * snapshots changed registers: scraper drift, spam influx, language
    * shift). KL(P_s ‖ P) = Σ_w (c_sw/C_s) · ln((c_sw·C)/(C_s·c_w));
    * every source word exists in the corpus so the ratio is finite
    * and > 0.
    *
    * Determinism: the two products are exact BIGINTs, each per-word
    * term is one IEEE division + ln + multiply, nano-quantized (×10⁹,
    * round — q66's technique three decades finer), and the per-source
    * sum is exact integer math, order-independent. `kl` re-derives the
    * double from the exact sum in one division.
    *
    * Scale shape: per-(source,word) counts are one combiner-compressed
    * aggregation; corpus word totals RE-AGGREGATE that compressed
    * table (distinct (source,word) rows, not occurrences, cross the
    * second exchange); source totals and the grand total are
    * sources-sized broadcasts; nothing keys on source until the final
    * |sources|-row rollup. The integer-product form c_sw·C bounds at
    * tokens², exact under ~3·10⁹ corpus tokens — past that (the
    * 100 TB deployment) promote the two products to DECIMAL(38,0)
    * internally or divide first; the integer form is the oracle-parity
    * form at test scale. */
  def sourceUnigramKl(docs: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val words = docs.select(col(srcCol).as("source"),
      explode(T.words(col(textCol))).as("w"))
    val csw = words.groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
    val cw = csw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
    val cs = csw.groupBy("source").agg(sum(col("c_sw")).as("c_s"),
      count(lit(1)).as("n_types"))
    val tot = cs.agg(sum(col("c_s")).as("c_tot"))
    csw.join(cw, Seq("w"))
      .join(broadcast(cs), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("term_q",
        round((col("c_sw").cast("double") / col("c_s").cast("double"))
          * log((col("c_sw") * col("c_tot")).cast("double")
            / (col("c_s") * col("c_w")).cast("double"))
          * lit(1.0e9)).cast("long"))
      .groupBy("source")
      .agg(max(col("c_s")).as("n_tokens"), max(col("n_types")).as("n_types"),
        sum(col("term_q")).as("kl_nano"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("kl_nano"),
        (col("kl_nano").cast("double") / lit(1.0e9)).as("kl"))
  }

  /** Hashing-trick linear classifier INFERENCE — the fastText /
    * DCLM-style quality-classifier shape (reference analogue: none;
    * this is the "train a cheap classifier offline, score the corpus
    * in-engine" stage every modern curation pipeline runs): each
    * token hashes into one of `dim` feature buckets and the document
    * score is the sum of integer bucket weights over token
    * OCCURRENCES (bag-of-hashed-features, exactly a linear model
    * after the hashing trick). Returns (doc_id, n_tokens, score,
    * keep) with keep = score ≥ 0.
    *
    * The weights here DERIVE deterministically from the bucket id
    * (w(b) = b·2654435761 mod 2001 − 1000 ∈ [−1000, 1000] — a fixed
    * pseudo-model, products < 2⁵³ so the math is exact in any
    * engine's 64-bit integers), which makes the whole inference path
    * engine-portable and hash-oracled (q119); a production deployment
    * swaps in weights learned offline, broadcast as a literal map or
    * joined on the bucket id — the plan shape is identical. Scale
    * shape: everything happens inside the row (one native token-hash
    * pass + one integer fold); the operator adds NO shuffle at all. */
  def hashClassifierScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", dim: Int = 4096): DataFrame = {
    require(dim >= 2, s"feature dim must be >= 2, got $dim")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.expressions.GraftExpressions
          .shingleHashes(T.words(col(textCol)), 1, ordered = true, poly = true)
          .as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_tokens"),
        aggregate(col("hs"), lit(0L), (acc, h) =>
          acc + ((h % dim) * lit(2654435761L) % 2001L - 1000L)).as("score"))
      .withColumn("keep", col("score") >= 0)
  }
}
