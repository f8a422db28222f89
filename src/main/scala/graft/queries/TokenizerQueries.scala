package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.sources.Tables

/** BPE tokenizer training surface (q127–q129): the
  * vocabulary-learning stage of an LLM data pipeline, split the
  * standard scalable way — corpus-sized word counting distributed
  * (and its first-merge pair statistics exactly oracled), the merge
  * loop over the bounded word-frequency table, and corpus re-encoding
  * with the learned merges as a native expression. The merge loop and
  * encoder are deterministic (lexicographic tie-breaks) but not
  * SQL-expressible (iterative string rewriting), so q128/q129 are
  * rows-only with the hand-verified classic-corpus spec
  * (BpeSpec) as their correctness anchor, anchored further by q127's
  * hash-oracled scoring core. */
object TokenizerQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Weighted symbol-pair counts (q127): the scoring core of a BPE
    * step over the initial char vocabulary, fully distributed and
    * hash-oracled — every word of length L contributes L−1 adjacent
    * char pairs plus (last char, marker), weighted by word count. */
  val bpePairCounts: Q = Q(
    "q127_bpe_pair_counts",
    """WITH wc AS (SELECT w, count(*) AS cnt
      |            FROM (SELECT unnest(string_split(text, ' ')) AS w
      |                  FROM documents) s
      |            WHERE w <> '' GROUP BY w),
      |p AS (SELECT substr(w, i, 1) AS l,
      |             CASE WHEN i = length(w) THEN '</w>'
      |                  ELSE substr(w, i + 1, 1) END AS r,
      |             cnt
      |      FROM wc, unnest(range(1, length(w) + 1)) AS t(i))
      |SELECT l, r, CAST(sum(cnt) AS BIGINT) AS cnt
      |FROM p GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    Bpe.pairCounts(Bpe.wordCounts(t(s, dir, "documents"), "text"))
  }

  /** Learned merge table (q128, rows-only): 60 merges over the
    * 20k-capped word-frequency table. Deterministic — BpeSpec pins
    * the classic low/lower/newest/widest merge sequence by hand. */
  val bpeMerges: Q = Q.rowsOnly("q128_bpe_merges") { (s, dir) =>
    Bpe.mergesDf(s,
      Bpe.learnMerges(t(s, dir, "documents"), "text",
        numMerges = 60, maxWords = 20000))
  }

  /** Corpus re-encoding stats (q129, rows-only): per-document subword
    * count under the learned merges next to the raw word count —
    * the tokenizer-fertility report (subwords per word) a vocab
    * sweep reads. Encoding is the native [[Bpe.encode]] expression;
    * BpeSpec pins its greedy lowest-rank semantics. */
  val bpeSubwords: Q = Q.rowsOnly("q129_bpe_subwords") { (s, dir) =>
    val docs = t(s, dir, "documents")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 60,
      maxWords = 20000)
    Bpe.encode(docs, "text", merges)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.words(col("text")))
          .cast("long").as("n_words"),
        size(col("subwords")).cast("long").as("n_subwords"))
  }

  val all: Seq[Q] = Seq(bpePairCounts, bpeMerges, bpeSubwords)
}
