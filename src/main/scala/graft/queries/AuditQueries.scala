package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.functions.expressions.GraftExpressions.dotQFast
import graft.operators.{Sharding, Similarity}
import graft.sources.Tables

/** Round-8 wave 2: the pre-training-data QA layer around embeddings and
  * packing — embedding-table validation (the gate before any ANN index
  * build), hard-negative mining for contrastive training, a packing-
  * efficiency report over the 512-token sequence writer, and
  * sentence-granularity duplication rates (the finest-grained dedup
  * diagnostic between q100's 8-gram rate and q67's chunk rate).
  */
object AuditQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Quantized embeddings KEEPING the label column (q146/q147 need it;
    * LlmQueries' twin drops it). */
  private def quantizedL(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        V.quantize(col("embedding")).as("qv"))
      .withColumn("nsq", dotQFast(col("qv"), col("qv")))

  /** q146: embedding-table validation — the QA gate a pipeline runs
    * before spending an index build or a training epoch on a vector
    * table: per label, the population size, exact integer squared-norm
    * envelope (min/max/sum + derived mean), the count of degenerate
    * low-norm vectors (an embedder that emits near-zero vectors fails
    * loudly here, not as silent recall loss three stages later), and
    * the count of wrong-width vectors (schema says list<float>, only a
    * scan proves every row is 64-wide).
    *
    * All comparisons and sums run on the exact integer quantization
    * (2^20 scale; nsq ≤ 64·2^40 ≈ 2^46, so even a 10^16-row per-label
    * sum stays inside int64's 2^63) — the one double, avg_nsq, is a
    * single division of exact integers, IEEE-identical on any engine.
    * Scale shape: one corpus scan, one map-side-combined aggregation
    * keyed by the 10-value label — no join, no window, nothing else
    * crosses the exchange. */
  val embeddingAudit: Q = Q(
    "q146_embedding_audit",
    """WITH qz AS (SELECT vec_id, label,
      |              list_transform(embedding,
      |                x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qv
      |            FROM embeddings),
      |n AS (SELECT vec_id, label, len(qv) AS dims,
      |        CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
      |      FROM qz)
      |SELECT label,
      |       count(*) AS n_vecs,
      |       min(nsq) AS min_nsq,
      |       max(nsq) AS max_nsq,
      |       CAST(sum(nsq) AS BIGINT) AS sum_nsq,
      |       CAST(sum(CASE WHEN nsq < 549755813888 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_low_norm,
      |       CAST(sum(CASE WHEN dims <> 64 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_bad_dims,
      |       CAST(CAST(sum(nsq) AS BIGINT) AS DOUBLE) / count(*) AS avg_nsq
      |FROM n GROUP BY label""".stripMargin
  ) { (s, dir) =>
    // low-norm cut: nsq < 2^39 = half a unit norm squared (unit vectors
    // quantize to nsq ≈ 2^40) — generous enough that quantization noise
    // never trips it, tight enough that a zeroed/collapsed embedding does
    quantizedL(s, dir)
      .withColumn("dims", size(col("qv")).cast(LongType))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("nsq")).as("min_nsq"),
        max(col("nsq")).as("max_nsq"),
        sum(col("nsq")).as("sum_nsq"),
        sum(when(col("nsq") < lit(549755813888L), 1L).otherwise(0L))
          .as("n_low_norm"),
        sum(when(col("dims") =!= 64L, 1L).otherwise(0L)).as("n_bad_dims"))
      .withColumn("avg_nsq",
        col("sum_nsq").cast("double") / col("n_vecs"))
  }

  /** q147: hard-negative mining — for each query vector, the 5 most
    * similar OTHER-label vectors with cosine in [0.2, 0.8): the
    * informative-negatives band of contrastive batch construction
    * (below 0.2 the negative is trivial and teaches nothing; at and
    * above 0.8 it is more likely a mislabeled positive than a true
    * negative, the standard false-negative guard). Same broadcast-
    * query/one-corpus-scan shape as q31's exact kNN; the bounded heap
    * keeps the exchange at k rows per query per partition. */
  val hardNegatives: Q = Q(
    "q147_hard_negatives",
    """WITH qz AS (SELECT vec_id, label,
      |              list_transform(embedding,
      |                x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qv
      |            FROM embeddings),
      |n AS (SELECT vec_id, label, qv,
      |        CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i]))
      |             AS BIGINT) AS nsq
      |      FROM qz),
      |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        CAST(CAST(list_sum(list_transform(range(1, 65),
      |               i -> q.qv[i] * c.qv[i])) AS BIGINT) AS DOUBLE)
      |          / (sqrt(q.nsq) * sqrt(c.nsq)) AS cosine
      |      FROM n q JOIN n c
      |        ON q.vec_id < 20 AND c.vec_id <> q.vec_id
      |       AND c.label <> q.label)
      |SELECT query_id, neighbor_id, cosine, rn FROM (
      |  SELECT query_id, neighbor_id, cosine,
      |         row_number() OVER (PARTITION BY query_id
      |             ORDER BY cosine DESC, neighbor_id) AS rn
      |  FROM s WHERE cosine >= 0.2 AND cosine < 0.8) t
      |WHERE rn <= 5""".stripMargin
  ) { (s, dir) =>
    val e = quantizedL(s, dir)
    Similarity.hardNegatives(e, e.filter(col("vec_id") < 20),
      k = 5, lo = 0.2, hi = 0.8)
  }

  /** q148: packing-efficiency report over q71's 512-token sequence
    * writer — the histogram a data engineer reads before choosing the
    * sequence length: for each docs-per-sequence count, how many
    * sequences land there, how many of them are completely filled, and
    * the total padding tokens (only the final sequence of a contiguous
    * pack can be short, so pad_tokens doubles as a correctness canary:
    * anything above 512 total means the packer leaked gaps).
    *
    * Scale shape: rides [[Sharding.packSequences]]' two-pass prefix sum
    * (per-partition subtotals collected, never the rows), then two
    * map-side-combined aggregations whose keys (seq_id, then the small
    * docs-per-seq integer) shuffle 8-byte rows — the document text
    * never enters the plan. */
  val packingEfficiency: Q = Q(
    "q148_packing_efficiency",
    """WITH d AS (SELECT doc_id,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |           FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |             CAST(sum(n_tok) OVER (ORDER BY doc_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                  AS BIGINT) AS cum_tok
      |      FROM d WHERE n_tok > 0),
      |e AS (SELECT doc_id, n_tok, cum_tok,
      |             unnest(range((cum_tok - n_tok) // 512,
      |                          (cum_tok - 1) // 512 + 1)) AS seq_id
      |      FROM c),
      |x AS (SELECT doc_id, seq_id,
      |             least(cum_tok, (seq_id + 1) * 512)
      |               - greatest(cum_tok - n_tok, seq_id * 512) AS n_tok_in_seq
      |      FROM e),
      |p AS (SELECT seq_id, count(*) AS docs_per_seq,
      |             CAST(sum(n_tok_in_seq) AS BIGINT) AS fill
      |      FROM x GROUP BY seq_id)
      |SELECT docs_per_seq, count(*) AS n_seqs,
      |       CAST(sum(CASE WHEN fill = 512 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_full,
      |       CAST(sum(512 - fill) AS BIGINT) AS pad_tokens
      |FROM p GROUP BY docs_per_seq""".stripMargin
  ) { (s, dir) =>
    val packed = Sharding.packSequences(
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(T.words(col("text"))).cast(LongType).as("n_tok")),
      Seq(col("doc_id")), "n_tok", seqLen = 512L)
    packed.groupBy("seq_id")
      .agg(count(lit(1)).as("docs_per_seq"),
        sum(col("n_tok_in_seq")).as("fill"))
      .groupBy("docs_per_seq")
      .agg(count(lit(1)).as("n_seqs"),
        sum(when(col("fill") === 512L, 1L).otherwise(0L)).as("n_full"),
        sum(lit(512L) - col("fill")).as("pad_tokens"))
  }

  /** q149: sentence-granularity duplication rate by source — the
    * diagnostic between q100's 8-gram duplication rate and q67's
    * chunk-dedup rate: split each document on sentence punctuation,
    * count repeated sentences per source. High sentence-dup with low
    * doc-dup is the signature of templated/boilerplate-heavy sources
    * that doc-level dedup cannot fix and chunk dedup will.
    *
    * The sentence TEXT never crosses an exchange: the explode projects
    * each sentence to its 16-byte md5 digest before the (source,
    * digest) count, and the output is the per-source rollup — the same
    * digest-keyed discipline as chunkDedup (128-bit because a 64-bit
    * key expects collisions at 10^12 sentences, and a collision here
    * miscounts a duplicate). The split regex `[.!?]+` and the
    * space-trim sit in the Java∩RE2 subset, so the oracle (which can
    * afford to group by the raw sentence string at test scale)
    * produces byte-identical sentences. */
  val sentenceDedup: Q = Q(
    "q149_sentence_dedup",
    """WITH s AS (SELECT source,
      |             trim(unnest(regexp_split_to_array(text, '[.!?]+'))) AS sent
      |           FROM documents),
      |f AS (SELECT source, sent FROM s WHERE length(sent) > 0),
      |g AS (SELECT source, sent, count(*) AS c FROM f GROUP BY 1, 2)
      |SELECT source,
      |       CAST(sum(c) AS BIGINT) AS n_sentences,
      |       count(*) AS n_distinct,
      |       CAST(sum(c) - count(*) AS BIGINT) AS n_dup,
      |       CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_rate
      |FROM g GROUP BY source""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("source"),
        explode(split(col("text"), "[.!?]+")).as("sent0"))
      .select(col("source"), trim(col("sent0")).as("sent"))
      .filter(length(col("sent")) > 0)
      .select(col("source"), unhex(md5(col("sent"))).as("d"))
      .groupBy("source", "d")
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum(col("c")).as("n_sentences"),
        count(lit(1)).as("n_distinct"),
        (sum(col("c")) - count(lit(1))).as("n_dup"))
      .withColumn("dup_rate",
        col("n_dup").cast("double") / col("n_sentences"))
  }

  val all: Seq[Q] = Seq(embeddingAudit, hardNegatives, packingEfficiency,
    sentenceDedup)
}
