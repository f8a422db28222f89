package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions => T}
import graft.sources.Tables

/** Round-10 wave: RANKING-QUALITY EVALUATION of a retrieval stack —
  * the measurement layer the retrieval family (BM25 index q179+,
  * ANN q31+, RRF q171, PRF q202) ships results INTO: nDCG@10, MRR@10
  * and recall@10 of a ranker against an independent relevance signal,
  * plus Spearman rank correlation between two document signals. The
  * reference has no retrieval at all; an LLM-data pipeline tunes its
  * retrieval/dedup thresholds against exactly these numbers.
  *
  * Evaluation frame shared by q219/q220: the query set is the top-5
  * corpus terms by document frequency (stopwords excluded,
  * (df desc, term asc) total order — deterministic, so both engines
  * pick the identical queries). For each query term the CANDIDATES
  * are all docs containing it, RANKED by (tf desc, doc_id asc) — the
  * tf ranker — and LABELED by an independent lead-position signal:
  * rel 2 if the term first occurs within the doc's first 10 words,
  * 1 within 20, else 0 (the "topical docs mention it early" proxy).
  * Ranker and label genuinely disagree (measured nDCG 0.53-0.89 at
  * sf0.01), which is what makes the metric informative.
  *
  * Exactness: ranks and labels are exact integers; each DCG position
  * contributes round(gain·10⁶/ln(i+1)) — a final per-row double from
  * identical integer inputs with identical expression trees (the
  * q65/q66 ln discipline) — and every sum is an order-immune BIGINT.
  * The natural-log discount is deliberate: nDCG is invariant to the
  * log base (it cancels in dcg/idcg), so ln avoids a second
  * transcendental; dcg_u6/idcg_u6 are therefore base-e DCGs.
  *
  * Scale shape: postings are one scan + one map-side-combining
  * groupBy; the query set is 5 rows (broadcast); candidates reduce to
  * the 5 terms' postings before touching the docs table (equi-join on
  * doc_id for the position label). The per-term rank windows
  * partition by term — parallelism = the EVAL-QUERY count, each
  * partition bounded by df(term); an eval harness runs dozens of
  * queries, not millions, and a df-capped variant would swap the
  * window for the bounded-heap top-k ([[graft.operators.Ranks]]) if
  * eval queries ever scaled past executor counts.
  */
object RetrievalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val stop = Seq("the", "a", "of", "and", "to")

  private val sqlPrefix =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |             FROM documents),
      |p AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
      |d AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
      |qs AS (SELECT term FROM d WHERE term NOT IN ('the','a','of','and','to')
      |       ORDER BY df DESC, term ASC LIMIT 5),
      |cand AS (SELECT p.term, p.doc_id, p.tf,
      |                list_position(string_split(doc.text, ' '), p.term) AS pos
      |         FROM p JOIN qs USING (term)
      |         JOIN documents doc ON doc.doc_id = p.doc_id),""".stripMargin

  /** (term, doc_id, tf, pos) for the 5 query terms; pos is the
    * 1-based first occurrence of the term in the doc's words (always
    * defined — candidates come from the doc's own postings). */
  private def candidates(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val p = docs
      .select(col("doc_id"), explode(T.words(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val qs = p.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(!col("term").isin(stop: _*))
      .orderBy(col("df").desc, col("term").asc)
      .limit(5)
      .select("term")
    p.join(broadcast(qs), Seq("term"))
      .join(docs.select(col("doc_id"), T.words(col("text")).as("ws")),
        Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"),
        expr("array_position(ws, term)").cast(LongType).as("pos"))
  }

  private def gain(rel: Column): Column =
    when(rel === 2, 3L).when(rel === 1, 1L).otherwise(0L)

  /** q219: nDCG@10 of the tf ranker against the lead-position labels,
    * per query term. dcg_u6/idcg_u6 are the base-e DCGs in micro-units
    * (exact integer sums of per-position quanta); ndcg_ppm is their
    * exact integer ratio, NULL when the term has no relevant doc at
    * all (idcg 0). The ideal ranking reorders the SAME candidate set
    * by (rel desc, doc_id asc) — tie order among equal gains cannot
    * change a DCG. */
  val retrievalNdcg: Q = Q(
    "q219_retrieval_ndcg",
    s"""$sqlPrefix
      |rel AS (SELECT term, doc_id, tf,
      |               CASE WHEN pos <= 10 THEN 2 WHEN pos <= 20 THEN 1
      |                    ELSE 0 END AS rel
      |        FROM cand),
      |rk AS (SELECT term, rel,
      |              row_number() OVER (PARTITION BY term
      |                ORDER BY tf DESC, doc_id ASC) AS i,
      |              row_number() OVER (PARTITION BY term
      |                ORDER BY rel DESC, doc_id ASC) AS ideal_i
      |       FROM rel),
      |g AS (SELECT term,
      |        CASE rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS gain,
      |        i, ideal_i FROM rk),
      |dcg AS (SELECT term, count(*) AS n_candidates,
      |          sum(CASE WHEN i <= 10 THEN CAST(round(gain
      |            / ln(CAST(i + 1 AS DOUBLE)) * 1000000) AS BIGINT)
      |            ELSE 0 END) AS dcg_u6,
      |          sum(CASE WHEN ideal_i <= 10 THEN CAST(round(gain
      |            / ln(CAST(ideal_i + 1 AS DOUBLE)) * 1000000) AS BIGINT)
      |            ELSE 0 END) AS idcg_u6
      |        FROM g GROUP BY term)
      |SELECT term, CAST(n_candidates AS BIGINT) AS n_candidates,
      |       CAST(dcg_u6 AS BIGINT) AS dcg_u6,
      |       CAST(idcg_u6 AS BIGINT) AS idcg_u6,
      |       CAST(CASE WHEN idcg_u6 = 0 THEN NULL
      |            ELSE (1000000 * dcg_u6) // idcg_u6 END AS BIGINT) AS ndcg_ppm
      |FROM dcg""".stripMargin
  ) { (s, dir) =>
    val rel = candidates(s, dir)
      .withColumn("rel",
        when(col("pos") <= 10, 2L).when(col("pos") <= 20, 1L).otherwise(0L))
    val byTf = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("doc_id").asc)
    val byRel = Window.partitionBy("term")
      .orderBy(col("rel").desc, col("doc_id").asc)
    val quant = (g: Column, i: Column) =>
      when(i <= 10,
        round(g / log((i + 1).cast("double")) * 1000000).cast(LongType))
        .otherwise(0L)
    rel
      .withColumn("i", row_number().over(byTf).cast(LongType))
      .withColumn("ideal_i", row_number().over(byRel).cast(LongType))
      .withColumn("gain", gain(col("rel")))
      .groupBy("term")
      .agg(count(lit(1)).as("n_candidates"),
        sum(quant(col("gain"), col("i"))).as("dcg_u6"),
        sum(quant(col("gain"), col("ideal_i"))).as("idcg_u6"))
      .select(col("term"), col("n_candidates"), col("dcg_u6"), col("idcg_u6"),
        when(col("idcg_u6") === 0, lit(null).cast(LongType))
          .otherwise(expr("(1000000 * dcg_u6) div idcg_u6"))
          .cast(LongType).as("ndcg_ppm"))
  }

  /** q220: MRR@10 and recall@10 of the same ranker, binary labels
    * (relevant = first occurrence within 20 words). rr_u6 is the
    * exact reciprocal rank floor(10⁶/first_hit) (0 when the top-10
    * has no relevant doc); recall10_ppm divides top-10 hits by the
    * term's FULL relevant count — the honest denominator, not the
    * truncated one. */
  val retrievalMrr: Q = Q(
    "q220_retrieval_mrr",
    s"""$sqlPrefix
      |rel AS (SELECT term, doc_id, tf,
      |               CASE WHEN pos <= 20 THEN 1 ELSE 0 END AS is_rel
      |        FROM cand),
      |rk AS (SELECT term, is_rel,
      |              row_number() OVER (PARTITION BY term
      |                ORDER BY tf DESC, doc_id ASC) AS i
      |       FROM rel),
      |m AS (SELECT term,
      |        min(CASE WHEN i <= 10 AND is_rel = 1 THEN i END) AS first_rel,
      |        sum(CASE WHEN i <= 10 AND is_rel = 1 THEN 1 ELSE 0 END) AS hits10,
      |        sum(is_rel) AS n_relevant
      |      FROM rk GROUP BY term)
      |SELECT term,
      |       CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) AS rr_u6,
      |       CAST(hits10 AS BIGINT) AS hits10,
      |       CAST(n_relevant AS BIGINT) AS n_relevant,
      |       CAST(CASE WHEN n_relevant = 0 THEN NULL
      |            ELSE (1000000 * hits10) // n_relevant END AS BIGINT) AS recall10_ppm
      |FROM m""".stripMargin
  ) { (s, dir) =>
    val rel = candidates(s, dir)
      .withColumn("is_rel", when(col("pos") <= 20, 1L).otherwise(0L))
    val byTf = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("doc_id").asc)
    rel
      .withColumn("i", row_number().over(byTf).cast(LongType))
      .groupBy("term")
      .agg(min(when(col("i") <= 10 && col("is_rel") === 1, col("i")))
          .as("first_rel"),
        sum(when(col("i") <= 10 && col("is_rel") === 1, 1L).otherwise(0L))
          .as("hits10"),
        sum(col("is_rel")).as("n_relevant"))
      .select(col("term"),
        coalesce(expr("1000000 div first_rel"), lit(0L))
          .cast(LongType).as("rr_u6"),
        col("hits10"), col("n_relevant"),
        when(col("n_relevant") === 0, lit(null).cast(LongType))
          .otherwise(expr("(1000000 * hits10) div n_relevant"))
          .cast(LongType).as("recall10_ppm"))
  }

  /** q290: MAP@10 of the same ranker — the eval trio's third leg
    * (nDCG grades positions, MRR sees only the first hit, AP averages
    * precision at EVERY relevant position, so it punishes a ranker
    * that buries half the relevant set where the other two can't).
    * Binary labels as q220. Exactness: precision@i = cumrel_i / i has
    * denominator i ≤ 10, so scaling by lcm(1..10) = 2520 makes every
    * contribution an exact integer ((2520 div i)·cumrel_i); the final
    * ap_ppm divides once by 2520·min(R,10) — no per-term floats at
    * all, the only transcendental-free member of the trio. Same
    * keyed-window shape as q219/q220 (partition by eval term). */
  val retrievalMap: Q = Q(
    "q290_retrieval_map",
    s"""$sqlPrefix
      |rel AS (SELECT term, doc_id, tf,
      |               CASE WHEN pos <= 20 THEN 1 ELSE 0 END AS is_rel
      |        FROM cand),
      |rk AS (SELECT term, is_rel,
      |              row_number() OVER (PARTITION BY term
      |                ORDER BY tf DESC, doc_id ASC) AS i
      |       FROM rel),
      |cr AS (SELECT term, is_rel, i,
      |              sum(is_rel) OVER (PARTITION BY term ORDER BY i)
      |                AS cumrel
      |       FROM rk),
      |m AS (SELECT term,
      |        sum(CASE WHEN i <= 10 AND is_rel = 1
      |            THEN (2520 // i) * cumrel ELSE 0 END) AS s2520,
      |        sum(is_rel) AS n_relevant
      |      FROM cr GROUP BY term)
      |SELECT term, CAST(n_relevant AS BIGINT) AS n_relevant,
      |       CAST(CASE WHEN n_relevant = 0 THEN NULL
      |            ELSE (1000000 * s2520)
      |                 // (2520 * least(n_relevant, 10)) END
      |         AS BIGINT) AS ap_ppm
      |FROM m""".stripMargin
  ) { (s, dir) =>
    val rel = candidates(s, dir)
      .withColumn("is_rel", when(col("pos") <= 20, 1L).otherwise(0L))
    val byTf = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("doc_id").asc)
    val byI = Window.partitionBy("term").orderBy("i")
    rel
      .withColumn("i", row_number().over(byTf).cast(LongType))
      .withColumn("cumrel", sum(col("is_rel")).over(byI))
      .groupBy("term")
      .agg(sum(when(col("i") <= 10 && col("is_rel") === 1,
          expr("(2520 div i) * cumrel")).otherwise(0L)).as("s2520"),
        sum(col("is_rel")).as("n_relevant"))
      .select(col("term"), col("n_relevant"),
        when(col("n_relevant") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            "(1000000 * s2520) div (2520 * least(n_relevant, 10))"))
          .cast(LongType).as("ap_ppm"))
  }

  /** q221: SPEARMAN rank correlation per source between two document
    * signals — char length vs distinct-word count (vocabulary
    * breadth): "are a source's longer docs actually richer, or just
    * padded?" Tied values take average ranks kept exact as DOUBLED
    * integers (2·min_rank + tie_count − 1), so Σd² accumulates 4Σd²
    * as an exact BIGINT; ρ uses the classic 1 − 6Σd²/(n(n²−1)) form
    * on those tie-adjusted ranks (the standard uncorrected estimator)
    * as ONE final double expression from identical exact inputs —
    * n³ never materializes as an integer, so no overflow at any group
    * size. Windows partition by (source) and (source, value): the
    * per-source sort is the only ordering, never global. */
  val spearmanSignals: Q = Q(
    "q221_spearman_signals",
    """WITH f AS (SELECT source, doc_id, n_chars,
      |                  len(list_distinct(string_split(text, ' '))) AS n_uniq
      |           FROM documents),
      |r AS (SELECT source,
      |        2 * rank() OVER (PARTITION BY source ORDER BY n_chars)
      |          + count(*) OVER (PARTITION BY source, n_chars) - 1 AS rx2,
      |        2 * rank() OVER (PARTITION BY source ORDER BY n_uniq)
      |          + count(*) OVER (PARTITION BY source, n_uniq) - 1 AS ry2
      |      FROM f),
      |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum((rx2 - ry2) * (rx2 - ry2)) AS BIGINT) AS d4sum
      |      FROM r GROUP BY source)
      |SELECT source, n_docs,
      |       CAST(round((1.0 - 1.5 * CAST(d4sum AS DOUBLE)
      |           / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)
      |              * CAST(n_docs AS DOUBLE) - CAST(n_docs AS DOUBLE)))
      |         * 1000000) AS BIGINT) AS spearman_ppm
      |FROM s""".stripMargin
  ) { (s, dir) =>
    val f = t(s, dir, "documents")
      .select(col("source"), col("n_chars"),
        size(array_distinct(T.words(col("text")))).as("n_uniq"))
    def dblRank(v: String): Column =
      (lit(2) * rank().over(Window.partitionBy("source").orderBy(col(v)))
        + count(lit(1)).over(Window.partitionBy("source", v)) - 1)
        .cast(LongType)
    val d = (dblRank("n_chars") - dblRank("n_uniq"))
    f.select(col("source"), (d * d).as("dd"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("dd")).as("d4sum"))
      .select(col("source"), col("n_docs"),
        round((lit(1.0) - lit(1.5) * col("d4sum").cast("double")
            / (col("n_docs").cast("double") * col("n_docs").cast("double")
              * col("n_docs").cast("double") - col("n_docs").cast("double")))
          * 1000000).cast(LongType).as("spearman_ppm"))
  }

  /** q268: RANK-BIASED OVERLAP (Webber, Moffat & Zobel 2010) between
    * two top-20 product rankings — revenue-ranked vs order-count-
    * ranked — the TOP-WEIGHTED comparison Kendall/Spearman (whole-list,
    * uniform weight) can't express: disagreement at rank 1 matters
    * more than at rank 20, which is exactly how dashboards and
    * retrieval stacks are consumed. With persistence p = 1/2 every
    * depth-d term is an EXACT dyadic rational — (1−p)p^(d−1)·ov(d)/d =
    * ov(d)/(d·2^d) — so the whole metric is integer floor division,
    * no transcendentals at all (the shift-not-pow discipline of
    * q218's decay weights). Output is the full depth profile (d,
    * overlap-at-d, term) rather than one scalar — richer to hash and
    * to read.
    *
    * Windowless ranking: both top-20 lists take the bounded
    * TakeOrdered and get ranks from the native RunningSum over the
    * 20-row frame (the q264 pattern); ov(d) = |{common keys with
    * max(rank_a, rank_b) ≤ d}| comes from one 20×20-bounded join
    * against the literal depth spine. Nothing here scales with the
    * lineitem row count except the two map-side-combined rollups. */
  val rankBiasedOverlap: Q = Q(
    "q268_rank_biased_overlap",
    """WITH a AS (SELECT l_partkey AS pk,
      |             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |               AS BIGINT) AS rev
      |           FROM lineitem GROUP BY 1 ORDER BY rev DESC, pk LIMIT 20),
      |ra AS (SELECT pk, CAST(row_number() OVER (ORDER BY rev DESC, pk)
      |         AS BIGINT) AS rk FROM a),
      |b AS (SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n
      |      FROM lineitem GROUP BY 1 ORDER BY n DESC, pk LIMIT 20),
      |rb AS (SELECT pk, CAST(row_number() OVER (ORDER BY n DESC, pk)
      |         AS BIGINT) AS rk FROM b),
      |c AS (SELECT ra.pk, greatest(ra.rk, rb.rk) AS md
      |      FROM ra JOIN rb USING (pk)),
      |dep AS (SELECT CAST(g.d AS BIGINT) AS d FROM generate_series(1, 20) g(d))
      |SELECT dep.d, CAST(count(c.pk) AS BIGINT) AS ov,
      |       (1000000 * CAST(count(c.pk) AS BIGINT))
      |         // (dep.d * (CAST(1 AS BIGINT) << dep.d)) AS term_u6
      |FROM dep LEFT JOIN c ON c.md <= dep.d
      |GROUP BY dep.d""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Ranks
    val li = t(s, dir, "lineitem").select("l_partkey", "l_extendedprice")
    def ranked(metric: DataFrame, m: String): DataFrame =
      Ranks.globalRunningSums(
        metric.orderBy(col(m).desc, col("pk").asc).limit(20),
        Seq(col(m).desc, col("pk").asc), Seq(lit(1L) -> "rk"))
        .select("pk", "rk")
    val ra = ranked(li
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cast(LongType).as("rev")), "rev")
    val rb = ranked(li
      .groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("n")), "n")
    val c = ra.join(rb.withColumnRenamed("rk", "rk_b"), Seq("pk"))
      .select(col("pk"), greatest(col("rk"), col("rk_b")).as("md"))
    s.range(1, 21).toDF("d")
      .join(broadcast(c), col("md") <= col("d"), "left")
      .groupBy("d").agg(count(col("pk")).as("ov"))
      .select(col("d"), col("ov"),
        expr("(1000000 * ov) div (d * shiftleft(1L, cast(d AS int)))")
          .as("term_u6"))
  }

  val all: Seq[Q] = Seq(retrievalNdcg, retrievalMrr, spearmanSignals,
    rankBiasedOverlap, retrievalMap)
}
