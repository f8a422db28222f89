package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions => T}
import graft.operators.{Decontaminate, Sampling, Sharding}
import graft.sources.Tables

/** Corpus-assembly pipeline stages (the steps between cleaning/dedup
  * and the trainer): benchmark decontamination, deterministic splits,
  * weighted mixture sampling, per-domain quotas, and token-budget shard
  * packing. All five are exactly SQL-expressible, so each has a full
  * DuckDB oracle — including the hash-based ones, which run on the
  * engine-portable md5 hash of [[Sampling.portableHash]] rather than
  * Spark's Murmur3.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Shared with the oracle: the held-out "benchmark" slice is every
    * 20th document; everything else is the training corpus. */
  private val BenchMod = 20
  private val NgramN = 4

  /** Benchmark n-gram decontamination (GPT-3 appendix C shape): which
    * corpus docs share a word 4-gram with the held-out set, and how
    * many distinct grams leak. */
  val decontaminate: Q = Q(
    "q56_decontaminate",
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g0 AS (SELECT doc_id,
       |              unnest(list_transform(range(1, len(w) - ${NgramN - 2}),
       |                     i -> array_to_string(w[i:i+${NgramN - 1}], ' '))) AS g
       |       FROM tok WHERE len(w) >= $NgramN),
       |bng AS (SELECT DISTINCT g FROM g0 WHERE doc_id % $BenchMod = 0),
       |cng AS (SELECT DISTINCT doc_id, g FROM g0 WHERE doc_id % $BenchMod <> 0)
       |SELECT doc_id, count(*) AS n_hits
       |FROM cng JOIN bng USING (g)
       |GROUP BY doc_id""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    Decontaminate.ngramHits(
      docs.filter(col("doc_id") % BenchMod =!= 0),
      docs.filter(col("doc_id") % BenchMod === 0),
      NgramN)
  }

  /** Deterministic stratified-auditable train/valid/test split: pure
    * function of doc_id via the portable md5 hash — stable under
    * corpus growth, reproducible outside Spark (the oracle IS the
    * reproduction). */
  val hashSplit: Q = Q(
    "q57_hash_split",
    """SELECT doc_id, lang,
      |       CASE WHEN b < 80 THEN 'train'
      |            WHEN b < 90 THEN 'valid'
      |            ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang,
      |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |                  AS BIGINT) % 100 AS b
      |      FROM documents) t""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      Sampling.splitColumn(col("doc_id")).as("split"))
  }

  /** Source weights for the mixture query, in basis points of 1e4;
    * sources not listed sample at the 1000 bp default. */
  private val MixWeights =
    Seq(("src0", 10000L), ("src1", 7500L), ("src2", 5000L), ("src3", 2500L))

  /** Weighted data mixture: re-sample each source toward target rates
    * (broadcast weights dim, membership a pure function of doc_id,
    * salted independently of the q57 split hash). */
  val mixtureSample: Q = Q(
    "q58_mixture_sample",
    """WITH w(source, w_bp) AS (VALUES ('src0', 10000), ('src1', 7500),
      |                                ('src2', 5000), ('src3', 2500)),
      |d AS (SELECT doc_id, source,
      |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)
      |                  AS BIGINT) % 10000 AS b
      |      FROM documents)
      |SELECT doc_id, source FROM d LEFT JOIN w USING (source)
      |WHERE b < coalesce(w_bp, 1000)""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    Sampling.mixtureSample(
      t(s, dir, "documents").select("doc_id", "source"),
      MixWeights.toDF("source", "w_bp"),
      "source", col("doc_id"))
      .select("doc_id", "source")
  }

  /** Token-budget shard packing in doc_id order: 2000-token shards via
    * the distributed prefix sum (a single-task global window in naive
    * SQL — the oracle's form — but two lightweight passes here). */
  val shardPack: Q = Q(
    "q59_shard_pack",
    """WITH d AS (SELECT doc_id,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |           FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |             CAST(sum(n_tok) OVER (ORDER BY doc_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                  AS BIGINT) AS cum_tok
      |      FROM d)
      |SELECT doc_id, n_tok, cum_tok, (cum_tok - n_tok) // 2000 AS shard
      |FROM c""".stripMargin
  ) { (s, dir) =>
    Sharding.packByBudget(
      t(s, dir, "documents")
        .select(col("doc_id"), size(T.words(col("text"))).cast(LongType).as("n_tok")),
      Seq(col("doc_id")), "n_tok", budget = 2000L)
      .select("doc_id", "n_tok", "cum_tok", "shard")
  }

  /** Per-domain quota: the 5 longest documents of each source (score
    * desc, doc_id asc), on the bounded heap aggregate — k rows per
    * group per task cross the wire, not the group. */
  val domainQuota: Q = Q(
    "q60_domain_quota",
    """SELECT source, doc_id, score, rn FROM (
      |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS score,
      |         CAST(row_number() OVER (PARTITION BY source
      |              ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rn
      |  FROM documents) t
      |WHERE rn <= 5""".stripMargin
  ) { (s, dir) =>
    Sampling.quotaPerGroup(
      t(s, dir, "documents"),
      Seq("source"), col("n_chars").cast("double"), col("doc_id"), k = 5)
      .select(col("source"), col("id").as("doc_id"),
        col("score").cast(LongType).as("score"), col("rn"))
  }

  /** The full assembly line as ONE composed plan — quality gate →
    * exact dedup (keep-first) → benchmark decontamination → train
    * split → weighted mixture → token-budget shard packing. Every
    * stage is deterministic, so the whole pipeline oracles end-to-end:
    * what a reference user's production corpus job actually runs, not
    * just its stages in isolation. Catalyst sees one tree: the scan is
    * shared, filters push down through the composition, and the only
    * materialization is the prefix-sum's range exchange at the very
    * end. */
  val corpusPipeline: Q = Q(
    "q62_corpus_pipeline",
    s"""WITH base AS (SELECT doc_id, source, text, string_split(text, ' ') AS w
       |              FROM documents),
       |corpus AS (SELECT doc_id, source, text, w, CAST(len(w) AS BIGINT) AS n_tok
       |           FROM base WHERE doc_id % $BenchMod <> 0 AND len(w) >= 10),
       |kept AS (SELECT * FROM (
       |    SELECT *, md5(trim(regexp_replace(regexp_replace(lower(text),
       |             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS f
       |    FROM corpus) t
       |  QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1),
       |bg AS (SELECT DISTINCT g FROM (
       |    SELECT unnest(list_transform(range(1, len(w) - ${NgramN - 2}),
       |           i -> array_to_string(w[i:i+${NgramN - 1}], ' '))) AS g
       |    FROM base WHERE doc_id % $BenchMod = 0 AND len(w) >= $NgramN) t),
       |kg AS (SELECT DISTINCT doc_id, g FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) - ${NgramN - 2}),
       |           i -> array_to_string(w[i:i+${NgramN - 1}], ' '))) AS g
       |    FROM kept WHERE len(w) >= $NgramN) t),
       |contaminated AS (SELECT DISTINCT doc_id FROM kg JOIN bg USING (g)),
       |cleaned AS (SELECT * FROM kept
       |            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |train AS (SELECT * FROM cleaned
       |          WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
       |                AS BIGINT) % 100 < 80),
       |wts(source, w_bp) AS (VALUES ('src0', 10000), ('src1', 7500),
       |                             ('src2', 5000), ('src3', 2500)),
       |mixed AS (SELECT doc_id, source, n_tok FROM train LEFT JOIN wts USING (source)
       |          WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)
       |                AS BIGINT) % 10000 < coalesce(w_bp, 1000)),
       |packed AS (SELECT doc_id, source, n_tok,
       |            CAST(sum(n_tok) OVER (ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |                 AS BIGINT) AS cum_tok
       |           FROM mixed)
       |SELECT doc_id, source, n_tok, cum_tok, (cum_tok - n_tok) // 2000 AS shard
       |FROM packed""".stripMargin
  ) { (s, dir) =>
    Sharding.packByBudget(corpusMixed(s, dir), Seq(col("doc_id")), "n_tok",
      budget = 2000L)
      .select("doc_id", "source", "n_tok", "cum_tok", "shard")
  }

  /** q62's declarative prefix (everything before the prefix-sum's RDD
    * boundary): one Catalyst tree from scan to mixture, exposed so
    * PlanSpec can assert its shape (the packByBudget tail plans as a
    * scan of the eagerly-built RDD and hides this subtree). */
  private[graft] def corpusMixed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % BenchMod === 0)
    val corpus = docs.filter(col("doc_id") % BenchMod =!= 0)
      .withColumn("n_tok", size(T.words(col("text"))).cast(LongType))
      .filter(col("n_tok") >= 10)
    // exact dedup, keep-first by doc_id (min_by: no per-group window)
    val kept = corpus
      .withColumn("f", T.fingerprint(col("text")))
      .groupBy("f")
      .agg(min_by(struct(col("doc_id"), col("source"), col("text"),
        col("n_tok")), col("doc_id")).as("r"))
      .select(col("r.*"))
    val contaminated = Decontaminate.ngramHits(kept, bench, NgramN)
      .select("doc_id")
    val train = kept.join(contaminated, Seq("doc_id"), "left_anti")
      .filter(Sampling.splitColumn(col("doc_id")) === "train")
    Sampling.mixtureSample(
      train.select("doc_id", "source", "n_tok"),
      MixWeights.toDF("source", "w_bp"), "source", col("doc_id"))
  }

  /** Deterministic uniform sample of 20 docs per source — the
    * stratified-subsampling stage (e.g. an eval slice per domain), as
    * a reservoir ranked by the salted portable hash. Same bounded-heap
    * aggregate as q60; the hash ordering is reproduced verbatim by the
    * oracle's window. */
  val groupSample: Q = Q(
    "q70_group_sample",
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |         CAST(row_number() OVER (PARTITION BY source ORDER BY
      |              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':samp'), 1, 8)
      |                   AS BIGINT) ASC, doc_id ASC) AS BIGINT) AS rn
      |  FROM documents) t
      |WHERE rn <= 20""".stripMargin
  ) { (s, dir) =>
    graft.operators.Sampling.uniformPerGroup(
      t(s, dir, "documents"), Seq("source"), col("doc_id"), k = 20)
      .select(col("source"), col("id").as("doc_id"), col("rn"))
  }

  /** Token-granularity sequence packing: the corpus as one token
    * stream cut into 512-token training sequences, documents split
    * across boundaries — one row per (sequence, document) overlap with
    * the offset and token count a sequence writer consumes. */
  val seqPack: Q = Q(
    "q71_seq_pack",
    """WITH d AS (SELECT doc_id,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |           FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |             CAST(sum(n_tok) OVER (ORDER BY doc_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                  AS BIGINT) AS cum_tok
      |      FROM d WHERE n_tok > 0),
      |e AS (SELECT doc_id, n_tok, cum_tok,
      |             unnest(range((cum_tok - n_tok) // 512, (cum_tok - 1) // 512 + 1)) AS seq_id
      |      FROM c)
      |SELECT doc_id, n_tok, cum_tok, seq_id,
      |       greatest(cum_tok - n_tok, seq_id * 512) - seq_id * 512 AS "offset",
      |       least(cum_tok, (seq_id + 1) * 512)
      |         - greatest(cum_tok - n_tok, seq_id * 512) AS n_tok_in_seq
      |FROM e""".stripMargin
  ) { (s, dir) =>
    Sharding.packSequences(
      t(s, dir, "documents")
        .select(col("doc_id"), size(T.words(col("text"))).cast(LongType).as("n_tok")),
      Seq(col("doc_id")), "n_tok", seqLen = 512L)
      .select("doc_id", "n_tok", "cum_tok", "seq_id", "offset", "n_tok_in_seq")
  }

  /** PII-shape scrubbing over the event payloads: numeric runs in the
    * JSON props replaced by a token, with per-row match counts — the
    * redaction stage of a cleaning pipeline, on the regex subset
    * common to Java and RE2 so the rewrite reproduces identically in
    * any engine. Pure projection; the scan never shuffles. */
  val redact: Q = Q(
    "q72_redact",
    """SELECT event_id,
      |       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
      |       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted
      |FROM events""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .select(col("event_id"),
        T.redact(col("props"), "[0-9]+", "<NUM>").as("r"))
      .select(col("event_id"), col("r.redacted").as("props_redacted"),
        col("r.n_redacted").as("n_redacted"))
  }

  /** Vocabulary heavy hitters: the 20 most frequent corpus tokens
    * (count desc, term asc) — the vocab-building / stop-list step.
    * Counts combine map-side; the global top-k plans as
    * TakeOrderedAndProject (per-partition heaps merged on the driver),
    * never a single-task global sort or window. */
  val vocabTop: Q = Q(
    "q73_vocab_top",
    """SELECT term, cnt FROM (
      |  SELECT term, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
      |  GROUP BY term
      |  ORDER BY cnt DESC, term ASC LIMIT 20) s""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(explode(T.words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(20)
  }

  /** q224: count-min-sketch HEAVY HITTERS — q73's exact top-20 probed
    * against a one-pass mergeable CMS (ε=0.0005, 99%, seed 42), the
    * shuffle-free frequency path for 100 TB token streams (see
    * [[graft.operators.Sketches]]). Output exposes the sketch error
    * per term: over_n = estimate − truth is ≥ 0 by construction and
    * ≤ ε·N at the sketch's confidence. rows-only (DuckDB cannot
    * replay Spark's CMS hash family); exact twin = q73 (identical
    * term set and true counts), and SketchSpec pins the CMS
    * guarantees including merge-of-halves == whole-corpus-sketch. */
  val cmsHeavyHitters: Q = Q.rowsOnly("q224_cms_heavy_hitters") { (s, dir) =>
    graft.operators.Sketches.cmsVsExactTopK(s, t(s, dir, "documents"),
      k = 20, eps = 0.0005, confidence = 0.99, seed = 42)
  }

  /** q225: FREQUENT TERMS above a relative threshold via the
    * Misra-Gries candidate-then-recount pipeline — every term holding
    * > 1/(k+1) of the corpus token mass (k=199 → 0.5%), computed
    * without shuffling the full token table (see
    * [[graft.operators.Sketches.frequentTerms]]'s guarantee chain).
    * The oracle states the SEMANTICS (full groupBy + threshold
    * filter); the engine plan prunes to ≤ k·partitions candidates
    * before its only exchange — identical relation, which is the
    * point: the sketch pass is a pure optimization, not an
    * approximation, once the exact recount filter runs. */
  val frequentTerms: Q = Q(
    "q225_frequent_terms",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
      |             FROM documents),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
      |g AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
      |      FROM tok GROUP BY term)
      |SELECT term, cnt, CAST((1000000 * cnt) // n.n AS BIGINT) AS share_ppm
      |FROM g CROSS JOIN n WHERE cnt * 200 > n.n""".stripMargin
  ) { (s, dir) =>
    graft.operators.Sketches.frequentTerms(
      t(s, dir, "documents")
        .select(explode(T.words(col("text"))).as("term")),
      "term", k = 199)
  }

  /** The round-5 assembly line as ONE composed plan — chunk-level
    * dedup with reassembly → self-trained bigram-LM quality gate
    * (drop avg_nll > 3.45, i.e. the least-plausible tail) → train
    * split → token-granularity 512-token sequence packing. The v2
    * counterpart of q62: that pipeline gates and packs whole
    * documents; this one REWRITES them (dedup reassembly) and scores
    * the rewritten text with a model trained on the pipeline's own
    * survivor corpus — every stage still deterministic, so the whole
    * chain oracles end-to-end. One Catalyst tree up to the prefix
    * sum's range exchange; the LM's count-rejoin keys on bigrams and
    * the quality join on doc_id. */
  val corpusPipelineV2: Q = Q(
    "q74_corpus_pipeline_v2",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |           WHERE len(string_split(text, ' ')) >= 1),
      |c AS (SELECT doc_id, i AS chunk_idx, array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
      |      FROM w, unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS t(i)),
      |win AS (SELECT chunk, doc_id AS wd, chunk_idx AS wi FROM (
      |          SELECT chunk, doc_id, chunk_idx,
      |                 row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
      |          FROM c) t WHERE rn = 1),
      |f AS (SELECT c.doc_id, c.chunk_idx, c.chunk,
      |             (c.doc_id = win.wd AND c.chunk_idx = win.wi) AS is_kept
      |      FROM c JOIN win USING (chunk)),
      |dd AS (SELECT doc_id, count(*) AS total_chunks,
      |              CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
      |              coalesce(array_to_string(list_transform(
      |                list_sort(list(struct_pack(chunk_idx := chunk_idx, chunk := chunk))
      |                          FILTER (WHERE is_kept)),
      |                x -> x.chunk), ' '), '') AS dedup_text
      |       FROM f GROUP BY doc_id),
      |kept AS (SELECT doc_id, dedup_text, string_split(dedup_text, ' ') AS ws2
      |         FROM dd WHERE kept_chunks * 2 >= total_chunks AND dedup_text <> ''),
      |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
      |         SELECT doc_id, unnest(list_transform(range(1, len(ws2)),
      |                i -> struct_pack(w1 := ws2[i], w2 := ws2[i+1]))) AS b
      |         FROM kept WHERE len(ws2) >= 2) t),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT term) AS v FROM (SELECT unnest(ws2) AS term FROM kept) t),
      |m AS (SELECT w1, w2,
      |        CAST(round(-ln(CAST(c2 + 1 AS DOUBLE) / (c1 + v)) * 1000000.0) AS BIGINT) AS nll_q
      |      FROM c2 JOIN c1 USING (w1) CROSS JOIN v),
      |scored AS (SELECT doc_id,
      |                  CAST(sum(nll_q) AS DOUBLE) / count(*) / 1000000.0 AS avg_nll
      |           FROM bg JOIN m USING (w1, w2) GROUP BY doc_id),
      |quality AS (SELECT s.doc_id, k.ws2 FROM scored s JOIN kept k USING (doc_id)
      |            WHERE s.avg_nll <= 3.45),
      |train AS (SELECT doc_id, CAST(len(ws2) AS BIGINT) AS n_tok FROM quality
      |          WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |                AS BIGINT) % 100 < 80),
      |cum AS (SELECT doc_id, n_tok,
      |             CAST(sum(n_tok) OVER (ORDER BY doc_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                  AS BIGINT) AS cum_tok
      |        FROM train WHERE n_tok > 0),
      |e AS (SELECT doc_id, n_tok, cum_tok,
      |             unnest(range((cum_tok - n_tok) // 512, (cum_tok - 1) // 512 + 1)) AS seq_id
      |      FROM cum)
      |SELECT doc_id, n_tok, cum_tok, seq_id,
      |       greatest(cum_tok - n_tok, seq_id * 512) - seq_id * 512 AS "offset",
      |       least(cum_tok, (seq_id + 1) * 512)
      |         - greatest(cum_tok - n_tok, seq_id * 512) AS n_tok_in_seq
      |FROM e""".stripMargin
  ) { (s, dir) =>
    Sharding.packSequences(corpusV2Train(s, dir).select("doc_id", "n_tok"),
      Seq(col("doc_id")), "n_tok", seqLen = 512L)
      .select("doc_id", "n_tok", "cum_tok", "seq_id", "offset", "n_tok_in_seq")
  }

  /** q74's declarative prefix (everything before the prefix-sum's RDD
    * boundary), exposed like q62's [[corpusMixed]] so PlanSpec can
    * assert its shape (the packSequences tail plans as a scan of the
    * eagerly-built RDD and hides this subtree). */
  private[graft] def corpusV2Train(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, LangModel}
    // pin the dedup survivors: the LM leg scans them four times
    // internally (bigram counts, history counts, vocab, score rejoin)
    // and the quality join scans them again — unpinned, the whole
    // chunk-dedup subtree re-executed per scan (r14 optimization,
    // measured ~2x on q74). Doc-grain rows only; the token-grain
    // explodes stay unpinned (the scale-safe side of the trade).
    val kept = Dedup.chunkDedup(t(s, dir, "documents"), "text", "doc_id")
      .filter(col("kept_chunks") * 2 >= col("total_chunks") &&
        length(col("dedup_text")) > 0)
      .withColumn("n_tok", size(T.words(col("dedup_text"))).cast(LongType))
      .localCheckpoint(true)
    val qualityIds = LangModel
      .bigramNll(kept.select(col("doc_id"), col("dedup_text").as("text")))
      .filter(col("avg_nll") <= 3.45)
      .select("doc_id")
    kept.join(qualityIds, "doc_id")
      .filter(Sampling.splitColumn(col("doc_id")) === "train")
  }

  /** q188: contamination SPANS — q56 says WHICH documents leak
    * benchmark 4-grams and how many; this says WHERE and HOW MUCH
    * text: every hit position's gram covers tokens [p, p+3], and
    * overlapping/adjacent covers merge into maximal spans via
    * gaps-and-islands (new island when p exceeds the running max end —
    * a doc-partitioned running-max window, per-key sort only). The
    * span view is what surgical decontamination needs: excise the
    * contaminated spans instead of dropping whole documents. Same
    * BenchMod/NgramN contract as q56. */
  val contaminationSpans: Q = Q(
    "q188_contamination_spans",
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g0 AS (SELECT doc_id, unnest(range(1, len(w) - ${NgramN - 2})) AS p1, w
       |       FROM tok WHERE len(w) >= $NgramN),
       |g AS (SELECT doc_id, p1 - 1 AS p,
       |             array_to_string(w[p1:p1+${NgramN - 1}], ' ') AS g
       |      FROM g0),
       |bng AS (SELECT DISTINCT g FROM g WHERE doc_id % $BenchMod = 0),
       |hits AS (SELECT g.doc_id, g.p FROM g JOIN bng USING (g)
       |         WHERE g.doc_id % $BenchMod <> 0),
       |isl AS (SELECT doc_id, p,
       |          CASE WHEN max(p) OVER (PARTITION BY doc_id ORDER BY p
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |                 IS NULL
       |            OR p > max(p) OVER (PARTITION BY doc_id ORDER BY p
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |                 + $NgramN
       |          THEN 1 ELSE 0 END AS ni
       |        FROM hits),
       |isl2 AS (SELECT doc_id, p,
       |           CAST(sum(ni) OVER (PARTITION BY doc_id ORDER BY p)
       |                AS BIGINT) AS island
       |         FROM isl),
       |sp AS (SELECT doc_id, island, min(p) AS s, max(p) + ${NgramN - 1} AS e
       |       FROM isl2 GROUP BY 1, 2)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |       CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens
       |FROM sp GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val grams = docs
      .select(col("doc_id"), T.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= NgramN)
      .select(col("doc_id"), posexplode(
        Decontaminate.wordNgrams(col("ws"), NgramN)).as(Seq("p", "g")))
    val bench = grams.filter(col("doc_id") % BenchMod === 0)
      .select("g").distinct()
    val hits = grams.filter(col("doc_id") % BenchMod =!= 0)
      .join(broadcast(bench), Seq("g"), "left_semi")
      .select("doc_id", "p")
    val wPrev = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("p")
    val spans = hits
      .withColumn("pm", max(col("p")).over(wPrev))
      // merge OVERLAPPING (p <= pm + 3) and ADJACENT (p = pm + 4)
      // covers: a new island only opens past a genuine gap
      .withColumn("ni",
        when(col("pm").isNull || col("p") > col("pm") + lit(NgramN), 1)
          .otherwise(0))
      .withColumn("island", sum(col("ni")).over(wRun))
      .groupBy("doc_id", "island")
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(NgramN - 1)).as("e"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + lit(1)).as("covered_tokens"))
  }

  /** q189: template-duplication profile — documents that are the SAME
    * text modulo numbers (timestamps, ids, counters): normalize
    * (lowercase, digit runs → '0', whitespace collapsed), md5 the
    * template, and report the GROUP-SIZE HISTOGRAM (how many templates
    * have 1, 2, … members). Catches the boilerplate class exact dedup
    * (q11) misses — machine-generated pages differing only in serial
    * numbers — with one corpus scan + two digest-keyed counts; the
    * histogram form stays meaningful on corpora with few or no
    * template dups (every row still asserts the group structure),
    * where a "groups ≥ 2 only" listing would be empty. */
  val templateDedup: Q = Q(
    "q189_template_dedup",
    """WITH t AS (SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
      |             '[0-9]+', '0', 'g'), ' +', ' ', 'g'))) AS tpl
      |           FROM documents),
      |g AS (SELECT tpl, CAST(count(*) AS BIGINT) AS group_size
      |      FROM t GROUP BY 1)
      |SELECT group_size, CAST(count(*) AS BIGINT) AS n_templates
      |FROM g GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(md5(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[0-9]+", "0"), " +", " "))).as("tpl"))
      .groupBy("tpl").agg(count(lit(1)).as("group_size"))
      .groupBy("group_size").agg(count(lit(1)).as("n_templates"))
  }

  /** q258: WEIGHTED SAMPLE WITHOUT REPLACEMENT (Efraimidis-Spirakis
    * A-ES) — the principled "sample 100 docs proportional to length"
    * primitive behind mixture construction: each row draws a
    * deterministic uniform u from the portable md5 hash (the q57
    * machinery, 48 bits → an EXACT dyadic rational in (0, 1]) and
    * ranks by ln(u)/w (monotone in the classic u^(1/w) key, w =
    * n_chars); the global top-k by key IS the weighted sample. One
    * distributed TakeOrdered, no shuffle of the corpus, no window.
    *
    * Determinism across engines: the key micro-quantizes to u6 BEFORE
    * the ranking (a 10⁻⁶ quantum is ~10 orders above cross-libm ln()
    * ulp divergence) and ties break on doc_id, so both engines select
    * the IDENTICAL 100 rows — the boundary of an unquantized
    * double-keyed top-k would be one ulp flip away from a different
    * sample. */
  val weightedSample: Q = Q(
    "q258_weighted_sample",
    """WITH w AS (
      |  SELECT doc_id, n_chars,
      |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |              AS BIGINT) + 1 AS u48
      |  FROM documents),
      |k AS (SELECT doc_id, n_chars,
      |        CAST(round(1000000.0
      |          * ln(CAST(u48 AS DOUBLE) / 281474976710656.0)
      |          / n_chars) AS BIGINT) AS key_u6
      |      FROM w)
      |SELECT doc_id, n_chars, key_u6 FROM k
      |ORDER BY key_u6 DESC, doc_id LIMIT 100""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast(LongType) + 1).as("u48"))
      .select(col("doc_id"), col("n_chars"),
        round(lit(1000000.0)
          * log(col("u48").cast("double") / lit(281474976710656.0))
          / col("n_chars")).cast(LongType).as("key_u6"))
      .orderBy(col("key_u6").desc, col("doc_id"))
      .limit(100)
  }

  /** q264: NEGATIVE-SAMPLING TABLE — the word2vec/unigram-LM sampling
    * structure: the top-1000 vocabulary by the deterministic
    * (cnt DESC, term) order, each term weighted cnt^0.75 (the
    * smoothing exponent that lifts the tail), laid out as EXACT
    * cumulative integer ranges [cum_lo, cum_hi) so a sampler draws a
    * uniform integer below the final cum_hi and binary-searches its
    * term — the alias-table alternative that stays a relation.
    *
    * Exactness: cnt^0.75 is written exp(0.75·ln(cnt)) with the SAME
    * expression shape on both engines and milli-quantized (round to
    * 10⁻³) — the result magnitude is ≤ ~10⁴ so the cross-libm
    * divergence (~1 ulp of exp ≈ 10⁻¹²) sits ~9 orders below the
    * rounding quantum; the cumulative ranges are then BIGINT sums of
    * exact integers, computed by the native multi-column `RunningSum`
    * (one range exchange, never a partition-less window — at full
    * vocabulary scale this is the same plan, over however many
    * buckets the range partitioner picks). */
  val negSampleTable: Q = Q(
    "q264_negative_sampling",
    """WITH tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term
      |        FROM documents) t
      |  GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 1000),
      |k AS (SELECT term, cnt,
      |        CAST(round(1000 * exp(0.75 * ln(cnt))) AS BIGINT) AS w_m
      |      FROM tc)
      |SELECT term, cnt, w_m,
      |       CAST(sum(w_m) OVER (ORDER BY cnt DESC, term ASC)
      |         AS BIGINT) - w_m AS cum_lo,
      |       CAST(sum(w_m) OVER (ORDER BY cnt DESC, term ASC)
      |         AS BIGINT) AS cum_hi
      |FROM k""".stripMargin
  ) { (s, dir) =>
    val tc = t(s, dir, "documents")
      .select(explode(T.words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(1000)
      .select(col("term"), col("cnt"),
        expr("CAST(round(1000 * exp(0.75 * ln(cnt))) AS BIGINT)").as("w_m"))
    graft.operators.Ranks.globalRunningSums(tc,
      Seq(col("cnt").desc, col("term").asc), Seq(col("w_m") -> "cum_hi"))
      .select(col("term"), col("cnt"), col("w_m"),
        (col("cum_hi") - col("w_m")).as("cum_lo"), col("cum_hi"))
  }

  /** q269: MULTINOMIAL DRAWS through q264's sampling table — the
    * table in action: 1,000 deterministic 48-bit uniforms (the q57
    * portable-md5 machinery, salted ':draw') reduce modulo the table's
    * total mass and probe the half-open cumulative ranges
    * (cum_lo, cum_hi], so draw frequencies approximate each term's
    * w/Σw share. Everything is exact integers — the modulo bias is
    * ≤ Σw/2⁴⁸ (irrelevant at any real vocabulary mass) and EXACTLY
    * mirrored in the oracle, so the draws are the same 1,000 terms on
    * both engines. Output: drawn terms with observed counts next to
    * the expected ppm share.
    *
    * Scale shape: the draw frame is synthesized at whatever
    * parallelism is asked of it; the probe is a broadcast range join
    * against the kilobyte sampling table (interval containment on a
    * dim — the q31-class broadcast, not a shuffle); a trainer drawing
    * billions of negatives runs this exact plan with a bigger range. */
  val multinomialDraws: Q = Q(
    "q269_multinomial_draws",
    """WITH tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term
      |        FROM documents) t
      |  GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 1000),
      |k AS (SELECT term, cnt,
      |        CAST(round(1000 * exp(0.75 * ln(cnt))) AS BIGINT) AS w_m
      |      FROM tc),
      |cum AS (SELECT term, w_m,
      |          CAST(sum(w_m) OVER (ORDER BY cnt DESC, term ASC)
      |            AS BIGINT) - w_m AS cum_lo,
      |          CAST(sum(w_m) OVER (ORDER BY cnt DESC, term ASC)
      |            AS BIGINT) AS cum_hi
      |        FROM k),
      |tot AS (SELECT max(cum_hi) AS t FROM cum),
      |u AS (SELECT (CAST('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':draw'),
      |         1, 12) AS BIGINT) % tot.t) + 1 AS u, tot.t
      |      FROM generate_series(1, 1000) g(i) CROSS JOIN tot)
      |SELECT c.term, CAST(count(*) AS BIGINT) AS n_drawn,
      |       1000000 * c.w_m // u.t AS expected_u6
      |FROM u JOIN cum c ON u.u > c.cum_lo AND u.u <= c.cum_hi
      |GROUP BY 1, 3""".stripMargin
  ) { (s, dir) =>
    val tab = negSampleTable.fn(s, dir)
    val tot = tab.agg(max(col("cum_hi")).as("t"))
    val draws = s.range(1, 1001).toDF("i")
      .select(conv(substring(md5(concat(col("i").cast("string"),
        lit(":draw"))), 1, 12), 16, 10).cast(LongType).as("h"))
      .crossJoin(broadcast(tot))
      .select(expr("h % t + 1").as("u"), col("t"))
    draws
      .join(broadcast(tab),
        col("u") > col("cum_lo") && col("u") <= col("cum_hi"))
      .groupBy(col("term"), expr("1000000 * w_m div t").as("expected_u6"))
      .agg(count(lit(1)).as("n_drawn"))
      .select(col("term"), col("n_drawn"), col("expected_u6"))
  }

  val all: Seq[Q] =
    Seq(decontaminate, hashSplit, mixtureSample, shardPack, domainQuota,
      corpusPipeline, groupSample, seqPack, redact, vocabTop, corpusPipelineV2,
      contaminationSpans, templateDedup, cmsHeavyHitters, frequentTerms,
      weightedSample, negSampleTable, multinomialDraws)
}
