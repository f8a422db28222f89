package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-6 surface extensions, each fully oracled: character-level
  * fuzzy dedup (the edit-distance complement to the token-set
  * families), a grouping-sets corpus composition report (the CUBE the
  * reference never needed but §2.4 lists as free in Catalyst), token-
  * budget truncation (the sequence-budget cousin of q71's packing),
  * and an event funnel (first-touch conversion — the analytics shape
  * the events table exists for). */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Edit-distance near-dup pairs: 24-char prefix blocks (equi-join,
    * df-capped) + exact levenshtein verify. Character-level dedup —
    * catches OCR/encoding damage the shingle families class as
    * dissimilar. Oracled end-to-end: DuckDB ships the same
    * levenshtein. */
  val editDedup: Q = Q(
    "q78_edit_dedup",
    """WITH b AS (SELECT doc_id, text, substring(text, 1, 24) AS blk
      |           FROM documents),
      |k AS (SELECT * FROM b WHERE blk IN
      |        (SELECT blk FROM b GROUP BY blk HAVING count(*) <= 100))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
      |FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.text, b.text) <= 16""".stripMargin
  ) { (s, dir) =>
    graft.operators.Dedup.editDistancePairs(
      t(s, dir, "documents"), "text", "doc_id",
      prefixLen = 24, maxEd = 16, maxDf = 100)
  }

  /** Corpus composition CUBE over (lang, source): every grouping-set
    * margin in one pass — the partial-agg-friendly form of the
    * reference's hand-built per-dimension reports (§2.4 lists
    * cube/grouping sets as the free Catalyst upgrade; q15's rollup
    * covers the hierarchy case, this covers the full lattice). */
  val corpusCube: Q = Q(
    "q79_corpus_cube",
    """SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY CUBE (lang, source)""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** Token-budget truncation: keep each document's first 64 whitespace
    * tokens (the sequence-budget gate in front of a trainer; q71 packs
    * to the budget, this clips to it). Pure projection — no shuffle. */
  val tokenTruncate: Q = Q(
    "q80_token_truncate",
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |       array_to_string(string_split(text, ' ')[1:64], ' ') AS kept_text,
      |       CAST(CASE WHEN len(string_split(text, ' ')) > 64
      |                 THEN 1 ELSE 0 END AS BIGINT) AS was_truncated
      |FROM documents""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    t(s, dir, "documents").select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      array_join(slice(toks, 1, 64), " ").as("kept_text"),
      when(size(toks) > 64, 1L).otherwise(0L).as("was_truncated"))
  }

  /** First-touch conversion funnel: per user, the first `view` and the
    * first `purchase` strictly after it. Two partial aggregations and
    * one equi-join on user_id — at scale AQE broadcasts the first-view
    * side when it fits, shuffles otherwise; no window over raw
    * events. */
  val funnel: Q = Q(
    "q81_funnel",
    """WITH v AS (SELECT user_id, min(epoch_ms(ts)) AS first_view_ms
      |           FROM events WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT user_id, epoch_ms(ts) AS ts_ms
      |      FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, v.first_view_ms,
      |       min(p.ts_ms) AS first_purchase_ms,
      |       min(p.ts_ms) - v.first_view_ms AS lag_ms,
      |       CAST(CASE WHEN min(p.ts_ms) IS NOT NULL THEN 1 ELSE 0 END
      |            AS BIGINT) AS converted
      |FROM v LEFT JOIN p ON p.user_id = v.user_id
      |                  AND p.ts_ms > v.first_view_ms
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"),
      expr("ts_ns div 1000000").as("ts_ms"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_ms")).as("first_view_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ms"))
    views
      .join(purchases,
        col("p_user") === col("user_id") && col("ts_ms") > col("first_view_ms"),
        "left")
      .groupBy("user_id", "first_view_ms")
      .agg(min(col("ts_ms")).as("first_purchase_ms"))
      .select(col("user_id"), col("first_view_ms"), col("first_purchase_ms"),
        (col("first_purchase_ms") - col("first_view_ms")).as("lag_ms"),
        when(col("first_purchase_ms").isNotNull, 1L).otherwise(0L)
          .as("converted"))
  }

  /** Bigram collocations by LIFT (the log-free core of PMI — log is
    * monotone, so lift ranks identically while staying exact rational
    * math, sidestepping cross-engine libm divergence entirely):
    * lift(w1,w2) = P(w1,w2) / (P(w1)·P(w2)) = n_pair·N² / (B·c1·c2),
    * quantized ×10⁴ with an identical left-associated double chain on
    * both engines. Count-then-rejoin plan: bigram/unigram types move
    * through combiner-compressed aggregations; totals ride a broadcast
    * one-row frame. */
  val collocations: Q = Q(
    "q82_collocations",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(ws)), i ->
      |        struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
      |      FROM w WHERE len(ws) >= 2),
      |bg2 AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b),
      |c2 AS (SELECT w1, w2, count(*) AS n_pair FROM bg2 GROUP BY 1, 2
      |       HAVING count(*) >= 5),
      |u AS (SELECT unnest(ws) AS w FROM w),
      |c1 AS (SELECT w, count(*) AS c1 FROM u GROUP BY 1),
      |tot AS (SELECT (SELECT count(*) FROM u) AS n,
      |               (SELECT count(*) FROM bg2) AS b)
      |SELECT c2.w1, c2.w2, c2.n_pair,
      |       CAST(round(CAST(c2.n_pair AS DOUBLE) * tot.n * tot.n * 10000
      |                  / (CAST(tot.b AS DOUBLE) * a.c1 * bb.c1))
      |            AS BIGINT) AS lift_q
      |FROM c2 CROSS JOIN tot
      |JOIN c1 a ON a.w = c2.w1
      |JOIN c1 bb ON bb.w = c2.w2""".stripMargin
  ) { (s, dir) =>
    val ws = t(s, dir, "documents").select(split(col("text"), " ").as("ws"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), " +
          "(w, i) -> struct(w AS w1, element_at(ws, i + 2) AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = ws.select(explode(col("ws")).as("w"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
    val c1 = uni.groupBy("w").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(bg.agg(count(lit(1)).as("b"))))
    c2.crossJoin(broadcast(tot))
      .join(c1.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(c1.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .select(col("w1"), col("w2"), col("n_pair"),
        round(col("n_pair").cast("double") * col("n") * col("n") * lit(10000.0)
          / (col("b").cast("double") * col("c1a") * col("c1b")))
          .cast("long").as("lift_q"))
  }

  /** Sub-document containment dedup: documents appearing verbatim
    * (token-aligned) inside another. The oracle is ALL-PAIRS ground
    * truth — candidate generation via shared winnowing fingerprints is
    * provably complete for ≥ w+n−1-token inner docs (the SIGMOD'03
    * guarantee), so the bucket-join engine path must reproduce the
    * exhaustive answer exactly. */
  val containment: Q = Q(
    "q83_containment",
    """WITH d AS (SELECT doc_id, text FROM documents),
      |i AS (SELECT * FROM d WHERE len(string_split(text, ' ')) >= 10)
      |SELECT i.doc_id AS inner_id, o.doc_id AS outer_id,
      |       CAST(length(i.text) AS BIGINT) AS inner_len,
      |       CAST(length(o.text) AS BIGINT) AS outer_len
      |FROM i JOIN d o ON i.doc_id <> o.doc_id
      |  AND (length(i.text) < length(o.text)
      |       OR (length(i.text) = length(o.text) AND i.doc_id < o.doc_id))
      |  AND contains(' ' || o.text || ' ', ' ' || i.text || ' ')""".stripMargin
  ) { (s, dir) =>
    graft.operators.Dedup.containmentPairs(
      t(s, dir, "documents"), "text", "doc_id")
  }

  /** Duplication-rate report by source: the resolution pass (q44's
    * connected components) rolled up to the per-source dup share — the
    * corpus-curation dashboard number. Oracled end-to-end through the
    * same recursive-CTE closure as q44. */
  val dupRateBySource: Q = Q(
    "q84_dup_rate_by_source",
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      |       FROM w WHERE len(ws) >= 3),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jp AS (SELECT doc_a, doc_b FROM pairs
      |       JOIN sizes sa ON doc_a = sa.doc_id
      |       JOIN sizes sb ON doc_b = sb.doc_id
      |       WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |e AS (SELECT doc_a AS a, doc_b AS b FROM jp
      |      UNION SELECT doc_b, doc_a FROM jp),
      |reach AS (
      |  SELECT a AS id, b AS r FROM e
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
      |res AS (SELECT id AS doc_id, least(id, min(r)) AS canonical_id
      |        FROM reach GROUP BY id),
      |agg AS (SELECT d.source, count(*) AS n_docs,
      |               CAST(sum(CASE WHEN res.canonical_id IS NOT NULL
      |                              AND res.canonical_id <> d.doc_id
      |                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
      |        FROM documents d LEFT JOIN res ON res.doc_id = d.doc_id
      |        GROUP BY 1)
      |SELECT source, n_docs, n_dups,
      |       CAST(round(CAST(n_dups AS DOUBLE) * 10000 / n_docs) AS BIGINT)
      |         AS dup_rate_q
      |FROM agg""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val resolved = graft.operators.Dedup.resolve(
      graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.shingleProjection(docs, "text", "doc_id"),
        threshold = 0.5, maxDf = 1000))
    docs.select(col("doc_id"), col("source"))
      .join(resolved, Seq("doc_id"), "left")
      .select(col("source"),
        when(col("canonical_id").isNotNull &&
          col("canonical_id") =!= col("doc_id"), 1L).otherwise(0L).as("is_dup"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dups"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        round(col("n_dups").cast("double") * lit(10000.0) / col("n_docs"))
          .cast("long").as("dup_rate_q"))
  }

  /** Gap-filled daily event series: a generated date spine × the
    * event-type dimension, left-joined to the per-day counts with
    * zeros for silent days — the DENSE time series every charting/
    * anomaly layer wants (J5 turned point-probes into one join; this
    * adds the zero-fill those probes got implicitly). The spine is
    * data-driven (min..max event day), so the query is scale-factor
    * agnostic; spine rows = days × types, never event volume. */
  val gapFilledSeries: Q = Q(
    "q85_gapfill_series",
    """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
      |days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
      |                     AS DATE) AS day FROM b),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |cnt AS (SELECT day, event_type, count(*) AS n FROM ev GROUP BY 1, 2)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, t.event_type,
      |       COALESCE(cnt.n, 0) AS n
      |FROM days d CROSS JOIN types t
      |LEFT JOIN cnt ON cnt.day = d.day AND cnt.event_type = t.event_type""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events")
      .select(col("event_type"),
        to_date(timestamp_millis(expr("ts_ns div 1000000"))).as("day"))
    val days = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val types = ev.select("event_type").distinct()
    val cnt = ev.groupBy("day", "event_type").agg(count(lit(1)).as("cn"))
    days.crossJoin(broadcast(types))
      .join(cnt, Seq("day", "event_type"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), coalesce(col("cn"), lit(0L)).as("n"))
  }

  /** Length-percentile trimming: drop the shortest ~5% and longest ~5%
    * of documents by token count — the distribution-AWARE outlier gate
    * a curation pipeline runs beside q47's fixed-threshold filter
    * (fixed bounds can't adapt to a new corpus mix). The percentile
    * bounds derive from a token-count HISTOGRAM, so the only
    * corpus-sized passes are the count itself and the final
    * broadcast-bounds filter: the cumulative count runs over DISTINCT
    * LENGTHS (bounded by the longest document, not corpus rows) via a
    * broadcast triangular self-join of the histogram — O(L²) work on a
    * model-sized frame, WINDOWLESS, so nothing single-partitions and
    * there is no global sort of documents anywhere. Rank positions use
    * pure integer ceil-division, so the bounds are cross-engine exact
    * by construction — no percentile-interpolation semantics in
    * sight. */
  val lengthTrim: Q = Q(
    "q87_length_trim",
    """WITH m AS (SELECT doc_id, len(string_split(text, ' ')) AS n
      |           FROM documents),
      |h AS (SELECT n, count(*) AS c FROM m GROUP BY 1),
      |cum AS (SELECT n, sum(c) OVER (ORDER BY n) AS cum FROM h),
      |tot AS (SELECT count(*) AS cnt FROM m),
      |b AS (SELECT
      |  (SELECT min(n) FROM cum, tot WHERE cum >= (5 * cnt + 99) // 100) AS lo,
      |  (SELECT min(n) FROM cum, tot WHERE cum >= (95 * cnt + 99) // 100) AS hi)
      |SELECT m.doc_id, m.n AS n_tokens, b.lo, b.hi
      |FROM m, b WHERE m.n BETWEEN b.lo AND b.hi""".stripMargin
  ) { (s, dir) =>
    val m = t(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.words(col("text")))
          .cast("long").as("n"))
    // the histogram feeds three consumers (cumsum both join sides, the
    // total); pin it so the corpus is tokenized exactly twice — once
    // here, once in the final filter — as the scaladoc promises
    val hist = m.groupBy("n").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val cum = hist.as("a")
      .join(broadcast(hist.select(col("n").as("n2"), col("c").as("c2"))),
        col("n2") <= col("a.n"))
      .groupBy(col("a.n").as("n")).agg(sum(col("c2")).as("cum"))
    // bounds: the length at sorted position ceil(p·N) — one tiny agg
    // over (histogram × one-row total); N derives from the pinned
    // histogram, not a third corpus scan
    val bounds = cum.crossJoin(broadcast(hist.agg(sum(col("c")).as("cnt"))))
      .agg(
        min(when(col("cum") >= expr("(5 * cnt + 99) div 100"), col("n")))
          .as("lo"),
        min(when(col("cum") >= expr("(95 * cnt + 99) div 100"), col("n")))
          .as("hi"))
    m.crossJoin(broadcast(bounds))
      .filter(col("n").between(col("lo"), col("hi")))
      .select(col("doc_id"), col("n").as("n_tokens"), col("lo"), col("hi"))
  }

  /** Per-document out-of-vocabulary rate against the corpus top-10
    * vocabulary — the coverage score a tokenizer/vocab-budget planner
    * reads before committing a vocab (CCNet-style corpus triage). The
    * vocab is a bounded top-k over token counts (count desc, token asc
    * — deterministic ties), broadcast into an in/out marker join; the
    * per-doc pass is one explode + map-side-combining groupBy. The
    * oov_rate double is a SINGLE division of two exact integers, so
    * both engines produce the identical nearest double. */
  val oovRate: Q = Q(
    "q88_oov_rate",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM w GROUP BY 1
      |                       ORDER BY c DESC, tok LIMIT 10) rk)
      |SELECT doc_id, count(*) AS n_tokens,
      |       count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM v)) AS n_oov,
      |       CAST(count(*) FILTER (WHERE tok NOT IN (SELECT tok FROM v))
      |            AS DOUBLE) / count(*) AS oov_rate
      |FROM w GROUP BY doc_id""".stripMargin
  ) { (s, dir) =>
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(10) // TakeOrdered: bounded
      .select(col("tok"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_v").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Cross-split leakage audit: near-duplicate pairs whose members
    * landed in DIFFERENT train/valid/test splits — the eval-integrity
    * check every training pipeline must run, because a hash split
    * assigns near-copies independently, so ~2·p·(1−p) of dup pairs
    * straddle a boundary and quietly leak eval content into training.
    * Composes the audited q27 candidate machinery (shared-shingle
    * equi-join, df-capped, exact Jaccard) with q57's portable md5
    * split assignment. Because the split is a PURE FUNCTION of the id,
    * the assignment is projected directly onto the pair endpoints — no
    * corpus-sized join, no extra shuffle; the audit costs exactly what
    * the dedup pass already costs. */
  val splitLeakage: Q = Q(
    "q89_split_leakage",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      |       FROM w WHERE len(ws) >= 3),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jac AS (SELECT doc_a, doc_b,
      |               CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
      |        FROM pairs
      |        JOIN sizes sa ON doc_a = sa.doc_id
      |        JOIN sizes sb ON doc_b = sb.doc_id
      |        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |sp AS (SELECT doc_a, doc_b, jaccard,
      |         CASE WHEN CAST('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)
      |                    AS BIGINT) % 100 < 80 THEN 'train'
      |              WHEN CAST('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)
      |                    AS BIGINT) % 100 < 90 THEN 'valid'
      |              ELSE 'test' END AS split_a,
      |         CASE WHEN CAST('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)
      |                    AS BIGINT) % 100 < 80 THEN 'train'
      |              WHEN CAST('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)
      |                    AS BIGINT) % 100 < 90 THEN 'valid'
      |              ELSE 'test' END AS split_b
      |       FROM jac)
      |SELECT doc_a, doc_b, split_a, split_b, jaccard
      |FROM sp WHERE split_a <> split_b""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Sampling
    val docs = t(s, dir, "documents")
    // BARRIER between the dedup pass and the split predicate: without
    // it Catalyst pushes `split_a <> split_b` down into the shingle
    // self-join condition, evaluating the md5 CASE per candidate
    // shingle row instead of per surviving pair (measured 6.1s vs
    // 2.3s at sf0.1 — the q78 guarded-levenshtein lesson again). The
    // pairs frame is threshold-survivor-sized, so pinning it is free.
    val pairs = graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.shingleProjection(docs, "text", "doc_id"),
        threshold = 0.5, maxDf = 1000)
      .localCheckpoint(eager = true)
    pairs
      .withColumn("split_a", Sampling.splitColumn(col("doc_a")))
      .withColumn("split_b", Sampling.splitColumn(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jaccard"))
  }

  /** LM-quality selection per source: score every document with the
    * self-trained add-one bigram LM (q66's machinery — per-bigram NLLs
    * quantized to integers, so sums are exact and order-independent)
    * and keep each source's k LEAST-perplexed documents — the
    * CCNet-style "train a cheap LM, keep what it likes" curation
    * stage, here with the per-group budget a mixture planner actually
    * allocates. Ranking runs on the bounded `TopKByScore` heap (k rows
    * per group per task cross the wire — no corpus-wide sort or
    * window); avg_nll is the identical two-division chain on exact
    * integers in both engines, so ordering (ties broken by doc_id)
    * is cross-engine deterministic. */
  val lmQualitySelect: Q = Q(
    "q90_lm_quality_select",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
      |         SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |                i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS b
      |         FROM w WHERE len(ws) >= 2) t),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT term) AS v FROM (SELECT unnest(ws) AS term FROM w) t),
      |m AS (SELECT w1, w2,
      |        CAST(round(-ln(CAST(c2 + 1 AS DOUBLE) / (c1 + v)) * 1000000.0) AS BIGINT) AS nll_q
      |      FROM c2 JOIN c1 USING (w1) CROSS JOIN v),
      |nll AS (SELECT doc_id, count(*) AS nb, CAST(sum(nll_q) AS BIGINT) AS s
      |        FROM bg JOIN m USING (w1, w2) GROUP BY doc_id),
      |sc AS (SELECT d.source, n.doc_id,
      |              CAST(n.s AS DOUBLE) / n.nb / 1000000.0 AS avg_nll
      |       FROM nll n JOIN documents d USING (doc_id))
      |SELECT source, doc_id, avg_nll, rn FROM (
      |  SELECT source, doc_id, avg_nll,
      |         CAST(row_number() OVER (PARTITION BY source
      |              ORDER BY avg_nll ASC, doc_id ASC) AS BIGINT) AS rn
      |  FROM sc) t
      |WHERE rn <= 12""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Sampling
    val docs = t(s, dir, "documents")
    val scored = graft.operators.LangModel.bigramNll(docs)
      .select(col("doc_id"),
        (col("nll_q_sum").cast("double") / col("n_bigrams") / lit(1000000.0))
          .as("avg_nll"))
    val withSrc = docs.select("doc_id", "source").join(scored, Seq("doc_id"))
    Sampling.quotaPerGroup(withSrc, Seq("source"), -col("avg_nll"),
        col("doc_id"), k = 12)
      .select(col("source"), col("id").as("doc_id"),
        (-col("score")).as("avg_nll"), col("rn"))
  }

  /** Boilerplate-chunk removal (q91): chunks appearing in ≥ 3 DISTINCT
    * documents are boilerplate — headers/footers/nav that no document
    * owns — and are stripped from EVERY document, the C4-style
    * complement of q67's keep-first chunk dedup. Distinct-doc df in
    * one two-phase aggregation; the (empirically stop-chunk-sized)
    * boilerplate set joins back on the chunk key, AQE broadcasting at
    * runtime; reassembly inside each doc's aggregation group. */
  val boilerplate: Q = Q(
    "q91_boilerplate",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |           WHERE len(string_split(text, ' ')) >= 1),
      |c AS (SELECT doc_id, i AS chunk_idx,
      |             array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
      |      FROM w, unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS t(i)),
      |bp AS (SELECT chunk FROM (
      |         SELECT chunk, count(DISTINCT doc_id) AS df FROM c GROUP BY 1) d
      |       WHERE df >= 3)
      |SELECT doc_id, count(*) AS total_chunks,
      |       CAST(sum(CASE WHEN chunk NOT IN (SELECT chunk FROM bp)
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
      |       coalesce(array_to_string(list_transform(
      |         list_sort(list(struct_pack(chunk_idx := chunk_idx, chunk := chunk))
      |                   FILTER (WHERE chunk NOT IN (SELECT chunk FROM bp))),
      |         x -> x.chunk), ' '), '') AS clean_text
      |FROM c GROUP BY doc_id""".stripMargin
  ) { (s, dir) =>
    graft.operators.Dedup.boilerplateStrip(
      t(s, dir, "documents"), "text", "doc_id")
  }

  /** Duplicate-cluster size distribution (q92): how big do near-dup
    * groups get — the curation dashboard's companion to q84's
    * per-source rate (a corpus with many pairs is a different problem
    * from one with a few giant mirror-farms; the histogram is what
    * tells dedup-policy tuning apart from incident response). Full
    * q27+q44 machinery, then two tiny aggregations over the resolved
    * components; the oracle re-derives the same clusters through the
    * recursive-CTE closure. */
  val dupClusterHistogram: Q = Q(
    "q92_dup_cluster_histogram",
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      |       FROM w WHERE len(ws) >= 3),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jp AS (SELECT doc_a, doc_b FROM pairs
      |       JOIN sizes sa ON doc_a = sa.doc_id
      |       JOIN sizes sb ON doc_b = sb.doc_id
      |       WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |e AS (SELECT doc_a AS a, doc_b AS b FROM jp
      |      UNION SELECT doc_b, doc_a FROM jp),
      |reach AS (
      |  SELECT a AS id, b AS r FROM e
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
      |comp AS (SELECT id AS doc_id, least(id, min(r)) AS canonical_id
      |         FROM reach GROUP BY id),
      |cs AS (SELECT canonical_id, count(*) AS cluster_size
      |       FROM comp GROUP BY 1)
      |SELECT cluster_size, count(*) AS n_clusters
      |FROM cs GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    graft.operators.Dedup.resolve(
        graft.operators.Dedup.jaccardPairs(
          graft.operators.Dedup.shingleProjection(
            t(s, dir, "documents"), "text", "doc_id"),
          threshold = 0.5, maxDf = 1000))
      .groupBy("canonical_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
  }

  /** Token-budget sampling per source (q96): greedy-fill each source's
    * token budget in deterministic hash order — the mixture planner's
    * "give me ~B tokens of src7" primitive, stable under corpus growth
    * (membership depends only on ids hashing earlier, never on
    * partition layout or seed).
    *
    * Scale shape: no kept row can sit past rank B in the (hash, id)
    * order — every predecessor carries ≥1 token — so a bounded
    * top-B-per-source heap ([[Sampling.quotaPerGroup]]: ≤ B rows per
    * group per TASK cross the shuffle) prunes the corpus first, and
    * the cumulative-sum window runs over ≤ B survivors per source, not
    * the source's full row count. The oracle states the plain
    * windowed form; the heap prepass provably preserves it. */
  val tokenBudgetSample: Q = Q(
    "q96_token_budget_sample",
    """WITH d AS (SELECT doc_id, source,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |                  AS BIGINT) AS hk
      |           FROM documents)
      |SELECT doc_id, source, n_tokens, cum_tokens FROM (
      |  SELECT doc_id, source, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY source
      |              ORDER BY hk, doc_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS cum_tokens
      |  FROM d) t
      |WHERE cum_tokens <= 1200""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Sampling
    val budget = 1200
    val base = t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) " +
        "AS BIGINT)").as("hk"))
    // bounded-heap prepass: kept rows all have rank <= budget, so the
    // window never sees more than `budget` rows per source
    // score = -hk as double (48-bit hashes are exact in a double);
    // desc score + asc-id ties == the window's ORDER BY hk, doc_id
    val capped = Sampling.quotaPerGroup(base, Seq("source"),
        -col("hk").cast("double"), col("doc_id"), k = budget)
      .select(col("id").as("doc_id"))
    val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(capped, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** Retention cohorts (q97): users grouped by first-seen date, distinct
    * actives per (cohort, day-offset) — the daily-cohort retention
    * triangle every product dashboard draws from an event stream.
    * Windowless: first-touch is a per-user min aggregation joined back
    * on user_id (both sides shuffle once on the same key), day math is
    * exact date arithmetic, and the final rollup is combiner-friendly.
    * UTC-pinned sessions make the DATE truncation engine-identical. */
  val retentionCohorts: Q = Q(
    "q97_retention_cohorts",
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d
      |           FROM events GROUP BY 1),
      |r AS (SELECT e.user_id, f.cohort_d,
      |        CAST(date_diff('day', f.cohort_d, CAST(e.ts AS DATE))
      |             AS BIGINT) AS day_offset
      |      FROM events e JOIN f USING (user_id))
      |SELECT cohort_d, day_offset,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM r GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val ev = t(s, dir, "events").select(col("user_id"),
      to_date(timestamp_millis(expr("ts_ns div 1000000"))).as("d"))
    val first = ev.groupBy("user_id").agg(min(col("d")).as("cohort_d"))
    ev.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort_d"),
        datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
      .groupBy("cohort_d", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Lexical diversity per source (q98): type/token ratio and hapax
    * share — the vocabulary-health metrics a curation dashboard reads
    * next to q25's language mix (template-generated or boilerplate-
    * heavy sources show as low-TTR outliers; OCR-damaged ones as
    * hapax-heavy). Two combiner-compressed aggregations — (source,
    * word) counts, then the per-source rollup — no windows, no joins;
    * ratios are ppm-quantized identical double chains both engines. */
  val lexicalDiversity: Q = Q(
    "q98_lexical_diversity",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |             FROM documents),
      |agg AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2)
      |SELECT source,
      |       CAST(sum(c) AS BIGINT) AS n_tokens,
      |       count(*) AS n_types,
      |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |       CAST(round(CAST(count(*) AS DOUBLE)
      |            / CAST(sum(c) AS BIGINT) * 1000000, 0) AS BIGINT) AS ttr_ppm,
      |       CAST(round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |            / count(*) * 1000000, 0) AS BIGINT) AS hapax_ppm
      |FROM agg GROUP BY source""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens") * 1000000, 0)
          .cast("long").as("ttr_ppm"),
        round(col("n_hapax").cast("double") / col("n_types") * 1000000, 0)
          .cast("long").as("hapax_ppm"))
  }

  /** Chunk-duplication rate by source (q99): q67's chunk dedup rolled
    * up per source — the chunk-granularity companion to q84's
    * document-level dup rate (a mirror farm shows at doc level; shared
    * boilerplate and quoted paragraphs only show here). Rides the full
    * digest-keyed chunkDedup, then one broadcast-dimension join and a
    * 20-row rollup; dup share is a ppm-quantized identical double
    * chain. */
  val chunkDupBySource: Q = Q(
    "q99_chunk_dup_by_source",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |           WHERE len(string_split(text, ' ')) >= 1),
      |c AS (SELECT doc_id, i AS chunk_idx, array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
      |      FROM w, unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS t(i)),
      |win AS (SELECT chunk, doc_id AS wd, chunk_idx AS wi FROM (
      |          SELECT chunk, doc_id, chunk_idx,
      |                 row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
      |          FROM c) t WHERE rn = 1),
      |f AS (SELECT c.doc_id,
      |             CASE WHEN c.doc_id = win.wd AND c.chunk_idx = win.wi
      |                  THEN 1 ELSE 0 END AS kept
      |      FROM c JOIN win USING (chunk)),
      |per_doc AS (SELECT doc_id, count(*) AS total_chunks,
      |                   CAST(sum(kept) AS BIGINT) AS kept_chunks
      |            FROM f GROUP BY 1)
      |SELECT d.source,
      |       CAST(sum(p.total_chunks) AS BIGINT) AS n_chunks,
      |       CAST(sum(p.kept_chunks) AS BIGINT) AS kept_chunks,
      |       CAST(round((1.0 - CAST(sum(p.kept_chunks) AS DOUBLE)
      |            / CAST(sum(p.total_chunks) AS BIGINT)) * 1000000, 0)
      |            AS BIGINT) AS dup_ppm
      |FROM per_doc p JOIN documents d USING (doc_id)
      |GROUP BY d.source""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    graft.operators.Dedup.chunkDedup(docs, "text", "doc_id")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(sum(col("total_chunks")).cast("long").as("n_chunks"),
        sum(col("kept_chunks")).cast("long").as("kept_chunks"))
      .select(col("source"), col("n_chunks"), col("kept_chunks"),
        round((lit(1.0) - col("kept_chunks").cast("double") / col("n_chunks"))
          * 1000000, 0).cast("long").as("dup_ppm"))
  }

  /** Effective corpus size after dedup (q101): per source, the token
    * mass that SURVIVES near-dup resolution (only each cluster's
    * canonical doc counts) vs the raw mass — the number a mixture
    * planner actually budgets against ("source 7 claims 2M tokens but
    * deduped it's 1.3M"), and the per-source savings a dedup run
    * reports. Rides the full q27+q44 machinery (df-capped shingle
    * join → jaccard verify → pointer-doubling resolution); docs in no
    * cluster are their own canonical via a left join, the rollup is
    * one combiner-friendly aggregation, and the savings share is a
    * ppm-quantized identical double chain. The oracle re-derives the
    * clusters through the recursive-CTE closure (q92's pattern). */
  val effectiveTokens: Q = Q(
    "q101_effective_tokens",
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      |       FROM w WHERE len(ws) >= 3),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jp AS (SELECT doc_a, doc_b FROM pairs
      |       JOIN sizes sa ON doc_a = sa.doc_id
      |       JOIN sizes sb ON doc_b = sb.doc_id
      |       WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |e AS (SELECT doc_a AS a, doc_b AS b FROM jp
      |      UNION SELECT doc_b, doc_a FROM jp),
      |reach AS (
      |  SELECT a AS id, b AS r FROM e
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
      |comp AS (SELECT id AS doc_id, least(id, min(r)) AS canonical_id
      |         FROM reach GROUP BY id),
      |base AS (SELECT doc_id, source,
      |           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |         FROM documents),
      |k AS (SELECT b.source, b.n_tokens,
      |        CASE WHEN c.canonical_id IS NULL OR c.canonical_id = b.doc_id
      |             THEN 1 ELSE 0 END AS kept
      |      FROM base b LEFT JOIN comp c USING (doc_id))
      |SELECT source, count(*) AS raw_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
      |       CAST(sum(kept) AS BIGINT) AS kept_docs,
      |       CAST(sum(kept * n_tokens) AS BIGINT) AS kept_tokens,
      |       CAST(round((1.0 - CAST(sum(kept * n_tokens) AS DOUBLE)
      |            / CAST(sum(n_tokens) AS BIGINT)) * 1000000, 0)
      |            AS BIGINT) AS savings_ppm
      |FROM k GROUP BY source""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val base = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val comp = graft.operators.Dedup.resolve(
      graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.shingleProjection(docs, "text", "doc_id"),
        threshold = 0.5, maxDf = 1000))
    val kept = when(col("canonical_id").isNull ||
      col("canonical_id") === col("doc_id"), 1L).otherwise(0L)
    base.join(comp, Seq("doc_id"), "left")
      .select(col("source"), col("n_tokens"), kept.as("kept"))
      .groupBy("source")
      .agg(count(lit(1)).as("raw_docs"),
        sum(col("n_tokens")).cast("long").as("raw_tokens"),
        sum(col("kept")).cast("long").as("kept_docs"),
        sum(col("kept") * col("n_tokens")).cast("long").as("kept_tokens"))
      .select(col("source"), col("raw_docs"), col("raw_tokens"),
        col("kept_docs"), col("kept_tokens"),
        round((lit(1.0) - col("kept_tokens").cast("double")
          / col("raw_tokens")) * 1000000, 0).cast("long").as("savings_ppm"))
  }

  /** Temperature-rebalanced domain mix (q102): deterministic
    * down-sampling toward a sqrt-temperature target mix (τ=2, the
    * multilingual-training convention: share_s ∝ √count_s flattens
    * head domains without drowning the tail) at half the corpus
    * volume. Membership is a pure function of doc_id — the q57/q96
    * hash-threshold trick — so the sample is stable across runs,
    * partition layouts, and engines. The per-source √weights quantize
    * to BIGINT micros BEFORE the cross-source normalizer sum: the
    * normalizer is an exact integer sum (order-independent — a raw
    * double sum across sources would vary with Spark's aggregation
    * order), and every later step is an identical per-row double
    * chain. Scale shape: one combiner rollup for counts, a
    * sources-sized broadcast rates dim, one corpus scan to filter —
    * no shuffle of the corpus at all. */
  val temperatureMix: Q = Q(
    "q102_temperature_mix",
    """WITH counts AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
      |wts AS (SELECT source, c,
      |          CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS w
      |        FROM counts),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS z
      |        FROM wts),
      |rates AS (SELECT source,
      |            least(1.0, 0.5 * CAST(tot.n AS DOUBLE) * CAST(w AS DOUBLE)
      |              / CAST(tot.z AS DOUBLE) / CAST(c AS DOUBLE)) AS r
      |          FROM wts, tot),
      |d AS (SELECT doc_id, source,
      |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |             AS BIGINT) AS hk
      |      FROM documents)
      |SELECT d.doc_id, d.source,
      |       CAST(round(r * 1000000, 0) AS BIGINT) AS rate_ppm
      |FROM d JOIN rates USING (source)
      |WHERE CAST(hk AS DOUBLE) < r * 281474976710656.0""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("c"))
    val wts = counts.withColumn("w",
      floor(sqrt(col("c").cast("double")) * 1000000).cast("long"))
    val tot = wts.agg(sum(col("c")).cast("long").as("n"),
      sum(col("w")).cast("long").as("z"))
    val rates = wts.crossJoin(broadcast(tot)).select(col("source"),
      least(lit(1.0), lit(0.5) * col("n").cast("double")
        * col("w").cast("double") / col("z").cast("double")
        / col("c").cast("double")).as("r"))
    docs.select(col("doc_id"), col("source"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) " +
          "AS BIGINT)").as("hk"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("hk").cast("double") < col("r") * lit(281474976710656.0))
      .select(col("doc_id"), col("source"),
        round(col("r") * 1000000, 0).cast("long").as("rate_ppm"))
  }

  /** Normalization-fold dedup (q103): lowercase + strip punctuation +
    * collapse whitespace, then exact dedup on the FOLDED text — the
    * practical first dedup pass of a web pipeline (re-encoded and
    * re-punctuated copies fold together; `n_variants > 1` marks the
    * groups plain exact dedup would miss). One digest-keyed shuffle,
    * no candidate join. The whitespace classes are written as
    * explicit character sets so Java regex and RE2 agree byte-for-
    * byte (Java's \s includes \x0B, RE2's does not). */
  val normDedup: Q = Q(
    "q103_norm_dedup",
    """WITH n AS (SELECT doc_id, text,
      |         trim(regexp_replace(regexp_replace(lower(text),
      |              '[^a-z0-9 \t\n\r]', '', 'g'),
      |              '[ \t\n\r]+', ' ', 'g')) AS norm
      |       FROM documents)
      |SELECT md5(norm) AS norm_hash, min(doc_id) AS canonical_id,
      |       count(*) AS n_docs,
      |       count(DISTINCT md5(text)) AS n_variants
      |FROM n GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    graft.operators.Dedup.normalizedExact(
      t(s, dir, "documents"), "text", "doc_id")
  }

  /** Mixture/epoch plan (q104): the per-source repeat-factor table a
    * training run budgets from (the LLaMA-style data plan): targets
    * allocated by √-temperature over AVAILABLE TOKENS (q102 flattens
    * doc counts; this flattens token mass), epochs capped at 4×
    * (oversampling a small source past a few epochs stops helping),
    * deficit reported where the cap binds. All integer math up to the
    * two per-row ratio quantizations: weights quantize to micros
    * before the exact normalizer sum, targets are integer
    * `(B·w) div z`, so the plan is bit-stable under any aggregation
    * order. Scale: one token rollup (map-side combined, explode-free)
    * + a sources-sized broadcast — the corpus is scanned once and
    * never shuffled. (B·w bounds at tokens^1.5·10⁶ — exact BIGINT
    * under ~10⁸ corpus tokens; the 100 TB deployment promotes this
    * 20-row dim to DECIMAL(38,0) internally.) */
  val epochPlan: Q = Q(
    "q104_epoch_plan",
    """WITH c AS (SELECT source,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      |       FROM documents GROUP BY 1),
      |w AS (SELECT source, avail,
      |        CAST(floor(sqrt(CAST(avail AS DOUBLE)) * 1000000) AS BIGINT) AS w
      |      FROM c),
      |t AS (SELECT CAST(sum(avail) AS BIGINT) AS tot,
      |             CAST(sum(w) AS BIGINT) AS z FROM w),
      |p AS (SELECT source, avail, ((tot // 2) * w) // z AS target
      |      FROM w, t)
      |SELECT source, avail AS avail_tokens,
      |       CAST(target AS BIGINT) AS target_tokens,
      |       CAST(least(4000000.0, round(CAST(target AS DOUBLE)
      |            / CAST(avail AS DOUBLE) * 1000000)) AS BIGINT) AS epochs_ppm,
      |       CAST(least(target, 4 * avail) AS BIGINT) AS planned_tokens,
      |       CAST(target - least(target, 4 * avail) AS BIGINT) AS deficit_tokens
      |FROM p""".stripMargin
  ) { (s, dir) =>
    val avail = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail"))
    val w = avail.withColumn("w",
      floor(sqrt(col("avail").cast("double")) * 1000000).cast("long"))
    val tot = w.agg(sum(col("avail")).cast("long").as("tot"),
      sum(col("w")).cast("long").as("z"))
    w.crossJoin(broadcast(tot))
      .withColumn("target", expr("((tot div 2) * w) div z"))
      .select(col("source"), col("avail").as("avail_tokens"),
        col("target").as("target_tokens"),
        least(lit(4000000.0), round(col("target").cast("double")
          / col("avail").cast("double") * 1000000)).cast("long")
          .as("epochs_ppm"),
        least(col("target"), col("avail") * 4).cast("long")
          .as("planned_tokens"),
        (col("target") - least(col("target"), col("avail") * 4))
          .cast("long").as("deficit_tokens"))
  }

  /** Per-source unigram KL drift (q105): KL(P_source ‖ P_corpus) over
    * word unigrams — the domain-drift / outlier-source detector (a
    * source whose KL jumps between snapshots changed registers).
    * Exact-integer products feed one ln per distinct (source, word),
    * nano-quantized terms sum as integers (order-independent), the
    * final double re-derives from the exact sum. See
    * [[graft.operators.LangModel.sourceUnigramKl]] for the 100 TB
    * shape (combiner-compressed counts, vocab-keyed equi-join,
    * broadcast totals). */
  val sourceKl: Q = Q(
    "q105_source_kl",
    """WITH wds AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |        FROM documents),
      |csw AS (SELECT source, w, count(*) AS c_sw FROM wds GROUP BY 1, 2),
      |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM csw GROUP BY 1),
      |cs AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS c_s,
      |         count(*) AS n_types
      |       FROM csw GROUP BY 1),
      |t AS (SELECT CAST(sum(c_s) AS BIGINT) AS c_tot FROM cs),
      |terms AS (SELECT csw.source,
      |            CAST(round((CAST(c_sw AS DOUBLE) / CAST(c_s AS DOUBLE))
      |              * ln(CAST(c_sw * c_tot AS DOUBLE)
      |                / CAST(c_s * c_w AS DOUBLE))
      |              * 1000000000.0) AS BIGINT) AS term_q
      |          FROM csw JOIN cw USING (w) JOIN cs USING (source), t)
      |SELECT s.source, cs.c_s AS n_tokens,
      |       CAST(cs.n_types AS BIGINT) AS n_types,
      |       CAST(s.kl_nano AS BIGINT) AS kl_nano,
      |       CAST(s.kl_nano AS DOUBLE) / 1000000000.0 AS kl
      |FROM (SELECT source, sum(term_q) AS kl_nano FROM terms GROUP BY 1) s
      |JOIN cs ON s.source = cs.source""".stripMargin
  ) { (s, dir) =>
    graft.operators.LangModel.sourceUnigramKl(t(s, dir, "documents"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("kl_nano"), col("kl"))
  }

  /** Cross-source duplication matrix (q106): for every unordered
    * source pair, the number of verified near-dup pairs whose members
    * live in those sources — the provenance/governance view of
    * duplication ("which sources copy from which") that q84's
    * per-source rate cannot show: a source with a high dup rate
    * against ITSELF is re-posting; one duplicating mostly OTHER
    * sources is a scraper/mirror. Rides q27's df-capped shingle join
    * + jaccard verify unchanged; the source lookup is an id→source
    * projection joined once per pair side (AQE broadcasts it at test
    * scale; at corpus scale it shuffles PAIRS — orders of magnitude
    * fewer rows than shingles — never the corpus text). The pair key
    * is normalized (least, greatest) so the matrix is upper-
    * triangular including the diagonal (within-source dups);
    * `n_cross` counts the off-diagonal contribution. */
  val crossSourceDupMatrix: Q = Q(
    "q106_cross_source_dup",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh0 AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      |       FROM w WHERE len(ws) >= 3),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jp AS (SELECT doc_a, doc_b FROM pairs
      |       JOIN sizes sa ON doc_a = sa.doc_id
      |       JOIN sizes sb ON doc_b = sb.doc_id
      |       WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5)
      |SELECT least(da.source, db.source) AS source_a,
      |       greatest(da.source, db.source) AS source_b,
      |       count(*) AS n_pairs,
      |       CAST(sum(CASE WHEN da.source = db.source THEN 0 ELSE 1 END)
      |            AS BIGINT) AS n_cross
      |FROM jp JOIN documents da ON jp.doc_a = da.doc_id
      |        JOIN documents db ON jp.doc_b = db.doc_id
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.shingleProjection(docs, "text", "doc_id"),
      threshold = 0.5, maxDf = 1000)
      .select("doc_a", "doc_b")
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        when(col("sa") === col("sb"), 0L).otherwise(1L).as("x"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("n_cross"))
  }

  /** Token-length distribution (q107): per source, a log2-bucketed
    * histogram of document token lengths — the distribution a
    * sequence-packing planner (q71) sizes context windows from, and
    * the quickest per-source shape check (a source whose mass jumps
    * a bucket between snapshots changed content type). The bucket is
    * `length(bin(n)) - 1` — floor(log2) computed as pure integer/
    * string work, identical in both engines; a float log2 here is a
    * cross-engine hazard (Java computes log(x)/log(2), which can land
    * a hair under the integer at exact powers of two while DuckDB's
    * log2 is exact, flipping the bucket). One explode-free projection
    * + one combiner-friendly rollup; no joins, no windows. */
  val tokenLengthHistogram: Q = Q(
    "q107_length_histogram",
    """WITH d AS (SELECT source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |       FROM documents)
      |SELECT source,
      |       CAST(length(bin(n)) - 1 AS BIGINT) AS len_bucket,
      |       count(*) AS n_docs,
      |       CAST(sum(n) AS BIGINT) AS n_tokens
      |FROM d GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val d = t(s, dir, "documents").select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n"))
    d.select(col("source"),
        (length(bin(col("n"))) - 1).cast("long").as("len_bucket"),
        col("n"))
      .groupBy("source", "len_bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).cast("long").as("n_tokens"))
  }

  /** Zipf rank-frequency slope per source (q109): OLS slope of
    * ln(freq) on ln(rank) over each source's top-100 terms — natural
    * text tracks slope ≈ −1; templated/generated content flattens it,
    * so the drift of this number per source is a cheap corpus-health
    * probe. Shape: one combiner-compressed (source, term) count, then
    * the bounded `TopKByScore` heap per source (≤k rows per group per
    * task cross the wire — no corpus-wide sort or window; the rank is
    * the heap position, tie-broken by the PORTABLE polynomial term
    * hash so both engines rank identically). ln values quantize to
    * integer micros BEFORE summing (q66's trick), so the regression's
    * sums are exact 64-bit integers in both engines and slope_ppm is a
    * deterministic ratio of exact integers. */
  val zipfSlope: Q = Q(
    "q109_zipf_slope",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
      |tc AS (SELECT source, term, count(*) AS cnt FROM w GROUP BY 1, 2),
      |h AS (SELECT source, cnt, list_reduce(
      |        list_prepend(CAST(7 AS BIGINT),
      |          list_transform(range(1, length(term) + 1),
      |            i -> CAST(unicode(substr(term, i, 1)) AS BIGINT))),
      |        (acc, c) -> (acc * 131 + c) % 35184372088777) AS tid
      |      FROM tc),
      |r AS (SELECT source, cnt,
      |        row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tid ASC) AS rk
      |      FROM h),
      |t AS (SELECT source,
      |        CAST(round(ln(rk) * 1000000) AS BIGINT) AS xq,
      |        CAST(round(ln(cnt) * 1000000) AS BIGINT) AS yq
      |      FROM r WHERE rk <= 100)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
      |       CAST(round(CAST(count(*) * sum(xq*yq) - sum(xq) * sum(yq) AS DOUBLE)
      |            / (count(*) * sum(xq*xq) - sum(xq) * sum(xq)) * 1000000) AS BIGINT) AS slope_ppm
      |FROM t GROUP BY source""".stripMargin
  ) { (s, dir) =>
    val E = graft.functions.expressions.GraftExpressions
    val tc = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
    val hashed = tc.select(col("source"), col("cnt"),
      element_at(
        E.shingleHashes(array(col("term")), 1, ordered = false, poly = true),
        1).as("tid"))
    val top = hashed.groupBy("source")
      .agg(E.topKByScore(col("cnt").cast("double"), col("tid"), 100).as("tk"))
      .select(col("source"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("p.score").cast("long").as("cnt"))
    top
      .select(col("source"),
        round(log(col("rk")) * 1000000).cast("long").as("xq"),
        round(log(col("cnt")) * 1000000).cast("long").as("yq"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("xq") * col("yq")).as("sxy"), sum(col("xq")).as("sx"),
        sum(col("yq")).as("sy"), sum(col("xq") * col("xq")).as("sxx"))
      .select(col("source"), col("n_terms"),
        round((col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n_terms") * col("sxx") - col("sx") * col("sx")) * 1000000)
          .cast("long").as("slope_ppm"))
  }

  /** Split-balance audit (q111): the deterministic train/valid/test
    * assignment (q57's md5 hash-threshold — a pure function of doc_id,
    * identical to the split q89/q94 audit for leakage) cross-tabulated
    * per source with doc and token mass, plus each cell's within-source
    * doc share. Imbalanced small sources (a 25-doc source putting 20%
    * of itself in test) are exactly what silently skews per-source eval
    * metrics. One combiner rollup + a broadcast source-total join;
    * share_ppm is a ratio of exact counts. */
  val splitBalance: Q = Q(
    "q111_split_balance",
    """WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
      |             CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |                        AS BIGINT) % 100 < 80 THEN 'train'
      |                  WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |                        AS BIGINT) % 100 < 90 THEN 'valid'
      |                  ELSE 'test' END AS split
      |           FROM documents),
      |c AS (SELECT source, split, count(*) AS n_docs,
      |             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |      FROM d GROUP BY 1, 2),
      |t AS (SELECT source, count(*) AS src_total FROM d GROUP BY 1)
      |SELECT c.source, c.split, CAST(c.n_docs AS BIGINT) AS n_docs, c.n_tokens,
      |       CAST(round(CAST(c.n_docs AS DOUBLE) / t.src_total * 1000000) AS BIGINT) AS share_ppm
      |FROM c JOIN t USING (source)""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Sampling
    val d = t(s, dir, "documents").select(col("source"),
      Sampling.splitColumn(col("doc_id")).as("split"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val c = d.groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val tot = d.groupBy("source").agg(count(lit(1)).as("src_total"))
    c.join(tot, "source")
      .select(col("source"), col("split"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("src_total") * 1000000)
          .cast("long").as("share_ppm"))
  }

  /** Token-budget sensitivity sweep (q114): q96's per-source greedy
    * hash-order fill evaluated at FOUR budgets in one pass — docs and
    * tokens kept per (source, budget) plus budget utilization ppm, the
    * curve that shows where each source saturates (utilization falls
    * off once the source's token mass is exhausted). The heap prepass
    * runs once at the LARGEST budget (every smaller budget's keep-set
    * is a prefix of the same (hash, id) order), the cumulative window
    * sees ≤ maxBudget rows per source, and the 4-row budget lattice
    * broadcast-crosses the bounded prefix frame — never the corpus. */
  val budgetSweep: Q = Q(
    "q114_budget_sweep",
    """WITH d AS (SELECT doc_id, source,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |                  AS BIGINT) AS hk
      |           FROM documents),
      |c AS (SELECT source, n_tokens,
      |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |      FROM d),
      |lat(budget) AS (VALUES (300), (600), (1200), (2400))
      |SELECT source, CAST(budget AS BIGINT) AS budget,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(round(CAST(sum(n_tokens) AS DOUBLE) / budget * 1000000) AS BIGINT) AS util_ppm
      |FROM c CROSS JOIN lat WHERE cum_tokens <= budget
      |GROUP BY source, budget""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Sampling
    val maxBudget = 2400
    val base = t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) " +
        "AS BIGINT)").as("hk"))
    val capped = Sampling.quotaPerGroup(base, Seq("source"),
        -col("hk").cast("double"), col("doc_id"), k = maxBudget)
      .select(col("id").as("doc_id"))
    val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.join(capped, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("source"), col("n_tokens"), col("cum_tokens"))
    val lat = Seq(300L, 600L, 1200L, 2400L).toDF("budget")
    cum.crossJoin(broadcast(lat))
      .filter(col("cum_tokens") <= col("budget"))
      .groupBy("source", "budget")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")).cast("double") / col("budget") * 1000000)
          .cast("long").as("util_ppm"))
  }

  /** Duplicated-span removal (q115): Lee-et-al-style exact-substring
    * dedup — every 8-token sliding window that occurs anywhere else in
    * the corpus is stripped except its globally-first occurrence, with
    * overlapping flagged windows merged into contiguous removed
    * regions and the document rebuilt from the surviving tokens. The
    * sliding (stride-1) window catches duplication at ANY alignment —
    * the gap q67's chunk-boundary dedup leaves open. Engine elects
    * winners on 16-byte md5 digests (text never crosses an election
    * exchange); the oracle groups the raw gram text — identical output
    * short of a 2⁻¹²⁸ digest collision, the same accepted gap as q67. */
  val dupSpanStrip: Q = Q(
    "q115_dup_span_strip",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, p, array_to_string(ws[(p+1):(p+8)], ' ') AS gram
      |      FROM w, unnest(range(0, greatest(len(ws) - 7, 0))) AS t(p)),
      |x AS (SELECT doc_id, p,
      |             count(*) OVER (PARTITION BY gram) AS occ,
      |             row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
      |      FROM g),
      |f AS (SELECT doc_id, p FROM x WHERE occ > 1 AND rn > 1),
      |cov AS (SELECT DISTINCT doc_id, c FROM f, unnest(range(p, p + 8)) AS t(c)),
      |r AS (SELECT doc_id, count(*) AS removed FROM cov GROUP BY doc_id),
      |tok AS (SELECT doc_id, i, ws[i + 1] AS word
      |        FROM w, unnest(range(0, len(ws))) AS t(i)),
      |kept AS (SELECT tok.doc_id,
      |                coalesce(string_agg(tok.word, ' ' ORDER BY tok.i), '') AS clean_text
      |         FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.c
      |         WHERE cov.c IS NULL GROUP BY tok.doc_id)
      |SELECT w.doc_id, len(w.ws) AS n_tokens,
      |       coalesce(r.removed, 0) AS removed_tokens,
      |       len(w.ws) - coalesce(r.removed, 0) AS kept_tokens,
      |       coalesce(kept.clean_text, '') AS clean_text
      |FROM w LEFT JOIN r USING (doc_id)
      |LEFT JOIN kept ON w.doc_id = kept.doc_id""".stripMargin
  ) { (s, dir) =>
    graft.operators.Dedup.dupSpanStrip(t(s, dir, "documents"), "text", "doc_id")
  }

  /** Span-duplication rate by source (q116): q115's removal rolled up
    * per source — "which feed is re-crawling content verbatim" as ppm
    * of tokens stripped. Integer token sums are exact; the one double
    * division rounds to an integer ppm in both engines. */
  val spanRateBySource: Q = Q(
    "q116_span_rate_by_source",
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, p, array_to_string(ws[(p+1):(p+8)], ' ') AS gram
      |      FROM w, unnest(range(0, greatest(len(ws) - 7, 0))) AS t(p)),
      |x AS (SELECT doc_id, p,
      |             count(*) OVER (PARTITION BY gram) AS occ,
      |             row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
      |      FROM g),
      |f AS (SELECT doc_id, p FROM x WHERE occ > 1 AND rn > 1),
      |cov AS (SELECT DISTINCT doc_id, c FROM f, unnest(range(p, p + 8)) AS t(c)),
      |r AS (SELECT doc_id, count(*) AS removed FROM cov GROUP BY doc_id)
      |SELECT w.source, count(*) AS n_docs,
      |       CAST(sum(len(w.ws)) AS BIGINT) AS n_tokens,
      |       CAST(sum(coalesce(r.removed, 0)) AS BIGINT) AS removed_tokens,
      |       CAST(round(CAST(sum(coalesce(r.removed, 0)) AS DOUBLE)
      |            / sum(len(w.ws)) * 1000000, 0) AS BIGINT) AS removed_ppm
      |FROM w LEFT JOIN r USING (doc_id)
      |GROUP BY w.source""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    graft.operators.Dedup.dupSpanStrip(docs, "text", "doc_id")
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("removed_tokens")).as("removed_tokens"),
        round(sum(col("removed_tokens")).cast("double")
          / sum(col("n_tokens")) * 1000000, 0).cast("long").as("removed_ppm"))
  }

  /** Bloom-gated batch decontamination (q117): treat even doc_ids as
    * yesterday's ingested corpus and odd doc_ids as today's batch;
    * drop every batch doc sharing ANY distinct 8-gram with the seen
    * corpus (the GPT-3-appendix-C overlap rule at ingest time). The
    * batch's gram stream is pre-gated by a Bloom filter of the seen
    * gram set — bloom-negative grams (almost all of them) never reach
    * the exchange; positives are confirmed by the exact semi-join, so
    * the result is bit-identical to the ungated join (BloomGate's
    * no-false-negative argument) and the oracle needs no bloom at
    * all. Grams are keyed by the engine-portable polynomial hash
    * (q100's formula, replicated in the SQL) so both engines collide
    * identically; production passes 128-bit digests instead. */
  val bloomDecontaminate: Q = Q(
    "q117_bloom_decontaminate",
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, list_transform(range(1, len(ws) - 6),
      |        i -> array_to_string(ws[i:i+7], ' ')) AS grams
      |      FROM w WHERE len(ws) >= 8),
      |h AS (SELECT doc_id, list_distinct(list_transform(grams, s -> list_reduce(
      |        list_prepend(CAST(7 AS BIGINT),
      |          list_transform(range(1, length(s) + 1),
      |            i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
      |        (acc, c) -> (acc * 131 + c) % 35184372088777))) AS hs
      |      FROM g),
      |e AS (SELECT doc_id, unnest(hs) AS h FROM h),
      |bl AS (SELECT DISTINCT h FROM e WHERE doc_id % 2 = 0),
      |bad AS (SELECT DISTINCT e.doc_id FROM e JOIN bl USING (h)
      |        WHERE e.doc_id % 2 = 1)
      |SELECT w.doc_id, w.source FROM w
      |WHERE w.doc_id % 2 = 1
      |  AND w.doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        graft.functions.expressions.GraftExpressions.shingleHashes(
          split(col("text"), " "), 8, ordered = false, poly = true).as("hs"))
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val seen = grams(docs.filter(col("doc_id") % 2 === 0))
    val flagged = graft.operators.BloomGate
      .gatedSemiJoin(grams(docs.filter(col("doc_id") % 2 === 1)), "h",
        seen, "h", expectedItems = 1 << 20)
      .select("doc_id").distinct()
    docs.filter(col("doc_id") % 2 === 1)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"))
  }

  /** Per-eval-doc contamination audit (q118): the REPORT complement of
    * q117's drop — for every eval-side document (odd doc_id), how many
    * of its distinct 8-grams already occur in the train side (even
    * doc_id), as an exact count and a ppm rate. This is the number a
    * benchmark-integrity review reads (GPT-3 appendix C reports
    * exactly this overlap before deciding what to strike). Same
    * bloom-gated exact-count plan as q117: the gate prunes the gram
    * stream, the inner join keeps the count exact. Docs under 8 tokens
    * have no gram and are excluded in both engines. */
  val contaminationAudit: Q = Q(
    "q118_contamination_audit",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, list_transform(range(1, len(ws) - 6),
      |        i -> array_to_string(ws[i:i+7], ' ')) AS grams
      |      FROM w WHERE len(ws) >= 8),
      |h AS (SELECT doc_id, list_distinct(list_transform(grams, s -> list_reduce(
      |        list_prepend(CAST(7 AS BIGINT),
      |          list_transform(range(1, length(s) + 1),
      |            i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
      |        (acc, c) -> (acc * 131 + c) % 35184372088777))) AS hs
      |      FROM g),
      |e AS (SELECT doc_id, unnest(hs) AS h FROM h),
      |tr AS (SELECT DISTINCT h FROM e WHERE doc_id % 2 = 0),
      |ev AS (SELECT doc_id, h FROM e WHERE doc_id % 2 = 1),
      |n AS (SELECT doc_id, count(*) AS n_grams FROM ev GROUP BY doc_id),
      |ht AS (SELECT ev.doc_id, count(*) AS hit_grams FROM ev JOIN tr USING (h)
      |       GROUP BY ev.doc_id)
      |SELECT n.doc_id, n.n_grams,
      |       coalesce(ht.hit_grams, 0) AS hit_grams,
      |       CAST(round(CAST(coalesce(ht.hit_grams, 0) AS DOUBLE)
      |            / n.n_grams * 1000000, 0) AS BIGINT) AS contam_ppm
      |FROM n LEFT JOIN ht USING (doc_id)""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        graft.functions.expressions.GraftExpressions.shingleHashes(
          split(col("text"), " "), 8, ordered = false, poly = true).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val ev = grams(docs.filter(col("doc_id") % 2 === 1))
    val hits = graft.operators.BloomGate
      .gatedSemiJoin(ev, "h",
        grams(docs.filter(col("doc_id") % 2 === 0)).select("h"), "h",
        expectedItems = 1 << 20)
      .groupBy("doc_id").agg(count(lit(1)).as("hit_grams"))
    ev.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("hit_grams"), lit(0L)).as("hit_grams"),
        round(coalesce(col("hit_grams"), lit(0L)).cast("double")
          / col("n_grams") * 1000000, 0).cast("long").as("contam_ppm"))
  }

  /** Hashed linear classifier scoring (q119): fastText/DCLM-shape
    * quality-classifier inference — tokens hash into 4096 feature
    * buckets (the engine-portable polynomial word hash, q61's
    * formula), the doc score sums integer bucket weights over token
    * occurrences, keep = score ≥ 0. Weights derive deterministically
    * from the bucket id so both engines run the identical exact
    * integer model; production swaps in offline-learned weights with
    * the same zero-shuffle plan. */
  val hashClassifier: Q = Q(
    "q119_hash_classifier",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |h AS (SELECT doc_id, list_transform(ws, s -> list_reduce(
      |        list_prepend(CAST(7 AS BIGINT),
      |          list_transform(range(1, length(s) + 1),
      |            i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
      |        (acc, c) -> (acc * 131 + c) % 35184372088777)) AS hs
      |      FROM w)
      |SELECT doc_id, len(hs) AS n_tokens,
      |       CAST(coalesce(list_sum(list_transform(hs,
      |         x -> (x % 4096) * 2654435761 % 2001 - 1000)), 0) AS BIGINT) AS score,
      |       CAST(coalesce(list_sum(list_transform(hs,
      |         x -> (x % 4096) * 2654435761 % 2001 - 1000)), 0) AS BIGINT) >= 0 AS keep
      |FROM h""".stripMargin
  ) { (s, dir) =>
    graft.operators.LangModel.hashClassifierScore(t(s, dir, "documents"))
  }

  /** Corpus pipeline v3 (q120): the round-8 operators composed
    * end-to-end — sliding-window span dedup (q115) rebuilds each doc
    * from its non-duplicated tokens, a survivor gate keeps docs
    * retaining ≥ half their tokens, the hashed linear classifier
    * (q119) scores the CLEANED text, and the keep-set rolls up per
    * source. Every stage is exact integer/string math, so the whole
    * chain hash-oracles end-to-end like q74. */
  val corpusPipelineV3: Q = Q(
    "q120_corpus_pipeline_v3",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, p, array_to_string(ws[(p+1):(p+8)], ' ') AS gram
      |      FROM w, unnest(range(0, greatest(len(ws) - 7, 0))) AS t(p)),
      |x AS (SELECT doc_id, p,
      |             count(*) OVER (PARTITION BY gram) AS occ,
      |             row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
      |      FROM g),
      |f AS (SELECT doc_id, p FROM x WHERE occ > 1 AND rn > 1),
      |cov AS (SELECT DISTINCT doc_id, c FROM f, unnest(range(p, p + 8)) AS t(c)),
      |r AS (SELECT doc_id, count(*) AS removed FROM cov GROUP BY doc_id),
      |tok AS (SELECT doc_id, i, ws[i + 1] AS word
      |        FROM w, unnest(range(0, len(ws))) AS t(i)),
      |kept AS (SELECT tok.doc_id,
      |                coalesce(string_agg(tok.word, ' ' ORDER BY tok.i), '') AS clean_text
      |         FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.c
      |         WHERE cov.c IS NULL GROUP BY tok.doc_id),
      |spans AS (SELECT w.doc_id, len(w.ws) AS n_tokens,
      |                 len(w.ws) - coalesce(r.removed, 0) AS kept_tokens,
      |                 coalesce(kept.clean_text, '') AS clean_text
      |          FROM w LEFT JOIN r USING (doc_id)
      |          LEFT JOIN kept ON w.doc_id = kept.doc_id),
      |surv AS (SELECT doc_id, string_split(clean_text, ' ') AS ws2 FROM spans
      |         WHERE kept_tokens * 2 >= n_tokens AND clean_text <> ''),
      |sc AS (SELECT doc_id, CAST(len(ws2) AS BIGINT) AS n_tok,
      |         CAST(coalesce(list_sum(list_transform(
      |           list_transform(ws2, s -> list_reduce(
      |             list_prepend(CAST(7 AS BIGINT),
      |               list_transform(range(1, length(s) + 1),
      |                 i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
      |             (acc, c) -> (acc * 131 + c) % 35184372088777)),
      |           x -> (x % 4096) * 2654435761 % 2001 - 1000)), 0) AS BIGINT) AS score
      |       FROM surv)
      |SELECT d.source, count(*) AS n_docs,
      |       CAST(sum(sc.n_tok) AS BIGINT) AS n_tokens,
      |       CAST(sum(sc.score) AS BIGINT) AS score_sum
      |FROM sc JOIN documents d USING (doc_id)
      |WHERE sc.score >= 0
      |GROUP BY d.source""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val spans = graft.operators.Dedup.dupSpanStrip(docs, "text", "doc_id")
    val surv = spans
      .filter(col("kept_tokens") * 2 >= col("n_tokens") && col("clean_text") =!= "")
      .select(col("doc_id"), col("clean_text"))
    graft.operators.LangModel
      .hashClassifierScore(surv, textCol = "clean_text")
      .filter(col("keep"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("score")).as("score_sum"))
  }

  /** q266: TEXTRANK keyword extraction (Mihalcea & Tarau 2004) — the
    * graph-centrality ranker the frequency rankers (q73 top terms,
    * q65 tf-idf) can't express: a word matters because IMPORTANT
    * words co-occur with it, not because it is frequent. Composition
    * of two proven machineries: q82's adjacent-bigram graph (distinct
    * unordered co-occurrence edges, self-pairs dropped) feeds q124's
    * exact INTEGER PageRank (3 iterations, damping 0.85 as the 8500
    * basis-point integral form — FP PageRank cannot hash-oracle
    * because inflow addition order moves ulps; the integer form is
    * bit-stable on any layout and engine). Words key as the q109
    * engine-portable polynomial hash (8-byte join keys, no string
    * shuffles through the iteration), mapped back to terms only for
    * the 10-row answer.
    *
    * Scale shape: the bigram explode is the corpus scan; everything
    * after runs at VOCABULARY grain (edges ≤ distinct adjacent
    * pairs), and each iteration is one equi-join + map-side-combined
    * sum on the checkpointed edge list — the q261/q124 argument:
    * iteration cost tracks the aggregated graph, never the corpus. */
  val textrankKeywords: Q = Q(
    "q266_textrank_keywords",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(ws)), i ->
      |        struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
      |      FROM w WHERE len(ws) >= 2),
      |bg2 AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b WHERE bg.w1 <> bg.w2),
      |dict AS (SELECT w, list_reduce(
      |           list_prepend(CAST(7 AS BIGINT),
      |             list_transform(range(1, length(w) + 1),
      |               i -> CAST(unicode(substr(w, i, 1)) AS BIGINT))),
      |           (acc, c) -> (acc * 131 + c) % 35184372088777) AS tid
      |         FROM (SELECT DISTINCT unnest(ws) AS w FROM w) t),
      |e0 AS (SELECT DISTINCT a.tid AS src, c.tid AS dst
      |       FROM bg2 JOIN dict a ON bg2.w1 = a.w
      |                JOIN dict c ON bg2.w2 = c.w),
      |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |od AS (SELECT src, count(*) AS d FROM e GROUP BY src),
      |nd AS (SELECT DISTINCT src AS id FROM e),
      |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nd),
      |p1 AS (SELECT nd.id, 150000 + coalesce(s.inflow, 0) AS pr
      |       FROM nd LEFT JOIN (
      |         SELECT e.dst AS id, sum((8500 * p0.pr) // (10000 * od.d)) AS inflow
      |         FROM e JOIN od USING (src) JOIN p0 ON p0.id = e.src
      |         GROUP BY e.dst) s USING (id)),
      |p2 AS (SELECT nd.id, 150000 + coalesce(s.inflow, 0) AS pr
      |       FROM nd LEFT JOIN (
      |         SELECT e.dst AS id, sum((8500 * p1.pr) // (10000 * od.d)) AS inflow
      |         FROM e JOIN od USING (src) JOIN p1 ON p1.id = e.src
      |         GROUP BY e.dst) s USING (id)),
      |p3 AS (SELECT nd.id, 150000 + coalesce(s.inflow, 0) AS pr
      |       FROM nd LEFT JOIN (
      |         SELECT e.dst AS id, sum((8500 * p2.pr) // (10000 * od.d)) AS inflow
      |         FROM e JOIN od USING (src) JOIN p2 ON p2.id = e.src
      |         GROUP BY e.dst) s USING (id))
      |SELECT d.w AS term, CAST(p3.pr AS BIGINT) AS pr
      |FROM p3 JOIN dict d ON p3.id = d.tid
      |ORDER BY pr DESC, term ASC LIMIT 10""".stripMargin
  ) { (s, dir) =>
    val E = graft.functions.expressions.GraftExpressions
    val ws = t(s, dir, "documents").select(split(col("text"), " ").as("ws"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), " +
          "(w, i) -> struct(w AS w1, element_at(ws, i + 2) AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    val dict = ws.select(explode(col("ws")).as("w")).distinct()
      .select(col("w"),
        element_at(E.shingleHashes(array(col("w")), 1, ordered = false,
          poly = true), 1).as("tid"))
      .localCheckpoint(true)
    // pin e0 (the corpus-scale bigram⋈dict⋈dict distinct): the
    // symmetric union scans it twice; pin edges too — integerPageRank
    // scans its input twice (weighted-edge build + node set), which
    // would re-run the union+distinct (r14 optimization: q266 profile)
    val e0 = bg
      .join(dict.select(col("w").as("w1"), col("tid").as("src")), Seq("w1"))
      .join(dict.select(col("w").as("w2"), col("tid").as("dst")), Seq("w2"))
      .select("src", "dst").distinct()
      .localCheckpoint(true)
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    graft.operators.Centrality.integerPageRank(edges, iters = 3)
      .join(dict.select(col("tid").as("id"), col("w").as("term")), Seq("id"))
      .select(col("term"), col("pr").cast("long").as("pr"))
      .orderBy(col("pr").desc, col("term").asc)
      .limit(10)
  }

  /** q279: DUNNING G² collocation significance (Dunning 1993) — the
    * log-likelihood-ratio test q82's lift ranking lacks: lift says a
    * bigram is surprising, G² says whether the evidence is SUFFICIENT
    * (a 2-occurrence pair can have huge lift and no significance —
    * exactly the sparse-count regime chi-square/lift mislead in, which
    * is why collocation extraction standardized on G²). Per adjacent
    * bigram: the 2×2 table (k11 = pair count against the
    * first-word/second-word margins over all B bigram slots), G² =
    * 2Σ k·ln(k·B/(row·col)) with empty cells contributing zero. Each
    * cell's term micro-quantizes from exact BIGINT counts before the
    * order-immune sum (the q194 chi-square discipline on the LLR
    * statistic). Same ≥5-occurrence floor as q82. */
  val dunningG2: Q = Q(
    "q279_collocations_g2",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(ws)), i ->
      |        struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
      |      FROM w WHERE len(ws) >= 2),
      |bg2 AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b),
      |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
      |       FROM bg2 GROUP BY 1, 2 HAVING count(*) >= 5),
      |r1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS r FROM bg2 GROUP BY 1),
      |c1 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c FROM bg2 GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bg2),
      |cells AS (SELECT c2.w1, c2.w2, c2.k11,
      |            r1.r - c2.k11 AS k12, c1.c - c2.k11 AS k21,
      |            tot.bb - r1.r - c1.c + c2.k11 AS k22,
      |            r1.r AS r, c1.c AS c, tot.bb AS bb
      |          FROM c2 JOIN r1 USING (w1) JOIN c1 USING (w2) CROSS JOIN tot)
      |SELECT w1, w2, k11,
      |  CAST(round(2000000.0 * k11
      |      * ln(CAST(k11 AS DOUBLE) * bb / (CAST(r AS DOUBLE) * c)))
      |      AS BIGINT)
      |  + CASE WHEN k12 = 0 THEN 0 ELSE
      |      CAST(round(2000000.0 * k12
      |        * ln(CAST(k12 AS DOUBLE) * bb
      |            / (CAST(r AS DOUBLE) * (bb - c)))) AS BIGINT) END
      |  + CASE WHEN k21 = 0 THEN 0 ELSE
      |      CAST(round(2000000.0 * k21
      |        * ln(CAST(k21 AS DOUBLE) * bb
      |            / (CAST(bb - r AS DOUBLE) * c))) AS BIGINT) END
      |  + CASE WHEN k22 = 0 THEN 0 ELSE
      |      CAST(round(2000000.0 * k22
      |        * ln(CAST(k22 AS DOUBLE) * bb
      |            / (CAST(bb - r AS DOUBLE) * (bb - c)))) AS BIGINT) END
      |  AS g2_u6
      |FROM cells""".stripMargin
  ) { (s, dir) =>
    val ws = t(s, dir, "documents").select(split(col("text"), " ").as("ws"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), " +
          "(w, i) -> struct(w AS w1, element_at(ws, i + 2) AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
      .filter(col("k11") >= 5)
    val r1 = bg.groupBy("w1").agg(count(lit(1)).as("r"))
    val c1 = bg.groupBy("w2").agg(count(lit(1)).as("c"))
    val tot = bg.agg(count(lit(1)).as("bb"))
    c2.join(r1, Seq("w1")).join(c1, Seq("w2")).crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("k11"),
        (col("r") - col("k11")).as("k12"), (col("c") - col("k11")).as("k21"),
        expr("bb - r - c + k11").as("k22"), col("r"), col("c"), col("bb"))
      .select(col("w1"), col("w2"), col("k11"),
        (expr("CAST(round(2000000.0 * k11 " +
          "* ln(CAST(k11 AS DOUBLE) * bb / (CAST(r AS DOUBLE) * c))) " +
          "AS BIGINT)")
          + expr("CASE WHEN k12 = 0 THEN 0L ELSE " +
            "CAST(round(2000000.0 * k12 * ln(CAST(k12 AS DOUBLE) * bb " +
            "/ (CAST(r AS DOUBLE) * (bb - c)))) AS BIGINT) END")
          + expr("CASE WHEN k21 = 0 THEN 0L ELSE " +
            "CAST(round(2000000.0 * k21 * ln(CAST(k21 AS DOUBLE) * bb " +
            "/ (CAST(bb - r AS DOUBLE) * c))) AS BIGINT) END")
          + expr("CASE WHEN k22 = 0 THEN 0L ELSE " +
            "CAST(round(2000000.0 * k22 * ln(CAST(k22 AS DOUBLE) * bb " +
            "/ (CAST(bb - r AS DOUBLE) * (bb - c)))) AS BIGINT) END"))
          .as("g2_u6"))
  }

  /** q280: WILSON SCORE INTERVALS for the per-source quality-pass
    * rate — the proportion CI that stays honest at small n where the
    * naive normal interval escapes [0, 1] (the reason ranking UIs
    * standardized on Wilson's lower bound): with p̂ = k/n and
    * z = 1.96, bounds = (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) /
    * (1 + z²/n). The gate is q257's stopword flag (20·stops ≥
    * tokens); k and n are exact BIGINTs from one source-grain pass,
    * the point rate is an exact ppm floor, and each bound is ONE
    * fixed-shape double expression with literal constants (3.8416 =
    * z² etc. — identical decimal literals parse to identical doubles
    * on both engines). A small-n source's lower bound visibly
    * collapses toward 0 — the number a mixture designer ranks by
    * instead of the raw rate. */
  val wilsonIntervals: Q = Q(
    "q280_wilson_intervals",
    """WITH d AS (SELECT source,
      |             CASE WHEN 20 * len(list_filter(string_split(text, ' '),
      |                    w -> w IN ('the', 'a', 'of', 'and', 'to')))
      |                  >= len(string_split(text, ' '))
      |               THEN 1 ELSE 0 END AS y
      |           FROM documents),
      |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(y) AS BIGINT) AS k
      |      FROM d GROUP BY 1)
      |SELECT source, n, k, 1000000 * k // n AS rate_ppm,
      |  CAST(round(1000000.0
      |    * ((CAST(k AS DOUBLE) / n + 1.9208 / n
      |        - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
      |            * (1 - CAST(k AS DOUBLE) / n) / n
      |            + 0.9604 / (CAST(n AS DOUBLE) * n)))
      |       / (1 + 3.8416 / n))) AS BIGINT) AS wilson_lo_ppm,
      |  CAST(round(1000000.0
      |    * ((CAST(k AS DOUBLE) / n + 1.9208 / n
      |        + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
      |            * (1 - CAST(k AS DOUBLE) / n) / n
      |            + 0.9604 / (CAST(n AS DOUBLE) * n)))
      |       / (1 + 3.8416 / n))) AS BIGINT) AS wilson_hi_ppm
      |FROM s""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("source"),
        when(expr("20 * size(filter(split(text, ' '), " +
          "w -> w IN ('the', 'a', 'of', 'and', 'to'))) " +
          ">= size(split(text, ' '))"), 1L).otherwise(0L).as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      .select(col("source"), col("n"), col("k"),
        expr("1000000 * k div n").as("rate_ppm"),
        expr("CAST(round(1000000.0 " +
          "* ((CAST(k AS DOUBLE) / n + 1.9208 / n " +
          "- 1.96 * sqrt((CAST(k AS DOUBLE) / n) " +
          "* (1 - CAST(k AS DOUBLE) / n) / n " +
          "+ 0.9604 / (CAST(n AS DOUBLE) * n))) " +
          "/ (1 + 3.8416 / n))) AS BIGINT)").as("wilson_lo_ppm"),
        expr("CAST(round(1000000.0 " +
          "* ((CAST(k AS DOUBLE) / n + 1.9208 / n " +
          "+ 1.96 * sqrt((CAST(k AS DOUBLE) / n) " +
          "* (1 - CAST(k AS DOUBLE) / n) / n " +
          "+ 0.9604 / (CAST(n AS DOUBLE) * n))) " +
          "/ (1 + 3.8416 / n))) AS BIGINT)").as("wilson_hi_ppm"))
  }

  /** q284: RANKER DISAGREEMENT — q268's exact-dyadic RBO applied to
    * the two keyword rankers: does graph centrality (q266 TextRank)
    * actually order terms differently from raw frequency (q73), and
    * at which depths? The answer calibrates whether the more
    * expensive ranker earns its cost — identical top ranks mean
    * frequency suffices, early divergence means centrality sees
    * structure counting misses. Both rankings are deterministic total
    * orders (pr desc / cnt desc, term tiebreak); every depth term is
    * the exact dyadic ov(d)/(d·2^d) — integer floor division, no
    * transcendentals. The TextRank leg reuses q266's unrolled
    * integer-PageRank oracle verbatim; everything after the corpus
    * scans runs at vocabulary grain. */
  val rankerRbo: Q = Q(
    "q284_keyword_ranker_rbo",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(ws)), i ->
      |        struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
      |      FROM w WHERE len(ws) >= 2),
      |bg2 AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b WHERE bg.w1 <> bg.w2),
      |dict AS (SELECT w, list_reduce(
      |           list_prepend(CAST(7 AS BIGINT),
      |             list_transform(range(1, length(w) + 1),
      |               i -> CAST(unicode(substr(w, i, 1)) AS BIGINT))),
      |           (acc, c) -> (acc * 131 + c) % 35184372088777) AS tid
      |         FROM (SELECT DISTINCT unnest(ws) AS w FROM w) t),
      |e0 AS (SELECT DISTINCT a.tid AS src, c.tid AS dst
      |       FROM bg2 JOIN dict a ON bg2.w1 = a.w
      |                JOIN dict c ON bg2.w2 = c.w),
      |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |od AS (SELECT src, count(*) AS d FROM e GROUP BY src),
      |nd AS (SELECT DISTINCT src AS id FROM e),
      |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nd),
      |p1 AS (SELECT nd.id, 150000 + coalesce(s.inflow, 0) AS pr
      |       FROM nd LEFT JOIN (
      |         SELECT e.dst AS id, sum((8500 * p0.pr) // (10000 * od.d)) AS inflow
      |         FROM e JOIN od USING (src) JOIN p0 ON p0.id = e.src
      |         GROUP BY e.dst) s USING (id)),
      |p2 AS (SELECT nd.id, 150000 + coalesce(s.inflow, 0) AS pr
      |       FROM nd LEFT JOIN (
      |         SELECT e.dst AS id, sum((8500 * p1.pr) // (10000 * od.d)) AS inflow
      |         FROM e JOIN od USING (src) JOIN p1 ON p1.id = e.src
      |         GROUP BY e.dst) s USING (id)),
      |p3 AS (SELECT nd.id, 150000 + coalesce(s.inflow, 0) AS pr
      |       FROM nd LEFT JOIN (
      |         SELECT e.dst AS id, sum((8500 * p2.pr) // (10000 * od.d)) AS inflow
      |         FROM e JOIN od USING (src) JOIN p2 ON p2.id = e.src
      |         GROUP BY e.dst) s USING (id)),
      |tr AS (SELECT d.w AS term, p3.pr FROM p3 JOIN dict d ON p3.id = d.tid
      |       ORDER BY p3.pr DESC, term ASC LIMIT 10),
      |ra AS (SELECT term, CAST(row_number() OVER (ORDER BY pr DESC, term)
      |         AS BIGINT) AS rk FROM tr),
      |fq AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
      |       FROM (SELECT unnest(ws) AS term FROM w) t
      |       GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT 10),
      |rb AS (SELECT term, CAST(row_number() OVER (ORDER BY cnt DESC, term)
      |         AS BIGINT) AS rk FROM fq),
      |c AS (SELECT ra.term, greatest(ra.rk, rb.rk) AS md
      |      FROM ra JOIN rb USING (term)),
      |dep AS (SELECT CAST(g.d AS BIGINT) AS d FROM generate_series(1, 10) g(d))
      |SELECT dep.d, CAST(count(c.term) AS BIGINT) AS ov,
      |       (1000000 * CAST(count(c.term) AS BIGINT))
      |         // (dep.d * (CAST(1 AS BIGINT) << dep.d)) AS term_u6
      |FROM dep LEFT JOIN c ON c.md <= dep.d
      |GROUP BY dep.d""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Ranks
    // leg A: q266's TextRank top-10 (the registered machinery verbatim)
    val tr = textrankKeywords.fn(s, dir)
    val ra = Ranks.globalRunningSums(tr,
      Seq(col("pr").desc, col("term").asc), Seq(lit(1L) -> "rk"))
      .select("term", "rk")
    // leg B: q73-shape frequency top-10
    val fq = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(10)
    val rb = Ranks.globalRunningSums(fq,
      Seq(col("cnt").desc, col("term").asc), Seq(lit(1L) -> "rk"))
      .select("term", "rk")
    val c = ra.join(rb.withColumnRenamed("rk", "rk_b"), Seq("term"))
      .select(col("term"), greatest(col("rk"), col("rk_b")).as("md"))
    s.range(1, 11).toDF("d")
      .join(broadcast(c), col("md") <= col("d"), "left")
      .groupBy("d").agg(count(col("term")).as("ov"))
      .select(col("d"), col("ov"),
        expr("(1000000 * ov) div (d * shiftleft(1L, cast(d AS int)))")
          .as("term_u6"))
  }

  /** q273: VOCABULARY RICHNESS — Good-Turing unseen mass and the
    * bias-corrected Chao1 richness estimate per source, the coverage
    * numbers that answer "how much vocabulary has this source NOT
    * shown yet" next to q248's growth curve and q150/q249's coverage
    * of what HAS been seen. From the frequency-of-frequencies: unseen
    * mass ≈ N₁/N (Good-Turing's leave-one-out argument) and
    * Chao1 = V + N₁(N₁−1)/(2(N₂+1)) (the bias-corrected form, defined
    * even at N₂ = 0). Everything is exact BIGINT counts and two
    * nonnegative floor divisions — no estimator randomness, full
    * hash oracle. One term-grain aggregation then a source-grain
    * rollup of the counts-of-counts; map-side combine on both. */
  val vocabRichness: Q = Q(
    "q273_vocab_richness",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
      |       FROM w GROUP BY 1, 2),
      |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
      |        CAST(count(*) AS BIGINT) AS v_obs,
      |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |        CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |      FROM tc GROUP BY 1)
      |SELECT source, n_tok, v_obs, n1, n2,
      |       1000000 * n1 // n_tok AS unseen_ppm,
      |       v_obs + (n1 * (n1 - 1)) // (2 * (n2 + 1)) AS chao1
      |FROM s""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("v_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("n_tok"), col("v_obs"), col("n1"),
        col("n2"),
        expr("1000000 * n1 div n_tok").as("unseen_ppm"),
        expr("v_obs + (n1 * (n1 - 1)) div (2 * (n2 + 1))").as("chao1"))
  }

  val all: Seq[Q] = Seq(editDedup, corpusCube, tokenTruncate, funnel,
    collocations, containment, dupRateBySource, gapFilledSeries,
    lengthTrim, oovRate, splitLeakage, lmQualitySelect, boilerplate,
    dupClusterHistogram, tokenBudgetSample, retentionCohorts,
    lexicalDiversity, chunkDupBySource, effectiveTokens, temperatureMix,
    normDedup, epochPlan, sourceKl, crossSourceDupMatrix,
    tokenLengthHistogram, zipfSlope, splitBalance, budgetSweep,
    dupSpanStrip, spanRateBySource, bloomDecontaminate, contaminationAudit,
    hashClassifier, corpusPipelineV3, textrankKeywords, vocabRichness,
    dunningG2, wilsonIntervals, rankerRbo)
}
