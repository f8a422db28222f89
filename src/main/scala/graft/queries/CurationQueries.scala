package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Linkage, Sampling}
import graft.sources.Tables

/** Round-8 audit/curation additions: integer-exact rolling anomaly
  * detection on ingest rates (the drift alarm a pipeline pages on),
  * cross-table blocked record linkage (entity resolution between two
  * catalogs), leakage-proof cluster-respecting split assignment (the
  * CONSTRUCTIVE fix to the contamination q89 merely audits), and
  * quality-aware canonical selection (keep the best dup-cluster
  * member, not the lowest-id one).
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Rolling-window rate anomaly detection (q131): per event type,
    * flag days whose event count deviates from the trailing 7-day
    * window by more than 2 sigma — the ingest-rate alarm that pages
    * before a collapsed crawl or a runaway duplicate storm trains
    * (SnapshotDiff catches it between versions; this catches it
    * day-by-day). The z-test runs in EXACT integer arithmetic:
    * z² > 4 over the 7 trailing counts rewrites to
    * (7n − S)² > 4·(7·SS − S²) with S = Σx, SS = Σx² — no float
    * mean/stddev, so the flag is bit-reproducible on any layout and
    * any engine (FP stddev is shuffle-order-dependent; this isn't).
    *
    * Scale shape: the daily rollup is one combiner-compressed
    * aggregation of the event stream; the window then runs over the
    * per-(type, day) SERIES, whose length is bounded by the calendar
    * (a decade is ~3,650 rows per type), never by event volume — the
    * one place a partitioned window is the right tool because the
    * windowed data is structurally tiny. Warm-up days (fewer than 7
    * predecessors) are excluded, not flagged. */
  val rateAnomaly: Q = Q(
    "q131_rate_anomaly",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT day, event_type, n,
      |        CAST(sum(n) OVER tw AS BIGINT) AS s,
      |        CAST(sum(n * n) OVER tw AS BIGINT) AS ss,
      |        count(*) OVER tw AS k
      |      FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, event_type, n, s AS trail_sum,
      |       (7 * n - s) AS dev7
      |FROM w
      |WHERE k = 7
      |  AND (7 * n - s) * (7 * n - s) > 4 * (7 * ss - s * s)""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Monitoring
    Monitoring.rateAnomalies(
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n")))
  }

  /** Cross-table record linkage (q132): match suppliers to customers
    * by fuzzy NAME similarity, blocked on the shared numeric suffix —
    * the entity-resolution shape (two catalogs, no shared key, block
    * cheap / verify exact) that [[graft.operators.Linkage]] provides.
    * Block = last 9 name characters (the entity number); verify =
    * threshold levenshtein ≤ 6 over the full names ("Customer#" vs
    * "Supplier#" differ by 5 substitutions, so true same-number pairs
    * survive and nothing else can — the block guarantees the digits
    * agree). The only join is the block equi-join, df-capped on both
    * sides; the O(len·maxEd) verify runs per candidate, never per
    * cross-product row. */
  val recordLinkage: Q = Q(
    "q132_record_linkage",
    """SELECT c.c_custkey AS cust_key, s.s_suppkey AS supp_key,
      |       CAST(levenshtein(c.c_name, s.s_name) AS BIGINT) AS edit_dist
      |FROM customer c JOIN supplier s
      |  ON right(c.c_name, 9) = right(s.s_name, 9)
      |WHERE levenshtein(c.c_name, s.s_name) <= 6""".stripMargin
  ) { (s, dir) =>
    val cust = Linkage.side(t(s, dir, "customer"), "c_custkey", "c_name",
      substring(col("c_name"), -9, 9))
    val supp = Linkage.side(t(s, dir, "supplier"), "s_suppkey", "s_name",
      substring(col("s_name"), -9, 9))
    Linkage.blockedLink(cust, supp, maxEd = 6, maxDf = 100)
      .select(col("lid").as("cust_key"), col("rid").as("supp_key"),
        col("edit_dist"))
  }

  /** Leakage-proof split assignment (q133): hash-split by the CLUSTER
    * canonical id, not the document id — every member of a near-dup
    * cluster lands in the same train/valid/test split BY CONSTRUCTION,
    * closing the contamination channel q89 audits (a per-doc hash
    * split puts ~2·p·(1−p) of each dup cluster's pairs across a
    * boundary; this puts zero). Composes the audited q27 candidate
    * machinery + q44's pointer-doubling resolution; clusterless
    * documents fall back to their own id, so the assignment remains a
    * total function and singletons are distributed exactly as q57's
    * plain split would. The split is a pure projection of the
    * canonical id — resolution is the only cost, and the corpus-sized
    * join is the one left join attaching labels to ids. */
  val clusterSplit: Q = Q(
    "q133_cluster_split",
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
      |lab AS (SELECT id AS doc_id, least(id, min(r)) AS canonical_id
      |        FROM reach GROUP BY id)
      |SELECT d.doc_id,
      |       coalesce(lab.canonical_id, d.doc_id) AS canonical_id,
      |       CASE WHEN CAST('0x' || substr(md5(CAST(
      |                coalesce(lab.canonical_id, d.doc_id) AS VARCHAR)), 1, 8)
      |                 AS BIGINT) % 100 < 80 THEN 'train'
      |            WHEN CAST('0x' || substr(md5(CAST(
      |                coalesce(lab.canonical_id, d.doc_id) AS VARCHAR)), 1, 8)
      |                 AS BIGINT) % 100 < 90 THEN 'valid'
      |            ELSE 'test' END AS split
      |FROM documents d LEFT JOIN lab USING (doc_id)""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val labels = Dedup.resolve(Dedup.jaccardPairs(
      Dedup.shingleProjection(docs, "text", "doc_id"),
      threshold = 0.5, maxDf = 1000))
    docs.select("doc_id").join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("split", Sampling.splitColumn(col("canonical_id")))
  }

  /** Quality-aware canonical selection (q134): per near-dup cluster,
    * keep the LONGEST member (ties to the lowest id) instead of
    * [[Dedup.resolve]]'s lowest-id winner — the curation policy real
    * pipelines want, because the lowest-id copy is often the
    * truncated or boilerplate-wrapped one and the longest retains the
    * most content. The arg-max is `TopKByScore` at k=1 (score = char
    * count descending, doc_id ascending on ties — deterministic): it
    * partially aggregates map-side in an ObjectHashAggregate, one
    * (score, id) pair per cluster per task crossing the wire. The
    * built-in alternatives both lose the hash aggregate here —
    * `max(struct)` and `max_by(_, struct)` carry a struct buffer,
    * which isn't hash-mutable, so Catalyst falls back to
    * SortAggregate's per-partition sort. Cluster membership comes
    * from the same resolution pass as q44/q133. */
  val qualityCanonical: Q = Q(
    "q134_quality_canonical",
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
      |lab AS (SELECT id AS doc_id, least(id, min(r)) AS canonical_id
      |        FROM reach GROUP BY id),
      |m AS (SELECT lab.canonical_id, lab.doc_id, d.n_chars
      |      FROM lab JOIN documents d USING (doc_id)),
      |b AS (SELECT canonical_id, max(n_chars) AS best_chars,
      |             count(*) AS n_members
      |      FROM m GROUP BY 1)
      |SELECT b.canonical_id, min(m.doc_id) AS best_id,
      |       b.best_chars, b.n_members
      |FROM m JOIN b ON m.canonical_id = b.canonical_id
      |             AND m.n_chars = b.best_chars
      |GROUP BY 1, 3, 4""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val labels = Dedup.resolve(Dedup.jaccardPairs(
      Dedup.shingleProjection(docs, "text", "doc_id"),
      threshold = 0.5, maxDf = 1000))
    import graft.functions.expressions.{GraftExpressions => E}
    labels.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy("canonical_id")
      .agg(E.topKByScore(col("n_chars").cast("double"), col("doc_id"), 1)
          .as("tk"),
        max(col("n_chars")).as("best_chars"),
        count(lit(1)).as("n_members"))
      .select(col("canonical_id"),
        element_at(col("tk"), 1).getField("id").as("best_id"),
        col("best_chars"), col("n_members"))
  }

  /** SimHash threshold calibration (q135): for every candidate pair
    * the exact-Jaccard generator finds at a LOW threshold (0.3 — wide
    * net on purpose), bucket by the Hamming distance of the pair's
    * 45-bit polynomial SimHash signatures and report pair count +
    * mean exact Jaccard per bucket — the calibration curve that
    * answers "which Hamming cutoff equals Jaccard 0.8 on MY corpus"
    * before anyone flips q29's production threshold. Composes two
    * audited families (q27 candidates, q61 signatures); per-pair
    * Jaccard quantizes to integer ppm before the rollup, so the mean
    * is an identical exact-int-then-divide chain in both engines.
    * Costs one signature projection joined onto the pair endpoints —
    * pair-sized, not corpus-sized. */
  val simhashCalibration: Q = Q(
    "q135_simhash_calibration",
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
      |        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.3),
      |h AS (SELECT doc_id,
      |        unnest(list_transform(ws, s -> list_reduce(
      |          list_prepend(CAST(7 AS BIGINT),
      |            list_transform(range(1, length(s) + 1),
      |              i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))),
      |          (acc, c) -> (acc * 131 + c) % 35184372088777))) AS h
      |      FROM w),
      |v AS (SELECT doc_id, b, sum(((h >> b) & 1) * 2 - 1) AS vote
      |      FROM h, (SELECT unnest(range(0, 45)) AS b) bits
      |      GROUP BY 1, 2),
      |sig AS (SELECT doc_id,
      |          CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b
      |                        ELSE 0 END) AS BIGINT) AS s45
      |        FROM v GROUP BY doc_id)
      |SELECT CAST(bit_count(xor(sa.s45, sb.s45)) AS BIGINT) AS hamming,
      |       count(*) AS n_pairs,
      |       CAST(sum(CAST(round(jaccard * 1000000) AS BIGINT)) AS DOUBLE)
      |         / 1000000 / count(*) AS avg_jaccard
      |FROM jac JOIN sig sa ON jac.doc_a = sa.doc_id
      |         JOIN sig sb ON jac.doc_b = sb.doc_id
      |GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val pairs = Dedup.jaccardPairs(
      Dedup.shingleProjection(docs, "text", "doc_id"),
      threshold = 0.3, maxDf = 1000)
    val sig = Dedup.polySimhash45(docs, "text", "doc_id")
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("simhash45").as("sa")),
        "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash45").as("sb")),
        "doc_b")
      .select(expr("cast(bit_count(sa ^ sb) as bigint)").as("hamming"),
        round(col("jaccard") * 1000000).cast("long").as("jppm"))
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"), sum(col("jppm")).as("sppm"))
      .select(col("hamming"), col("n_pairs"),
        (col("sppm").cast("double") / 1000000 / col("n_pairs"))
          .as("avg_jaccard"))
  }

  /** Per-entity quota cap (q136): keep each user's first 3 events per
    * day — the rate-limit / spam-cap primitive (bot storms, runaway
    * clients, per-author contribution caps in a crawl). Ranking runs
    * on the bounded `TopKByScore` heap with score = −epoch-µs (ties
    * to the lowest event id), so each map task ships at most 3 rows
    * per (user, day) group and no window ever sees the full event
    * volume — the per-group-bounded shape `row_number().over(...)`
    * windows lack. µs precision matches the oracle's TIMESTAMP
    * exactly (nanos would overflow the double's 2⁵³ integer range;
    * epoch-µs ≈ 1.7·10¹⁵ stays exact). */
  val eventQuota: Q = Q(
    "q136_event_quota",
    """WITH r AS (SELECT user_id, CAST(ts AS DATE) AS day, event_id,
      |             row_number() OVER (
      |               PARTITION BY user_id, CAST(ts AS DATE)
      |               ORDER BY epoch_us(ts), event_id) AS rk
      |           FROM events)
      |SELECT user_id, day, CAST(rk AS BIGINT) AS rk, event_id
      |FROM r WHERE rk <= 3""".stripMargin
  ) { (s, dir) =>
    import graft.functions.expressions.{GraftExpressions => E}
    t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_id"),
        expr("ts_ns div 1000").as("us"))
      .groupBy("user_id", "day")
      .agg(E.topKByScore((-col("us")).cast("double"), col("event_id"), 3)
        .as("tk"))
      .select(col("user_id"), col("day"),
        posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("user_id"), col("day"),
        (col("pos") + 1).cast("long").as("rk"), col("p.id").as("event_id"))
  }

  /** Readability scoring per source (q137): Flesch reading-ease over
    * the classic integer proxies — syllables ≈ vowel-group runs (min 1
    * per word), sentences ≈ terminator characters (min 1 per doc) —
    * the grade-level quality feature a curation mix reads next to
    * q66's LM perplexity (they disagree exactly on the interesting
    * docs: fluent-but-dense vs simple-but-garbled). Per-doc scores
    * quantize to milli-points BEFORE the per-source mean, so the
    * rollup sums exact integers (double sums are shuffle-order-
    * dependent; this isn't). The vowel-run count is one
    * `regexp_extract_all` per word inside a HOF over the word array —
    * rides the scan, no extra shuffle beyond the source rollup. */
  val readability: Q = Q(
    "q137_readability",
    """WITH d AS (SELECT source, string_split(text, ' ') AS ws,
      |             greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
      |               AS n_sent
      |           FROM documents),
      |m AS (SELECT source,
      |        CAST(len(ws) AS BIGINT) AS n_words, n_sent,
      |        CAST(list_sum(list_transform(ws, w -> greatest(1,
      |          CAST(len(regexp_extract_all(lower(w), '[aeiou]+')) AS BIGINT))))
      |          AS BIGINT) AS n_syll
      |      FROM d WHERE len(ws) > 0),
      |f AS (SELECT source,
      |        CAST(round((206.835
      |          - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
      |          - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)) * 1000)
      |          AS BIGINT) AS fk
      |      FROM m)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(fk) AS BIGINT) AS sum_fk_milli,
      |       CAST(sum(fk) AS DOUBLE) / 1000 / count(*) AS avg_flesch
      |FROM f GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    import graft.functions.{TextFunctions => T}
    val d = t(s, dir, "documents")
      .select(col("source"), T.words(col("text")).as("ws"),
        greatest(lit(1),
          length(regexp_replace(col("text"), "[^.!?]", ""))).as("n_sent"))
      .filter(size(col("ws")) > 0)
      .select(col("source"), size(col("ws")).cast("long").as("n_words"),
        col("n_sent"),
        aggregate(
          transform(col("ws"), w => greatest(lit(1L),
            size(regexp_extract_all(lower(w), lit("[aeiou]+"), lit(0)))
              .cast("long"))),
          lit(0L), (acc, x) => acc + x).as("n_syll"))
    d.select(col("source"),
        round((lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sent"))
          - lit(84.6) * (col("n_syll").cast("double") / col("n_words")))
          * 1000).cast("long").as("fk"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("fk")).as("sum_fk_milli"))
      .select(col("source"), col("n_docs"), col("sum_fk_milli"),
        (col("sum_fk_milli").cast("double") / 1000 / col("n_docs"))
          .as("avg_flesch"))
  }

  /** Event-transition matrix (q138): first-order Markov statistics
    * over each user's time-ordered event stream — (previous type →
    * current type) counts and integer-ppm conditional probabilities,
    * the session-model a product-analytics layer fits (and the event
    * analogue of q65's word-bigram LM). The lag window partitions by
    * USER — per-partition volume is one user's own activity, bounded
    * by behavior, never by corpus growth (the same bounded-partition
    * class as q136's groups) — and the transition rollup + row totals
    * are two combiner-compressed aggregations joined on the 25-row
    * type-pair table. p_ppm is exact integer division. */
  val eventTransitions: Q = Q(
    "q138_event_transitions",
    """WITH o AS (SELECT user_id, event_type,
      |             lag(event_type) OVER (PARTITION BY user_id
      |               ORDER BY epoch_us(ts), event_id) AS prev
      |           FROM events),
      |c AS (SELECT prev, event_type AS curr, count(*) AS n_trans
      |      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev, sum(n_trans) AS tt FROM c GROUP BY 1)
      |SELECT c.prev, c.curr, c.n_trans,
      |       CAST(c.n_trans * 1000000 // tot.tt AS BIGINT) AS p_ppm
      |FROM c JOIN tot ON c.prev = tot.prev""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val o = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
    val c = o.groupBy(col("prev"), col("event_type").as("curr"))
      .agg(count(lit(1)).as("n_trans"))
    val tot = c.groupBy("prev").agg(sum(col("n_trans")).as("tt"))
    c.join(tot, Seq("prev"))
      .select(col("prev"), col("curr"), col("n_trans"),
        expr("n_trans * 1000000 div tt").as("p_ppm"))
  }

  /** Data-validation report (q139): the Deequ-style constraint gate a
    * pipeline runs on every ingested batch BEFORE anything downstream
    * trains — null keys, domain violations, range breaches, primary-
    * key duplication, and foreign-key orphans, as one report row per
    * check. Scale shape: all row-local checks evaluate in ONE
    * combiner-compressed aggregation pass over the fact table (each
    * check is a `sum(when(...))` column — the scan is paid once, not
    * per check); PK duplication is the same pass's two-phase distinct
    * count; the FK check is one left-anti probe of the id projection
    * against the (broadcastable) orders key set. The report is
    * check-count-sized — a dashboard row, not data. */
  val dataValidation: Q = Q(
    "q139_data_validation",
    """WITH m AS (SELECT
      |    count(*) AS n,
      |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS null_key,
      |    CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
      |    CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS neg_price,
      |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag,
      |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_pk
      |  FROM lineitem),
      |fk AS (SELECT CAST(count(*) AS BIGINT) AS orphans
      |       FROM lineitem l
      |       WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                         WHERE o.o_orderkey = l.l_orderkey))
      |SELECT c.chk AS chk, m.n AS n_checked, c.v AS n_violations
      |FROM m, fk, LATERAL (VALUES
      |  ('null_orderkey', m.null_key),
      |  ('quantity_range', m.bad_qty),
      |  ('discount_range', m.bad_disc),
      |  ('negative_price', m.neg_price),
      |  ('returnflag_domain', m.bad_flag),
      |  ('duplicate_pk', m.dup_pk),
      |  ('orderkey_fk_orphans', fk.orphans)) AS c(chk, v)""".stripMargin
  ) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    def viol(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val m = li.agg(
      count(lit(1)).as("n"),
      viol(col("l_orderkey").isNull).as("null_key"),
      viol(col("l_quantity") <= 0 || col("l_quantity") > 50).as("bad_qty"),
      viol(col("l_discount") < 0 || col("l_discount") > 1).as("bad_disc"),
      viol(col("l_extendedprice") < 0).as("neg_price"),
      viol(!col("l_returnflag").isin("A", "N", "R")).as("bad_flag"),
      (count(lit(1)) -
        countDistinct(struct(col("l_orderkey"), col("l_linenumber"))))
        .as("dup_pk"))
    val fk = li.select(col("l_orderkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    m.crossJoin(broadcast(fk))
      .select(col("n"), explode(array(
        struct(lit("null_orderkey").as("chk"), col("null_key").as("v")),
        struct(lit("quantity_range").as("chk"), col("bad_qty").as("v")),
        struct(lit("discount_range").as("chk"), col("bad_disc").as("v")),
        struct(lit("negative_price").as("chk"), col("neg_price").as("v")),
        struct(lit("returnflag_domain").as("chk"), col("bad_flag").as("v")),
        struct(lit("duplicate_pk").as("chk"), col("dup_pk").as("v")),
        struct(lit("orderkey_fk_orphans").as("chk"), col("orphans").as("v"))))
        .as("c"))
      .select(col("c.chk").as("chk"), col("n").as("n_checked"),
        col("c.v").as("n_violations"))
  }

  /** Hopping-window rates (q140): 24-hour windows sliding every 6
    * hours — the §2.8 window type the reference never uses (its
    * windows are tumbling only) but any rate monitor wants: a spike
    * is visible within one slide instead of waiting for a day
    * boundary, at 4× the row cost (each event lands in size/slide
    * windows — the explicit trade). Spark-first: the native
    * `window(ts, size, slide)` generator, one combiner-compressed
    * aggregation; the oracle replays the same epoch-aligned window
    * arithmetic with a 4-row hop-offset lattice. Window starts ship
    * as epoch-millis BIGINT (the q35 convention). */
  val hoppingCounts: Q = Q(
    "q140_hopping_counts",
    """SELECT (epoch_ms(ts) // 21600000) * 21600000 - i.i * 21600000
      |         AS window_start_ms,
      |       event_type, count(*) AS n
      |FROM events, (VALUES (0), (1), (2), (3)) i(i)
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"))
  }

  /** Integer EWMA trend (q141): exponentially weighted moving average
    * over each type's daily count series with α = 1/4 in EXACT
    * fixed-point arithmetic — e_t = (1000·x_t + 3·e_{t−1}) div 4,
    * e_0 = 1000·x_0 (milli-units) — the trend line a monitoring
    * dashboard draws next to q131's spike flags (EWMA reacts to level
    * shifts the windowed z-test treats as repeated anomalies). An
    * EWMA is inherently sequential; here the recurrence folds INSIDE
    * one `aggregate` HOF over each key's sorted series — per-key
    * series length is calendar-bounded (a decade ≈ 3,650 entries),
    * never event volume, the same bounded-series argument as q131 —
    * so the plan is one combiner-compressed daily rollup + one
    * per-key collect + a narrow per-row fold, no iteration, no
    * window. Truncating integer division each step makes the fold
    * bit-identical to the oracle's recursive CTE. */
  val ewmaTrend: Q = Q(
    "q141_ewma_trend",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(ts AS DATE)) AS rn
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, rn, day, n, n * 1000 AS e
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.rn, d.day, d.n, (d.n * 1000 + 3 * r.e) // 4
      |  FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type, day, n, CAST(e AS BIGINT) AS ewma_milli
      |FROM r""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val empty = array().cast("array<bigint>")
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("sd"))
      .withColumn("ds", transform(col("sd"), x => x.getField("day")))
      .withColumn("ns", transform(col("sd"), x => x.getField("n")))
      // all quantities are non-negative, so floor(truediv) IS the
      // truncating integer division of the recurrence (and stays
      // double-exact below 2^53 — ~4·10^15 even at 10^12 events/day)
      .withColumn("es", aggregate(col("ns"), empty,
        (acc, x) => concat(acc, array(
          when(size(acc) === 0, x * 1000)
            .otherwise(floor(
              (x * 1000 + lit(3L) * element_at(acc, -1)) / lit(4))
              .cast("long"))))))
      .select(col("event_type"), col("ds"), col("ns"),
        posexplode(col("es")).as(Seq("pos", "e")))
      .withColumn("day", element_at(col("ds"), col("pos") + 1))
      .withColumn("n", element_at(col("ns"), col("pos") + 1))
      .select(col("event_type"), col("day"), col("n"),
        col("e").as("ewma_milli"))
  }

  /** Holt LINEAR-TREND smoothing (q208): q141's EWMA upgraded with a
    * trend accumulator — level l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}),
    * trend b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, α = β = 1/4, in exact
    * fixed-point milli-units. A level-only EWMA lags a steadily
    * growing series forever; Holt's trend term closes that gap — the
    * one-step forecast a capacity planner reads is l + b. The trend
    * can go NEGATIVE, where Spark's `div` (truncate toward zero) and
    * DuckDB's `//` disagree — both engines therefore divide as
    * floor(x/4.0), exact below 2^53 and floor-identical on both
    * sides. Same bounded-series fold as q141: one daily rollup, one
    * per-key collect of the calendar-bounded series, one narrow HOF
    * pass carrying a (level, trend) struct. */
  val holtTrend: Q = Q(
    "q208_holt_trend",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(ts AS DATE)) AS rn
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, rn, day, n,
      |         CAST(n * 1000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.rn, d.day, d.n,
      |         CAST(floor((d.n * 1000 + 3 * (r.l + r.b)) / 4.0) AS BIGINT),
      |         CAST(floor((CAST(floor((d.n * 1000 + 3 * (r.l + r.b)) / 4.0)
      |                          AS BIGINT) - r.l + 3 * r.b) / 4.0) AS BIGINT)
      |  FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type, day, CAST(n AS BIGINT) AS n,
      |       l AS level_milli, b AS trend_milli,
      |       l + b AS forecast_milli
      |FROM r""".stripMargin
  ) { (s, dir) =>
    holtSeries(s, dir)
      .select(col("event_type"), col("day"), col("n"),
        col("l").as("level_milli"), col("b").as("trend_milli"),
        (col("l") + col("b")).as("forecast_milli"))
  }

  /** The q208 Holt fold shared with q211's backtest: per (type, day),
    * the state AFTER the observation (l, b) and the honest one-step
    * forecast f = l_{t−1} + b_{t−1} that was standing BEFORE it (NULL
    * on each series' first day). One implementation so a recurrence
    * change cannot leave the backtest validating a different
    * smoother. */
  private def holtSeries(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val empty = array().cast("array<struct<l:bigint,b:bigint,f:bigint>>")
    def floorDiv4(x: org.apache.spark.sql.Column) =
      floor(x.cast("double") / lit(4.0)).cast("long")
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("sd"))
      .withColumn("ds", transform(col("sd"), x => x.getField("day")))
      .withColumn("ns", transform(col("sd"), x => x.getField("n")))
      .withColumn("hs", aggregate(col("ns"), empty, (acc, x) => {
        val prev = element_at(acc, -1)
        val f = prev.getField("l") + prev.getField("b")
        val l = floorDiv4(x * 1000 + lit(3L) * f)
        val b = floorDiv4(l - prev.getField("l") +
          lit(3L) * prev.getField("b"))
        concat(acc, array(
          when(size(acc) === 0,
            struct((x * 1000).cast("long").as("l"), lit(0L).as("b"),
              lit(null).cast("long").as("f")))
            .otherwise(struct(l.as("l"), b.as("b"), f.as("f")))))
      }))
      .select(col("event_type"), col("ds"), col("ns"),
        posexplode(col("hs")).as(Seq("pos", "h")))
      .select(col("event_type"),
        element_at(col("ds"), col("pos") + 1).as("day"),
        element_at(col("ns"), col("pos") + 1).as("n"),
        col("h.l").as("l"), col("h.b").as("b"), col("h.f").as("f"))
  }

  /** q211: FORECAST BACKTEST — does q208's Holt smoother actually
    * predict? For every day t ≥ 2, the one-step-ahead forecast is
    * l_{t−1} + b_{t−1} (state BEFORE seeing x_t); the per-type report
    * is the WEIGHTED absolute percentage error of those honest
    * forecasts, in exact ppm: wape_ppm = Σ|1000·x_t − f_t| div
    * Σ1000·x_t (WAPE, the volume-weighted form — NOT per-day-averaged
    * MAPE, which would let a near-zero-volume day's huge percentage
    * error dominate; both sums are exact integers). The number that
    * decides whether the trend line is a capacity-planning input or
    * just a chart decoration. Engine side rides [[holtSeries]], the
    * ONE fold q208 draws too. */
  val forecastBacktest: Q = Q(
    "q211_forecast_backtest",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(ts AS DATE)) AS rn
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, rn, n,
      |         CAST(n * 1000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
      |         CAST(NULL AS BIGINT) AS f
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.rn, d.n,
      |         CAST(floor((d.n * 1000 + 3 * (r.l + r.b)) / 4.0) AS BIGINT),
      |         CAST(floor((CAST(floor((d.n * 1000 + 3 * (r.l + r.b)) / 4.0)
      |                          AS BIGINT) - r.l + 3 * r.b) / 4.0) AS BIGINT),
      |         r.l + r.b
      |  FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type,
      |       CAST(count(f) AS BIGINT) AS n_forecasts,
      |       CAST(sum(abs(n * 1000 - f)) AS BIGINT) AS abs_err_milli,
      |       (1000000 * CAST(sum(abs(n * 1000 - f)) AS BIGINT))
      |         // CAST(sum(CASE WHEN f IS NOT NULL THEN n * 1000 END)
      |                AS BIGINT) AS wape_ppm
      |FROM r GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    holtSeries(s, dir)
      .select(col("event_type"), (col("n") * 1000).as("x_milli"), col("f"))
      .groupBy("event_type")
      .agg(count(col("f")).as("n_forecasts"),
        sum(abs(col("x_milli") - col("f"))).as("abs_err_milli"),
        sum(when(col("f").isNotNull, col("x_milli"))).as("sx"))
      .select(col("event_type"), col("n_forecasts"), col("abs_err_milli"),
        expr("(1000000 * abs_err_milli) div sx").as("wape_ppm"))
  }

  /** q210: ANOMALY CONSENSUS — q131's windowed z-test and q144's MAD
    * detector agree, or they don't, and the difference IS the triage
    * signal: `both` pages someone, `z_only` is usually variance
    * inflation from a prior spike (z's weakness), `mad_only` is a
    * shift the z-test's own inflated variance hid (MAD's strength).
    * One daily rollup feeds both detectors (each calendar-bounded
    * per-type series work, as adjudicated for q131/q144), and the
    * verdicts full-outer-join on (day, type). The composition is
    * exactly the two oracled detector chains glued — every branch
    * already hash-green on its own. */
  val anomalyConsensus: Q = Q(
    "q210_anomaly_consensus",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w1 AS (SELECT day, event_type, n,
      |         CAST(sum(n) OVER tw AS BIGINT) AS s,
      |         CAST(sum(n * n) OVER tw AS BIGINT) AS ss,
      |         count(*) OVER tw AS k
      |       FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |zf AS (SELECT day, event_type, n FROM w1
      |       WHERE k = 7
      |         AND (7 * n - s) * (7 * n - s) > 4 * (7 * ss - s * s)),
      |w2 AS (SELECT day, event_type, n, list(n) OVER tw AS l,
      |              count(*) OVER tw AS k
      |       FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |m AS (SELECT day, event_type, n, l,
      |             CAST(list_aggregate(l, 'median') AS BIGINT) AS med
      |      FROM w2 WHERE k = 7),
      |mf AS (SELECT day, event_type, n FROM (
      |         SELECT day, event_type, n, med,
      |                CAST(list_aggregate(
      |                  list_transform(l, v -> abs(v - med)), 'median')
      |                  AS BIGINT) AS mad
      |         FROM m) WHERE abs(n - med) > 3 * mad)
      |SELECT coalesce(zf.day, mf.day) AS day,
      |       coalesce(zf.event_type, mf.event_type) AS event_type,
      |       CAST(coalesce(zf.n, mf.n) AS BIGINT) AS n,
      |       CASE WHEN zf.day IS NULL THEN 'mad_only'
      |            WHEN mf.day IS NULL THEN 'z_only'
      |            ELSE 'both' END AS detector
      |FROM zf FULL OUTER JOIN mf
      |  ON zf.day = mf.day AND zf.event_type = mf.event_type""".stripMargin
  ) { (s, dir) =>
    import graft.operators.Monitoring
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // tiny; feeds both detectors
    val zf = Monitoring.rateAnomalies(daily)
      .select(col("day"), col("event_type"), col("n").as("n_z"))
    val mf = madAnomalies(daily)
      .select(col("day"), col("event_type"), col("n").as("n_m"))
    zf.join(mf, Seq("day", "event_type"), "full_outer")
      .select(col("day"), col("event_type"),
        coalesce(col("n_z"), col("n_m")).as("n"),
        when(col("n_z").isNull, "mad_only")
          .when(col("n_m").isNull, "z_only")
          .otherwise("both").as("detector"))
  }

  /** Compression-ratio quality report (q142, rows-only): per source,
    * the DEFLATE ratio distribution — mean ratio and the shares of
    * highly-repetitive (ratio < 0.35: templates, boilerplate, repeated
    * spans) and near-incompressible (> 0.9: high-entropy junk,
    * minified/encoded blobs) documents. The Gopher/RedPajama-class
    * quality rule the n-gram metrics miss (repetition at ANY period
    * compresses; q48's fixed-n repetition sees only small n). One
    * native `DeflateSize` pass per row riding the scan + one rollup;
    * per-doc ratios quantize to integer ppm so the rollup is exact.
    * No SQL engine has zlib → no oracle; CurationSpec pins the
    * expression's monotonicity and determinism instead. */
  val compressionQuality: Q = Q.rowsOnly("q142_compression_quality") { (s, dir) =>
    import graft.functions.expressions.{GraftExpressions => E}
    val d = t(s, dir, "documents")
      .select(col("source"),
        E.deflateSize(col("text")).cast("long").as("z"),
        octet_length(col("text")).cast("long").as("b"))
      .filter(col("b") > 0)
      .select(col("source"), expr("z * 1000000 div b").as("r_ppm"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_ppm")).as("sum_r_ppm"),
        sum(when(col("r_ppm") < 350000, 1L).otherwise(0L)).as("n_repetitive"),
        sum(when(col("r_ppm") > 900000, 1L).otherwise(0L)).as("n_entropy"))
      .select(col("source"), col("n_docs"),
        (col("sum_r_ppm").cast("double") / 1000000 / col("n_docs"))
          .as("avg_ratio"),
        col("n_repetitive"), col("n_entropy"))
  }

  /** Corpus pipeline v4 (q143): this round's curation stages composed
    * end-to-end — near-dup resolution (q27 candidates + q44
    * components) picks ONE winner per cluster by the q134 policy
    * (longest member, ties to lowest id; clusterless docs survive as
    * themselves), the survivor set is split by the q133 rule (hash of
    * the CLUSTER canonical — so the assignment is leakage-proof by
    * construction even though only winners remain), and the curated
    * corpus rolls up to the per-(split, source) document/token budget
    * a mixture planner consumes. Every stage is exact integer/string/
    * digest math, so the whole chain hash-oracles end-to-end like
    * q62/q74/q120 — and it is exactly the dedup→select→split→budget
    * sequence a production pretraining corpus job runs. */
  val corpusPipelineV4: Q = Q(
    "q143_corpus_pipeline_v4",
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
      |lab AS (SELECT id AS doc_id, least(id, min(r)) AS canonical_id
      |        FROM reach GROUP BY id),
      |m AS (SELECT lab.canonical_id, lab.doc_id, d.n_chars
      |      FROM lab JOIN documents d USING (doc_id)),
      |bst AS (SELECT canonical_id, max(n_chars) AS bc FROM m GROUP BY 1),
      |win AS (SELECT m.canonical_id, min(m.doc_id) AS doc_id
      |        FROM m JOIN bst ON m.canonical_id = bst.canonical_id
      |                       AND m.n_chars = bst.bc
      |        GROUP BY 1),
      |surv AS (
      |  SELECT d.doc_id, d.source, len(string_split(d.text, ' ')) AS n_tok,
      |         coalesce(lab.canonical_id, d.doc_id) AS canon
      |  FROM documents d
      |  LEFT JOIN lab USING (doc_id)
      |  WHERE lab.doc_id IS NULL
      |     OR d.doc_id IN (SELECT doc_id FROM win))
      |SELECT CASE WHEN CAST('0x' || substr(md5(CAST(canon AS VARCHAR)), 1, 8)
      |                 AS BIGINT) % 100 < 80 THEN 'train'
      |            WHEN CAST('0x' || substr(md5(CAST(canon AS VARCHAR)), 1, 8)
      |                 AS BIGINT) % 100 < 90 THEN 'valid'
      |            ELSE 'test' END AS split,
      |       source,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM surv GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    import graft.functions.{TextFunctions => T}
    import graft.functions.expressions.{GraftExpressions => E}
    val docs = t(s, dir, "documents")
    val labels = Dedup.resolve(Dedup.jaccardPairs(
        Dedup.shingleProjection(docs, "text", "doc_id"),
        threshold = 0.5, maxDf = 1000))
    // no extra pin: resolve already returns a checkpoint (+ re-spread
    // exchange); a second eager pin here re-materialized it and
    // measured +0.4 s (r14 optimization) — the election and survivor
    // joins share the checkpoint through AQE stage reuse instead
    // one winner per cluster: longest member, ties to lowest id (q134)
    val winners = labels
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy("canonical_id")
      .agg(E.topKByScore(col("n_chars").cast("double"), col("doc_id"), 1)
        .as("tk"))
      .select(col("canonical_id"),
        element_at(col("tk"), 1).getField("id").as("doc_id"))
    // survivors: cluster winners + clusterless docs, split by canonical
    val surv = docs
      .select(col("doc_id"), col("source"),
        size(T.words(col("text"))).cast("long").as("n_tok"))
      .join(labels, Seq("doc_id"), "left")
      .join(winners.select(col("doc_id"), lit(true).as("is_win")),
        Seq("doc_id"), "left")
      .filter(col("canonical_id").isNull || col("is_win"))
      .select(col("source"), col("n_tok"),
        coalesce(col("canonical_id"), col("doc_id")).as("canon"))
    surv
      .withColumn("split", Sampling.splitColumn(col("canon")))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  /** Robust MAD anomaly detection (q144): the median-based companion
    * of q131's z-test — flag days where |x − median| > 3·MAD over the
    * trailing 7 days (median absolute deviation). Robustness is the
    * point: one past spike inflates q131's mean AND variance (masking
    * the next spike); the median/MAD baseline ignores up to 3 of 7
    * contaminated trailing days. With an odd window the median is an
    * exact ELEMENT, so everything stays integer — bit-reproducible
    * and hash-oracled. The trailing window is materialized per row by
    * slicing each key's collected calendar-bounded series (the q141
    * technique — 7-element sorts inside a HOF, no iteration); the
    * oracle mirrors it with DuckDB's list() window + list_aggregate
    * medians. MAD = 0 (≥4 identical trailing days) flags ANY
    * deviation — the standard degenerate-baseline caveat, identical
    * in both engines. */
  val madAnomaly: Q = Q(
    "q144_mad_anomaly",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT day, event_type, n, list(n) OVER tw AS l,
      |             count(*) OVER tw AS k
      |      FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |m AS (SELECT day, event_type, n, l,
      |             CAST(list_aggregate(l, 'median') AS BIGINT) AS med
      |      FROM w WHERE k = 7),
      |x AS (SELECT day, event_type, n, med,
      |             CAST(list_aggregate(
      |               list_transform(l, v -> abs(v - med)), 'median')
      |               AS BIGINT) AS mad
      |      FROM m)
      |SELECT day, event_type, n, med, mad
      |FROM x WHERE abs(n - med) > 3 * mad""".stripMargin
  ) { (s, dir) =>
    madAnomalies(t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")))
  }

  /** The q144 MAD detector over a (event_type, day, n) daily frame —
    * shared with q210's consensus view. */
  private def madAnomalies(daily: DataFrame): DataFrame =
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("sd"))
      .withColumn("ds", transform(col("sd"), x => x.getField("day")))
      .withColumn("ns", transform(col("sd"), x => x.getField("n")))
      .select(col("event_type"), col("ds"), col("ns"),
        posexplode(col("ns")).as(Seq("pos", "n")))
      .filter(col("pos") >= 7)
      .withColumn("win", slice(col("ns"), col("pos") - 6, lit(7)))
      .withColumn("med", element_at(array_sort(col("win")), 4))
      .withColumn("mad", element_at(
        array_sort(transform(col("win"), v => abs(v - col("med")))), 4))
      .filter(abs(col("n") - col("med")) > lit(3) * col("mad"))
      .select(element_at(col("ds"), col("pos") + 1).as("day"),
        col("event_type"), col("n"), col("med"), col("mad"))

  /** Dedup-policy churn (q145): how many documents change their
    * canonical assignment when the Jaccard threshold moves 0.5 → 0.95
    * — the impact analysis run BEFORE flipping a production dedup
    * policy (q108 counts surviving pairs per threshold; this measures
    * what actually matters downstream: resolution outcomes). Both
    * resolutions ride ONE candidate generation — the 0.95 pair set is
    * a filter of the 0.5 pairs, so the shingle self-join is paid
    * once — and each label frame is the q44 pointer-doubling pass.
    * Classes: `stable` (same canonical under both), `split_off`
    * (clustered at 0.5, singleton at 0.95), `moved` (clustered under
    * both, different canonical). Docs clustered under NEITHER don't
    * report — the churn set is duplication-sized, not corpus-sized. */
  val thresholdChurn: Q = Q(
    "q145_threshold_churn",
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
      |jac AS (SELECT doc_a, doc_b,
      |               CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS j
      |        FROM pairs
      |        JOIN sizes sa ON doc_a = sa.doc_id
      |        JOIN sizes sb ON doc_b = sb.doc_id),
      |e5 AS (SELECT doc_a AS a, doc_b AS b FROM jac WHERE j >= 0.5
      |       UNION SELECT doc_b, doc_a FROM jac WHERE j >= 0.5),
      |r5 AS (SELECT a AS id, b AS r FROM e5
      |       UNION
      |       SELECT r5.id, e5.b FROM r5 JOIN e5 ON r5.r = e5.a),
      |l5 AS (SELECT id AS doc_id, least(id, min(r)) AS c5
      |       FROM r5 GROUP BY id),
      |e7 AS (SELECT doc_a AS a, doc_b AS b FROM jac WHERE j >= 0.95
      |       UNION SELECT doc_b, doc_a FROM jac WHERE j >= 0.95),
      |r7 AS (SELECT a AS id, b AS r FROM e7
      |       UNION
      |       SELECT r7.id, e7.b FROM r7 JOIN e7 ON r7.r = e7.a),
      |l7 AS (SELECT id AS doc_id, least(id, min(r)) AS c7
      |       FROM r7 GROUP BY id)
      |SELECT CASE
      |         WHEN l7.doc_id IS NULL THEN 'split_off'
      |         WHEN l5.c5 = l7.c7 THEN 'stable'
      |         ELSE 'moved' END AS churn,
      |       count(*) AS n_docs
      |FROM l5 LEFT JOIN l7 USING (doc_id)
      |GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    // one candidate generation at the LOOSE threshold feeds both
    // resolutions (the tight pair set is a pure filter); pinned so the
    // shingle self-join never re-executes
    val jac = Dedup.jaccardPairs(
        Dedup.shingleProjection(docs, "text", "doc_id"),
        threshold = 0.5, maxDf = 1000)
      .localCheckpoint(eager = true)
    val l5 = Dedup.resolve(jac)
      .select(col("doc_id"), col("canonical_id").as("c5"))
    val l7 = Dedup.resolve(jac.filter(col("jaccard") >= 0.95))
      .select(col("doc_id"), col("canonical_id").as("c7"))
    l5.join(l7, Seq("doc_id"), "left")
      .select(when(col("c7").isNull, lit("split_off"))
        .when(col("c5") === col("c7"), lit("stable"))
        .otherwise(lit("moved")).as("churn"))
      .groupBy("churn")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** q245: TEMPERATURE-SAMPLING MIXTURE WEIGHTS (α = 1/2) per source —
    * the standard up-weighting of small sources when composing a
    * multi-source training mix (the multilingual-sampling exponent of
    * Conneau/Lample 2019: wᵢ ∝ nᵢ^α flattens the head without
    * drowning the tail). FULLY exact despite the fractional exponent:
    * α = 1/2 makes each source's raw weight ⌊√nᵢ⌋, which is an exact
    * integer on both engines for any BIGINT count below 2⁵¹ (IEEE
    * sqrt is correctly rounded, and √(k²−1) sits more than one ulp
    * below k while k² < 2⁵¹ — so the floor can never round a
    * non-square up); shares are then integral floor-division ppm over
    * exact integer sums — no order-dependent double summation ever
    * forms, where a naive Σ√nᵢ of doubles would hash-diverge on
    * aggregation order. Token counts, not doc counts, weight the mix
    * (the unit that actually fills a training batch). Two grouped
    * aggregations and a 1-row broadcast. */
  val mixtureWeights: Q = Q(
    "q245_mixture_weights",
    """WITH n AS (SELECT source,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |               AS n_tokens
      |           FROM documents GROUP BY 1),
      |w AS (SELECT source, n_tokens,
      |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_raw
      |      FROM n),
      |tot AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_tot,
      |               CAST(sum(n_tokens) AS BIGINT) AS n_tot FROM w)
      |SELECT w.source, w.n_tokens, w.w_raw,
      |       (1000000 * w.n_tokens) // tot.n_tot AS raw_ppm,
      |       (1000000 * w.w_raw) // tot.w_tot AS sampled_ppm
      |FROM w CROSS JOIN tot""".stripMargin
  ) { (s, dir) =>
    val n = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).as("n_tokens"))
      .withColumn("w_raw",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tot = n.agg(sum(col("w_raw")).as("w_tot"),
      sum(col("n_tokens")).as("n_tot"))
    n.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("w_raw"),
        expr("(1000000 * n_tokens) div n_tot").as("raw_ppm"),
        expr("(1000000 * w_raw) div w_tot").as("sampled_ppm"))
  }

  /** q316: HOLT-WINTERS additive seasonal smoothing (period 7) — the
    * forecaster q227's finding demands: q208's Holt tracks level +
    * trend but re-learns the weekday cycle as trend error every week;
    * HW carries seven additive seasonal states (α = β = γ = 1/4, the
    * q208 discipline) so the one-step forecast l + b + s_w stands on
    * the cycle instead of fighting it. Emits the full state series
    * per (type, day): level, trend, the just-updated weekday
    * seasonal, and the honest PRE-observation forecast (NULL on each
    * series' first day). Init: l₁ = 10³·x₁, b = 0, s ≡ 0 — the first
    * cycle degrades exactly to Holt, then the seasonals absorb the
    * weekday pattern; weekday slot w = (rn−1) mod 7 counts SERIES
    * position, so gaps in the calendar do not shear the cycle
    * assignment between engines.
    *
    * Exactness: the q208 recurrence discipline extended — every state
    * is an exact BIGINT milli, every update ONE floor((…)/4.0) of an
    * exact integer (floor, not integer div: deseasonalized residuals
    * go negative, the q302 floor-vs-truncate trap; all magnitudes
    * < 2⁵³ so the double round-trip is exact). Spark folds per type
    * with `aggregate` over the sorted day array (the q208/q211
    * shape — state is 9 longs, series length is calendar-bounded);
    * the oracle is the same recurrence as a recursive CTE carrying
    * s0..s6 columns. */
  /** The q316 Holt-Winters recurrence as a shared DuckDB CTE chain
    * (`WITH RECURSIVE d, r`) — the q317 forecast chart face's oracle
    * concatenates this instead of copying the recurrence (the shared-
    * CTE no-drift rule, ADVICE r12; same pattern as [[predictorCte]]).
    * `r` carries (event_type, rn, day, n, l, b, s0..s6, f, sea). */
  private[queries] val hwCtes: String =
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS n,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(ts AS DATE)) AS rn
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, rn, day, n,
      |         CAST(n * 1000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
      |         CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
      |         CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
      |         CAST(0 AS BIGINT) AS s4, CAST(0 AS BIGINT) AS s5,
      |         CAST(0 AS BIGINT) AS s6,
      |         CAST(NULL AS BIGINT) AS f, CAST(0 AS BIGINT) AS sea
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT event_type, rn, day, n, l_new,
      |         CAST(floor((l_new - l + 3 * b) / 4.0) AS BIGINT),
      |         CASE WHEN w = 0 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s0 END,
      |         CASE WHEN w = 1 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s1 END,
      |         CASE WHEN w = 2 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s2 END,
      |         CASE WHEN w = 3 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s3 END,
      |         CASE WHEN w = 4 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s4 END,
      |         CASE WHEN w = 5 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s5 END,
      |         CASE WHEN w = 6 THEN CAST(floor((n * 1000 - l_new + 3 * sw)
      |           / 4.0) AS BIGINT) ELSE s6 END,
      |         f,
      |         CAST(floor((n * 1000 - l_new + 3 * sw) / 4.0) AS BIGINT)
      |  FROM (
      |    SELECT p.*, l + b + sw AS f,
      |           CAST(floor((n * 1000 - sw + 3 * (l + b)) / 4.0) AS BIGINT)
      |             AS l_new
      |    FROM (
      |      SELECT d.event_type, d.rn, d.day, d.n, r.l, r.b,
      |             r.s0, r.s1, r.s2, r.s3, r.s4, r.s5, r.s6,
      |             (d.rn - 1) % 7 AS w,
      |             CASE (d.rn - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1
      |               WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4
      |               WHEN 5 THEN r.s5 ELSE r.s6 END AS sw
      |      FROM r JOIN d ON d.event_type = r.event_type
      |        AND d.rn = r.rn + 1) p) q)""".stripMargin

  val holtWinters: Q = Q(
    "q316_holt_winters",
    hwCtes + """
      |SELECT event_type, day, n, l AS level_milli, b AS trend_milli,
      |       sea AS seasonal_milli, f AS forecast_milli
      |FROM r""".stripMargin
  ) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val empty = array().cast(
      "array<struct<l:bigint,b:bigint,s:array<bigint>,f:bigint,sea:bigint>>")
    def floorDiv4(x: org.apache.spark.sql.Column) =
      floor(x.cast("double") / lit(4.0)).cast("long")
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("sd"))
      .withColumn("ds", transform(col("sd"), x => x.getField("day")))
      .withColumn("ns", transform(col("sd"), x => x.getField("n")))
      .withColumn("hs", aggregate(col("ns"), empty, (acc, x) => {
        val prev = element_at(acc, -1)
        val w = pmod(size(acc), lit(7))
        val sw = element_at(prev.getField("s"), w + 1)
        val f = prev.getField("l") + prev.getField("b") + sw
        val lNew = floorDiv4(x * 1000 - sw
          + lit(3L) * (prev.getField("l") + prev.getField("b")))
        val bNew = floorDiv4(lNew - prev.getField("l")
          + lit(3L) * prev.getField("b"))
        val sNew = floorDiv4(x * 1000 - lNew + lit(3L) * sw)
        val sArr = transform(prev.getField("s"),
          (v, i) => when(i === w, sNew).otherwise(v))
        concat(acc, array(
          when(size(acc) === 0,
            struct((x * 1000).cast("long").as("l"), lit(0L).as("b"),
              array_repeat(lit(0L), 7).as("s"),
              lit(null).cast("long").as("f"), lit(0L).as("sea")))
            .otherwise(struct(lNew.as("l"), bNew.as("b"), sArr.as("s"),
              f.as("f"), sNew.as("sea")))))
      }))
      .select(col("event_type"), col("ds"), col("ns"),
        posexplode(col("hs")).as(Seq("pos", "h")))
      .select(col("event_type"),
        element_at(col("ds"), col("pos") + 1).as("day"),
        element_at(col("ns"), col("pos") + 1).as("n"),
        col("h.l").as("level_milli"), col("h.b").as("trend_milli"),
        col("h.sea").as("seasonal_milli"), col("h.f").as("forecast_milli"))
  }

  /** q325: CROSTON'S METHOD for intermittent demand — the forecaster
    * the q208/q316 family lacks: exponential smoothing collapses on a
    * mostly-zero series (each zero drags the level toward zero, then
    * a demand spike whipsaws it); Croston smooths demand SIZE and
    * demand INTERVAL separately, updating both only on demand days,
    * and forecasts their ratio. The series here is the daily count of
    * high-value events (value ≥ 250 — q299's threshold) per type:
    * genuinely intermittent at low volume, dense at high volume
    * (where Croston degrades gracefully to a ratio of EWMAs).
    *
    * Recurrence (α = 1/4, the q208/q316 discipline), state exact
    * BIGINT milli with NULL until the first demand day: on demand x
    * after interval c+1 days, z += ⌊(10³x − z)/4.0⌋ and
    * p += ⌊(10³(c+1) − p)/4.0⌋ (floor of an exact-integer double —
    * the q316 rule: residuals go negative, so never integer div),
    * first demand initializes z = 10³x, p = 10³(c+1); zero days only
    * advance c. The emitted forecast is the honest PRE-observation
    * one, (10³·z) div p (nonneg, so div == //). Spark folds per type
    * over the sorted day array (the q316 shape — no window); the
    * oracle is the identical recurrence as a recursive CTE. */
  val croston: Q = Q(
    "q325_croston",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(sum(CASE WHEN value >= 250 THEN 1 ELSE 0 END)
      |           AS BIGINT) AS x,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(ts AS DATE)) AS rn
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, rn, day, x,
      |         CASE WHEN x > 0 THEN 1000 * x END AS z,
      |         CASE WHEN x > 0 THEN CAST(1000 AS BIGINT) END AS p,
      |         CASE WHEN x > 0 THEN CAST(0 AS BIGINT)
      |              ELSE CAST(1 AS BIGINT) END AS c,
      |         CAST(NULL AS BIGINT) AS f
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.rn, d.day, d.x,
      |         CASE WHEN d.x = 0 THEN r.z
      |              WHEN r.z IS NULL THEN 1000 * d.x
      |              ELSE r.z + CAST(floor((1000 * d.x - r.z) / 4.0)
      |                AS BIGINT) END,
      |         CASE WHEN d.x = 0 THEN r.p
      |              WHEN r.z IS NULL THEN 1000 * (r.c + 1)
      |              ELSE r.p + CAST(floor((1000 * (r.c + 1) - r.p) / 4.0)
      |                AS BIGINT) END,
      |         CASE WHEN d.x = 0 THEN r.c + 1 ELSE CAST(0 AS BIGINT) END,
      |         CASE WHEN r.z IS NULL THEN NULL
      |              ELSE (1000 * r.z) // r.p END
      |  FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type, day, x AS demand, z AS size_milli,
      |       p AS interval_milli, f AS forecast_milli
      |FROM r""".stripMargin
  ) { (s, dir) =>
    crostonReport(t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(when(col("value") >= 250, 1L).otherwise(0L)).as("x")))
  }

  /** The Croston fold behind q325 (also the spec's hand-case entry):
    * `daily` is the per-(event_type, day) demand frame (x ≥ 0). See
    * q325's scaladoc for the recurrence. */
  private[graft] def crostonReport(daily: DataFrame): DataFrame = {
    val empty = array().cast(
      "array<struct<z:bigint,p:bigint,c:bigint,f:bigint>>")
    def floorDiv4(e: org.apache.spark.sql.Column) =
      floor(e.cast("double") / lit(4.0)).cast("long")
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("sd"))
      .withColumn("ds", transform(col("sd"), r => r.getField("day")))
      .withColumn("xs", transform(col("sd"), r => r.getField("x")))
      .withColumn("hs", aggregate(col("xs"), empty, (acc, x) => {
        val prev = element_at(acc, -1)
        val interval = prev.getField("c") + 1L
        // exact nonneg integer quotient: (a − a mod b)/b round-trips
        // through double exactly below 2^53 (the kaplanMeierReport
        // divQ pattern, long-ranged here)
        val fNum = lit(1000L) * prev.getField("z")
        val f = when(prev.getField("z").isNull, lit(null).cast("long"))
          .otherwise(((fNum - pmod(fNum, prev.getField("p"))).cast("double")
            / prev.getField("p").cast("double")).cast("long"))
        val zNew = when(x === 0, prev.getField("z"))
          .when(prev.getField("z").isNull, (x * 1000L).cast("long"))
          .otherwise(prev.getField("z")
            + floorDiv4(x * 1000L - prev.getField("z")))
        val pNew = when(x === 0, prev.getField("p"))
          .when(prev.getField("z").isNull, (interval * 1000L).cast("long"))
          .otherwise(prev.getField("p")
            + floorDiv4(interval * 1000L - prev.getField("p")))
        val cNew = when(x === 0, prev.getField("c") + 1L).otherwise(lit(0L))
        concat(acc, array(
          when(size(acc) === 0,
            struct(
              when(x > 0, x * 1000L).cast("long").as("z"),
              when(x > 0, lit(1000L)).cast("long").as("p"),
              when(x > 0, lit(0L)).otherwise(lit(1L)).as("c"),
              lit(null).cast("long").as("f")))
            .otherwise(struct(zNew.cast("long").as("z"),
              pNew.cast("long").as("p"), cNew.as("c"), f.as("f")))))
      }))
      .select(col("event_type"), col("ds"), col("xs"),
        posexplode(col("hs")).as(Seq("pos", "h")))
      .select(col("event_type"),
        element_at(col("ds"), col("pos") + 1).as("day"),
        element_at(col("xs"), col("pos") + 1).as("demand"),
        col("h.z").as("size_milli"), col("h.p").as("interval_milli"),
        col("h.f").as("forecast_milli"))
  }

  /** The shared length-prior-vs-stopword-gate predictor frame behind
    * the classifier-evaluation family (q254 reliability bins, q257
    * cumulative gains, q296 Brier decomposition, q297 ROC AUC, and the
    * q303 chart face): per document, the exact-ppm prediction
    * p = min(10⁶, n_tok × 5000) — the length prior quantized BEFORE
    * any aggregation — and the binary outcome y = [n_stop·20 ≥ n_tok]
    * (the ≥5%-stopword gate, q24/q47's signal family). ONE definition
    * on each side (ADVICE r12: q296/q297 had drifted-prone copies):
    * [[predictorCte]] is the DuckDB `WITH d AS …, b AS …` prefix every
    * family oracle starts from, [[predictor]] the equivalent Spark
    * frame. doc_id rides along for the doc-grain members (q257);
    * bin-grain members never select it, so Catalyst prunes it out of
    * their scans. All integer arithmetic — the family's exactness
    * rests on this frame being IEEE-free. */
  private[queries] val predictorCte: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |         CAST(len(list_filter(string_split(text, ' '),
      |              w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
      |           AS n_stop
      |  FROM documents),
      |b AS (SELECT doc_id, source, least(n_tok * 5000, 1000000) AS p,
      |             CASE WHEN n_stop * 20 >= n_tok THEN 1 ELSE 0 END AS y
      |      FROM d)""".stripMargin

  /** Spark twin of [[predictorCte]]: (doc_id, source, p, y). Members
    * that need neither doc_id nor source never select them, so
    * Catalyst prunes them out of those scans. */
  private[queries] def predictor(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"),
        expr("CAST(size(filter(split(text, ' '), " +
          "w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)")
          .as("n_stop"))
      .select(col("doc_id"), col("source"),
        least(col("n_tok") * 5000, lit(1000000L)).as("p"),
        when(col("n_stop") * 20 >= col("n_tok"), 1L).otherwise(0L).as("y"))

  /** Spark twin of [[brierCtes]]'s `bins` CTE — the calibration-bin
    * frame (bin, nb, sp, sp2, sy, spy) shared by q296 and the
    * bin-grain calibration metrics (q304 Hosmer-Lemeshow, q305
    * ECE/MCE). One shuffle at bin grain (≤ 10 rows). */
  private[queries] def predictorBins(s: SparkSession, dir: String): DataFrame =
    predictor(s, dir)
      .groupBy(least(expr("p div 100000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("p")).as("sp"),
        sum(expr("CAST(p AS DECIMAL(38,0)) * p")).as("sp2"),
        sum(col("y")).as("sy"), sum(col("p") * col("y")).as("spy"))

  /** q254: CALIBRATION BINS for a quality predictor — the reliability
    * diagram behind every learned quality filter: bucket documents by
    * PREDICTED quality, then compare each bin's mean prediction to the
    * OBSERVED positive rate (a calibrated predictor's bins sit on the
    * diagonal; a length-prior that over-promises shows observed ≪
    * predicted in its top bins). Here the predictor is the standard
    * length prior (p = min(1, n_tokens/200)) and the outcome is the
    * stopword-density gate (≥ 5% stopwords — the q24/q47 signal
    * family), so the query audits one heuristic against another —
    * exactly what a curation pipeline does before trusting either.
    *
    * Exactness: the prediction quantizes per doc to EXACT ppm
    * (n_tok × 5000, saturated) before any aggregation, the outcome is
    * an integer comparison (n_stop·20 ≥ n_tok), bins are integer
    * division of the ppm — the whole query is integer arithmetic end
    * to end, no IEEE anywhere. One shuffle at bin grain (10 rows). */
  val calibrationBins: Q = Q(
    "q254_calibration_bins",
    predictorCte + """
      |SELECT least(p // 100000, 9) AS bin,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(p) AS BIGINT) // count(*) AS mean_pred_ppm,
      |       (1000000 * CAST(sum(y) AS BIGINT)) // count(*) AS obs_rate_ppm
      |FROM b GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    predictor(s, dir)
      .groupBy(least(expr("p div 100000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"))
      .select(col("bin"), col("n"),
        expr("sp div n").as("mean_pred_ppm"),
        expr("(1000000 * sy) div n").as("obs_rate_ppm"))
  }

  /** q257: CUMULATIVE GAINS at decile cuts — q254's companion from the
    * other direction: rank all documents by the predictor DESCENDING
    * and read how many true positives the top 10%/20%/…/100% capture
    * (the lift-curve number that decides how much corpus a
    * quality-ranked selection can skip). The global rank and the
    * cumulative-positive count ride ONE fused pass of the native
    * multi-column RunningSum (r11): values = (y, 1) over
    * (pred DESC, doc_id) — one range exchange for both columns, never
    * a global window. Decile cut ranks come from a broadcast 10-row
    * frame derived from the 1-row total. All integers end to end. */
  val cumulativeGains: Q = Q(
    "q257_cumulative_gains",
    predictorCte + """,
      |r AS (SELECT
      |        CAST(row_number() OVER (ORDER BY p DESC, doc_id)
      |          AS BIGINT) AS rk,
      |        CAST(sum(y) OVER (ORDER BY p DESC, doc_id)
      |          AS BIGINT) AS cum_pos
      |      FROM b),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |               CAST(sum(y) AS BIGINT) AS pos FROM b),
      |cuts AS (SELECT CAST(g.k AS BIGINT) AS decile,
      |                (tot.n * g.k) // 10 AS cut
      |         FROM generate_series(1, 10) AS g(k) CROSS JOIN tot)
      |SELECT cuts.decile, r.rk AS n_at_cut, r.cum_pos,
      |       (1000000 * r.cum_pos) // tot.pos AS gain_ppm
      |FROM r JOIN cuts ON r.rk = cuts.cut CROSS JOIN tot""".stripMargin
  ) { (s, dir) =>
    val scored = predictor(s, dir)
    val ranked = graft.operators.Ranks.globalRunningSums(scored,
      Seq(col("p").desc, col("doc_id").asc),
      Seq(col("y") -> "cum_pos", lit(1L) -> "rk"))
    val tot = scored.agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val cuts = tot.select(explode(sequence(lit(1), lit(10))).as("decile"),
        col("n"), col("pos"))
      .select(col("decile").cast("long").as("decile"),
        expr("(n * decile) div 10").as("rk"), col("pos"))
    ranked.join(broadcast(cuts), Seq("rk"))
      .select(col("decile"), col("rk").as("n_at_cut"), col("cum_pos"),
        expr("(1000000 * cum_pos) div pos").as("gain_ppm"))
  }

  /** q285: MASE — Mean Absolute Scaled Error (Hyndman & Koehler
    * 2006), the forecast-accuracy number q211's WAPE can't give:
    * WAPE says how big the Holt errors are relative to VOLUME; MASE
    * says whether the model beats the free alternative, scaling mean
    * |error| by the mean |seasonal-naive error| (x_t vs x_{t−7} — the
    * honest baseline for a weekday-seasonal series, q227's finding).
    * mase < 10⁶ ppm ⇒ Holt earns its keep; ≥ 10⁶ ⇒ ship the naive
    * forecaster. Both legs are exact integer milli sums (the Holt leg
    * is q211's recursive fold verbatim; the naive leg one keyed lag);
    * the ratio is one integral floor of exact products — magnitudes
    * top out near 10¹⁷ at tested scales, inside int64, and the bound
    * is ENFORCED, not assumed (ADVICE r11): the 10⁶·ferr·nn product
    * needs ferr·nn ≤ 2⁶³/10⁶ ≈ 9.2·10¹², guarded with assert_true so
    * a larger scale factor dies loudly on BOTH engines (DuckDB errors
    * on BIGINT overflow natively; Spark would wrap silently). Series
    * with zero naive error (constant 7-day cycle) drop out: MASE is
    * undefined there, and the absence is the answer. */
  val maseBacktest: Q = Q(
    "q285_mase_backtest",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(ts AS DATE)) AS rn
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, rn, n,
      |         CAST(n * 1000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
      |         CAST(NULL AS BIGINT) AS f
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.rn, d.n,
      |         CAST(floor((d.n * 1000 + 3 * (r.l + r.b)) / 4.0) AS BIGINT),
      |         CAST(floor((CAST(floor((d.n * 1000 + 3 * (r.l + r.b)) / 4.0)
      |                          AS BIGINT) - r.l + 3 * r.b) / 4.0) AS BIGINT),
      |         r.l + r.b
      |  FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.rn + 1),
      |fe AS (SELECT event_type, CAST(count(f) AS BIGINT) AS nf,
      |         CAST(sum(abs(n * 1000 - f)) AS BIGINT) AS ferr
      |       FROM r GROUP BY 1),
      |nv AS (SELECT event_type,
      |         CAST(sum(abs(n - ln) * 1000) AS BIGINT) AS nerr,
      |         CAST(count(ln) AS BIGINT) AS nn
      |       FROM (SELECT event_type, n,
      |               lag(n, 7) OVER (PARTITION BY event_type ORDER BY rn)
      |                 AS ln
      |             FROM d) t
      |       GROUP BY 1)
      |SELECT fe.event_type, fe.nf, nv.nn,
      |       (1000000 * fe.ferr * nv.nn) // (fe.nf * nv.nerr) AS mase_ppm
      |FROM fe JOIN nv USING (event_type)
      |WHERE nv.nerr > 0""".stripMargin
  ) { (s, dir) =>
    val hs = holtSeries(s, dir)
    val fe = hs.groupBy("event_type")
      .agg(count(col("f")).as("nf"),
        sum(abs(col("n") * 1000 - col("f"))).as("ferr"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val nv = hs.select(col("event_type"), col("day"), col("n"))
      .withColumn("ln", lag(col("n"), 7).over(w))
      .groupBy("event_type")
      .agg(sum(abs(col("n") - col("ln")) * 1000).as("nerr"),
        count(col("ln")).as("nn"))
    fe.join(nv, Seq("event_type"))
      .filter(col("nerr") > 0)
      // overflow guard (scaladoc): ferr·nn must fit 2^63/1e6; nn is a
      // day count so the inner 1e6·nn product cannot itself wrap
      .filter(expr("assert_true(ferr <= " +
        "(9223372036854775807 div 1000000) div nn, " +
        "'q285: ferr*nn overflows the 1e6 ppm scaling') IS NULL"))
      .select(col("event_type"), col("nf"), col("nn"),
        expr("(1000000 * ferr * nn) div (nf * nerr)").as("mase_ppm"))
  }

  /** q296: BRIER SCORE + MURPHY DECOMPOSITION of the q254 calibration
    * frame — the headline forecast-verification number and WHERE it
    * comes from: q254 shows the reliability diagram, this query scores
    * it. Brier = mean (p−y)²; over the q254 bins it splits into
    * RELIABILITY (calibration error: bins off the diagonal — the part
    * recalibration can remove), RESOLUTION (how far bin outcomes
    * spread from the base rate — the part that is actual skill),
    * UNCERTAINTY ō(1−ō) (the no-skill floor), plus the WITHIN-BIN
    * VARIANCE term the textbook identity needs when predictions vary
    * inside a bin (Brier = REL − RES + UNC + WBV, here up to the
    * per-bin floors).
    *
    * Exactness: predictions are q254's exact per-doc ppm, so every
    * sum (Σp, Σp², Σpy, Σy) is an exact integer; each bin's REL term
    * is (Σp − 10⁶Σy)²/n_b with an integer numerator, RES clears
    * denominators the same way, and Brier itself expands to
    * Σp² − 2·10⁶Σpy + 10¹²·Y with NO second pass over documents.
    * Squares run in DECIMAL(38,0)/HUGEINT (ppm² × corpus rows passes
    * int64); every per-bin term floors from exact integers before the
    * order-immune sum (the q241/q293 discipline). Output unit u9
    * (10⁻⁹ of the 0-1 Brier scale). One bin-grain aggregate (10 rows)
    * and a 1-row broadcast — no window, no sort. */
  /** The Murphy-decomposition CTE chain shared by q296's oracle and
    * the q303 chart oracle (one definition — the same no-drift rule as
    * [[predictorCte]], ADVICE r12): appends `bins`/`tot`/`terms`/`bs`
    * to the predictor prefix; `bs` carries (n, brier_u9, rel_u9,
    * res_u9, unc_u9, wbv_u9). Exactness arguments in q296's scaladoc. */
  private[queries] val brierCtes: String =
    """,
      |bins AS (SELECT least(p // 100000, 9) AS bin,
      |           CAST(count(*) AS BIGINT) AS nb,
      |           CAST(sum(p) AS BIGINT) AS sp,
      |           sum(CAST(p AS HUGEINT) * p) AS sp2,
      |           CAST(sum(y) AS BIGINT) AS sy,
      |           CAST(sum(p * y) AS BIGINT) AS spy
      |         FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
      |               CAST(sum(sy) AS BIGINT) AS yy,
      |               sum(sp2) AS sp2t,
      |               CAST(sum(spy) AS BIGINT) AS spyt
      |        FROM bins),
      |terms AS (SELECT tot.n AS n, tot.yy AS yy, tot.sp2t AS sp2t,
      |            tot.spyt AS spyt,
      |            sum((CAST(sp - 1000000 * sy AS HUGEINT)
      |                 * (sp - 1000000 * sy)) // nb) AS rel2,
      |            sum((CAST(1000000000000 AS HUGEINT)
      |                 * (sy * tot.n - tot.yy * nb)
      |                 * (sy * tot.n - tot.yy * nb))
      |                // (CAST(nb AS HUGEINT) * tot.n * tot.n)) AS res2,
      |            sum((CAST(nb AS HUGEINT) * sp2
      |                 - CAST(sp AS HUGEINT) * sp) // nb) AS wbv2
      |          FROM bins CROSS JOIN tot GROUP BY 1, 2, 3, 4),
      |bs AS (SELECT n,
      |         CAST((sp2t - 2000000 * CAST(spyt AS HUGEINT)
      |               + CAST(1000000000000 AS HUGEINT) * yy)
      |              // (CAST(n AS HUGEINT) * 1000) AS BIGINT) AS brier_u9,
      |         CAST(rel2 // (CAST(n AS HUGEINT) * 1000) AS BIGINT) AS rel_u9,
      |         CAST(res2 // (CAST(n AS HUGEINT) * 1000) AS BIGINT) AS res_u9,
      |         CAST((CAST(1000000000 AS HUGEINT) * yy * (n - yy))
      |              // (CAST(n AS HUGEINT) * n) AS BIGINT) AS unc_u9,
      |         CAST(wbv2 // (CAST(n AS HUGEINT) * 1000) AS BIGINT) AS wbv_u9
      |       FROM terms)""".stripMargin

  val brierDecomposition: Q = Q(
    "q296_brier_decomposition",
    predictorCte + brierCtes + """
      |SELECT n, brier_u9, rel_u9, res_u9, unc_u9, wbv_u9 FROM bs""".stripMargin
  ) { (s, dir) =>
    val d38c = "DECIMAL(38,0)"
    val bins = predictor(s, dir)
      .groupBy(least(expr("p div 100000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("p")).as("sp"),
        sum(expr(s"CAST(p AS $d38c) * p")).as("sp2"),
        sum(col("y")).as("sy"), sum(col("p") * col("y")).as("spy"))
    val tot = bins.agg(sum(col("nb")).as("n"), sum(col("sy")).as("yy"),
      sum(col("sp2")).as("sp2t"), sum(col("spy")).as("spyt"))
    bins.crossJoin(broadcast(tot))
      .select(col("n"), col("yy"), col("sp2t"), col("spyt"),
        expr(s"(CAST(sp - 1000000 * sy AS $d38c) * (sp - 1000000 * sy)) " +
          "div nb").as("rel_t"),
        expr(s"(CAST(1000000000000 AS $d38c) * (sy * n - yy * nb) " +
          s"* (sy * n - yy * nb)) div (CAST(nb AS $d38c) * n * n)")
          .as("res_t"),
        expr(s"(CAST(nb AS $d38c) * sp2 - CAST(sp AS $d38c) * sp) div nb")
          .as("wbv_t"))
      .groupBy("n", "yy", "sp2t", "spyt")
      .agg(sum(col("rel_t")).as("rel2"), sum(col("res_t")).as("res2"),
        sum(col("wbv_t")).as("wbv2"))
      .select(col("n"),
        expr(s"CAST((sp2t - 2000000 * CAST(spyt AS $d38c) " +
          s"+ CAST(1000000000000 AS $d38c) * yy) " +
          s"div (CAST(n AS $d38c) * 1000) AS BIGINT)").as("brier_u9"),
        expr(s"CAST(rel2 div (CAST(n AS $d38c) * 1000) AS BIGINT)")
          .as("rel_u9"),
        expr(s"CAST(res2 div (CAST(n AS $d38c) * 1000) AS BIGINT)")
          .as("res_u9"),
        expr(s"CAST((CAST(1000000000 AS $d38c) * yy * (n - yy)) " +
          s"div (CAST(n AS $d38c) * n) AS BIGINT)").as("unc_u9"),
        expr(s"CAST(wbv2 div (CAST(n AS $d38c) * 1000) AS BIGINT)")
          .as("wbv_u9"))
  }

  /** q297: ROC AUC of the q254 predictor — the DISCRIMINATION third
    * of the classifier-evaluation triptych (q254 reliability diagram:
    * is it calibrated; q296 Brier: how big are the errors; AUC: does
    * it RANK positives above negatives at all — a predictor can ace
    * any two and fail the third). AUC is exactly the Mann-Whitney
    * probability P(p₊ > p₋) + ½P(=), so it reads off q222's doubled
    * tie-averaged ranks with no curve integration:
    * AUC = (R2₊ − n₊(n₊+1)) / (2 n₊ n₋), one exact ppm floor.
    * Ranking runs at DISTINCT-VALUE grain (the prediction takes ≤ 201
    * distinct ppm values by construction) through the range-
    * partitioned prefix sum — never a row window; products clear
    * int64 via DECIMAL(38,0)/HUGEINT at corpus scale. */
  /** The Mann-Whitney-AUC CTE chain shared by q297's oracle and the
    * q303 chart oracle: appends `rk`/`m`/`aucv` to the predictor
    * prefix; `aucv` carries (n, n_pos, n_neg, auc_ppm — NULL when the
    * outcome is degenerate). Exactness arguments in q297's scaladoc. */
  private[queries] val aucCtes: String =
    """,
      |rk AS (SELECT y,
      |         2 * rank() OVER (ORDER BY p)
      |           + count(*) OVER (PARTITION BY p) - 1 AS r2
      |       FROM b),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(y) AS BIGINT) AS n_pos,
      |        CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT)
      |          AS r2pos
      |      FROM rk),
      |aucv AS (SELECT n, n_pos, n - n_pos AS n_neg,
      |           CAST(CASE WHEN n_pos = 0 OR n = n_pos THEN NULL
      |                ELSE (CAST(1000000 AS HUGEINT)
      |                      * (r2pos - n_pos * (n_pos + 1)))
      |                     // (CAST(2 AS HUGEINT) * n_pos * (n - n_pos)) END
      |             AS BIGINT) AS auc_ppm
      |         FROM m)""".stripMargin

  val rocAuc: Q = Q(
    "q297_roc_auc",
    predictorCte + aucCtes + """
      |SELECT n, n_pos, n_neg, auc_ppm FROM aucv""".stripMargin
  ) { (s, dir) =>
    val d38c = "DECIMAL(38,0)"
    val b = predictor(s, dir)
    val byVal = b.groupBy("p").agg(count(lit(1)).as("tc"))
    val withCum = graft.operators.Ranks.globalRunningSum(
      byVal, Seq(col("p")), col("tc"), "cum")
    val r2tab = withCum.select(col("p"),
      (lit(2) * col("cum") - col("tc") + 1).cast("long").as("r2"))
    b.groupBy("p", "y").agg(count(lit(1)).as("c"))
      .join(r2tab, Seq("p"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("y") === 1, col("c")).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === 1, col("c") * col("r2")).otherwise(0L))
          .as("r2pos"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        expr(s"CAST(CASE WHEN n_pos = 0 OR n = n_pos THEN NULL ELSE " +
          s"(CAST(1000000 AS $d38c) * (r2pos - n_pos * (n_pos + 1))) " +
          s"div (CAST(2 AS $d38c) * n_pos * (n - n_pos)) END AS BIGINT)")
          .as("auc_ppm"))
  }

  /** q304: HOSMER-LEMESHOW goodness-of-fit over the q254 calibration
    * bins — the formal test behind the reliability diagram: per bin,
    * (observed − expected)² / (expected · (1 − π̂)) with expected
    * positives E_b = Σp/10⁶ and π̂ = Σp/(n_b·10⁶), summed into the
    * HL χ² (df ≈ usable bins − 2). q254 SHOWS the bins, q296 scores
    * the squared error, this tests whether the miscalibration is
    * statistically real — the fourth face of the same shared frame.
    *
    * Exactness: the textbook term clears to pure integers —
    * (O−E)²/(E(1−π̂)) = (10⁶·sy − sp)²·n_b / (sp·(n_b·10⁶ − sp)) —
    * so each bin's term micro-quantizes (×10⁶) by ONE integral floor
    * of exact products (DECIMAL(38,0)/HUGEINT: the squared numerator
    * passes int64 at corpus scale) before the order-immune sum.
    * Degenerate bins (sp = 0 or sp = n_b·10⁶ — expected-count zero or
    * variance zero, e.g. the saturated top bin where every p = 10⁶)
    * are excluded on BOTH sides, the standard HL practice of merging/
    * dropping zero-variance cells; n_bins reports the usable count.
    * Rides [[predictorBins]] / [[brierCtes]] — no fifth predictor
    * definition to drift (ADVICE r12 rule). One bin-grain aggregate. */
  val hosmerLemeshow: Q = Q(
    "q304_hosmer_lemeshow",
    predictorCte + brierCtes + """
      |SELECT CAST(count(*) AS BIGINT) AS n_bins,
      |       CAST(sum((CAST(1000000 AS HUGEINT)
      |                 * (1000000 * sy - sp) * (1000000 * sy - sp) * nb)
      |             // (CAST(sp AS HUGEINT) * (nb * 1000000 - sp)))
      |         AS BIGINT) AS hl_u6
      |FROM bins WHERE sp > 0 AND sp < nb * 1000000""".stripMargin
  ) { (s, dir) =>
    val d38c = "DECIMAL(38,0)"
    predictorBins(s, dir)
      .filter(col("sp") > 0 && col("sp") < col("nb") * 1000000L)
      .agg(count(lit(1)).as("n_bins"),
        sum(expr(s"(CAST(1000000 AS $d38c) " +
          "* (1000000 * sy - sp) * (1000000 * sy - sp) * nb) " +
          s"div (CAST(sp AS $d38c) * (nb * 1000000 - sp))")).as("hl"))
      .select(col("n_bins"), col("hl").cast("long").as("hl_u6"))
  }

  /** q305: EXPECTED + MAXIMUM CALIBRATION ERROR over the q254 bins —
    * the single-number calibration summaries every model card quotes:
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b| (bin errors weighted by mass)
    * and MCE = max_b |acc_b − conf_b| (the worst bin). Closes the
    * calibration family: q254 diagram, q296 decomposition, q304
    * significance, q305 the headline numbers.
    *
    * Exactness: |acc_b − conf_b| = |10⁶·sy − sp|/(n_b·10⁶) exactly,
    * so ECE_ppm = Σ|10⁶·sy − sp| // N (the n_b·10⁶ denominators
    * cancel against the weights — ZERO per-bin floors, one final
    * integral floor of exact integers) and MCE_ppm = max of one
    * per-bin floor. Integer arithmetic end to end; rides
    * [[predictorBins]] / [[brierCtes]]. One bin-grain aggregate. */
  val calibrationError: Q = Q(
    "q305_calibration_error",
    predictorCte + brierCtes + """
      |SELECT CAST(count(*) AS BIGINT) AS n_bins,
      |       CAST(CAST(sum(abs(1000000 * sy - sp)) AS HUGEINT)
      |            // CAST(sum(nb) AS HUGEINT) AS BIGINT) AS ece_ppm,
      |       CAST(max(abs(1000000 * sy - sp) // nb) AS BIGINT) AS mce_ppm
      |FROM bins""".stripMargin
  ) { (s, dir) =>
    predictorBins(s, dir)
      .agg(count(lit(1)).as("n_bins"),
        sum(expr("abs(1000000 * sy - sp)")).as("sae"),
        sum(col("nb")).as("nn"),
        max(expr("abs(1000000 * sy - sp) div nb")).as("mce_ppm"))
      .select(col("n_bins"), expr("sae div nn").cast("long").as("ece_ppm"),
        col("mce_ppm"))
  }

  val all: Seq[Q] = Seq(rateAnomaly, recordLinkage, clusterSplit,
    qualityCanonical, simhashCalibration, eventQuota, readability,
    eventTransitions, dataValidation, hoppingCounts, ewmaTrend,
    holtTrend, compressionQuality, corpusPipelineV4, madAnomaly,
    thresholdChurn, anomalyConsensus, forecastBacktest, mixtureWeights,
    calibrationBins, cumulativeGains, maseBacktest, brierDecomposition,
    rocAuc, hosmerLemeshow, calibrationError, holtWinters, croston)
}
