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
    val d = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tw = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    d.withColumn("s", sum(col("n")).over(tw))
      .withColumn("ss", sum(col("n") * col("n")).over(tw))
      .withColumn("k", count(lit(1)).over(tw))
      .filter(col("k") === 7 &&
        (lit(7) * col("n") - col("s")) * (lit(7) * col("n") - col("s")) >
          lit(4) * (lit(7) * col("ss") - col("s") * col("s")))
      .select(col("day"), col("event_type"), col("n"),
        col("s").as("trail_sum"), (lit(7) * col("n") - col("s")).as("dev7"))
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

  val all: Seq[Q] = Seq(rateAnomaly, recordLinkage, clusterSplit,
    qualityCanonical)
}
