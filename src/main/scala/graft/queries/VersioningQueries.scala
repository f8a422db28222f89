package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Centrality, CoOccurrence, Sampling, SnapshotDiff}
import graft.sources.Tables

/** Round-8 second wave: corpus versioning + the two scale operators
  * that round out the selection/ranking family — snapshot diffing
  * (the incremental-ingest primitive), weighted without-replacement
  * sampling (Efraimidis–Spirakis on the portable hash), and exact
  * integer PageRank (iterative weighted propagation, the centrality
  * companion of resolve()'s min-label components). All three are
  * fully hash-oracled: every stage is integer/string/digest math.
  */
object VersioningQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Corpus snapshot diff (q121): two crawl versions derived
    * deterministically from the documents table (old = ids with
    * id%10 ≠ 3; new = ids with id%7 ≠ 2, where every id%5 = 0 doc
    * gained a ' v2' suffix — the extractor-rerun shape), classified
    * added/removed/changed/unchanged per doc. The engine side
    * compares md5 digests projected at the scan — document text
    * never crosses the full-outer join's exchange. */
  val snapshotDiff: Q = Q(
    "q121_snapshot_diff",
    """WITH o AS (SELECT doc_id, md5(text) AS oh FROM documents
      |           WHERE doc_id % 10 <> 3),
      |n AS (SELECT doc_id,
      |             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
      |                      ELSE text END) AS nh
      |      FROM documents WHERE doc_id % 7 <> 2)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |       CASE WHEN oh IS NULL THEN 'added'
      |            WHEN nh IS NULL THEN 'removed'
      |            WHEN oh <> nh THEN 'changed'
      |            ELSE 'unchanged' END AS status
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val oldSnap = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val newSnap = docs.filter(pmod(col("doc_id"), lit(7)) =!= 2)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
  }

  /** Snapshot drift report (q122): the same diff rolled up per
    * (source, status) — the monitor a production ingest watches for
    * extractor breakage (changed spike) or crawl collapse (removed
    * spike) before a bad snapshot reaches training. */
  val snapshotDriftReport: Q = Q(
    "q122_snapshot_drift",
    """WITH o AS (SELECT doc_id, source, md5(text) AS oh FROM documents
      |           WHERE doc_id % 10 <> 3),
      |n AS (SELECT doc_id, source,
      |             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
      |                      ELSE text END) AS nh
      |      FROM documents WHERE doc_id % 7 <> 2)
      |SELECT coalesce(n.source, o.source) AS source,
      |       CASE WHEN oh IS NULL THEN 'added'
      |            WHEN nh IS NULL THEN 'removed'
      |            WHEN oh <> nh THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |       count(*) AS n_docs
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |GROUP BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val oldSnap = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val newSnap = docs.filter(pmod(col("doc_id"), lit(7)) =!= 2)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    SnapshotDiff.diffReport(oldSnap, newSnap, "doc_id", "text", "source")
  }

  /** Weighted without-replacement sample (q123): 5 docs per source
    * drawn ∝ n_chars (Efraimidis–Spirakis A-ES, deterministic
    * integer form — skey = floor(h·2^20 / w), k smallest win).
    * Bounded-heap execution: k rows per source per task cross the
    * shuffle, never the source. */
  val weightedSample: Q = Q(
    "q123_weighted_sample",
    """WITH d AS (SELECT source, doc_id, greatest(n_chars, 1) AS w,
      |                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsamp'), 1, 8)
      |                       AS BIGINT) AS h
      |           FROM documents),
      |k AS (SELECT source, doc_id, (h * 1048576) // w AS skey,
      |             row_number() OVER (PARTITION BY source
      |                  ORDER BY (h * 1048576) // w ASC, doc_id ASC) AS rn
      |      FROM d)
      |SELECT source, doc_id, CAST(skey AS BIGINT) AS skey,
      |       CAST(rn AS BIGINT) AS rn
      |FROM k WHERE rn <= 5""".stripMargin
  ) { (s, dir) =>
    Sampling.weightedPerGroup(
      t(s, dir, "documents").select("source", "doc_id", "n_chars"),
      Seq("source"), col("doc_id"), col("n_chars"), k = 5)
      .select(col("source"), col("id").as("doc_id"), col("skey"), col("rn"))
  }

  /** Co-purchase centrality (q124): exact integer PageRank, 3
    * iterations, over the symmetric customer–part bipartite graph
    * from orders ⋈ lineitem (customers encode as 2·custkey, parts as
    * 2·partkey+1 — 8-byte join keys, no string node ids). The
    * hash-oracled probe of the iterative propagation loop; FP
    * PageRank could not oracle (addition order) — the integer form
    * is bit-stable on any layout and any engine. */
  val copurchaseRank: Q = Q(
    "q124_copurchase_rank",
    """WITH pp AS (SELECT DISTINCT o.o_custkey * 2 AS c, l.l_partkey * 2 + 1 AS p
      |            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS (SELECT c AS src, p AS dst FROM pp
      |      UNION ALL SELECT p AS src, c AS dst FROM pp),
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
      |SELECT id, CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS kind,
      |       id // 2 AS key, CAST(pr AS BIGINT) AS pr
      |FROM p3""".stripMargin
  ) { (s, dir) =>
    // pin the distinct customer–part pairs: the symmetric union scans
    // them twice, and integerPageRank scans the edge frame twice more
    // (weighted-edge build + node set) — unpinned, the orders⋈lineitem
    // distinct re-executed 4× before the first iteration (r14
    // optimization: q124 profile)
    val pairs = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      .join(t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_partkey") * 2 + 1).as("p"))
      .distinct()
      .localCheckpoint(true)
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
    Centrality.integerPageRank(edges, iters = 3)
      .select(col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit("customer"))
          .otherwise(lit("part")).as("kind"),
        expr("id div 2").as("key"),
        col("pr").cast(LongType).as("pr"))
  }

  /** Basket co-occurrence pairs (q125): parts bought together within
    * an order, support ≥ 2 baskets, exact integer lift in ppm — the
    * item-based CF pair table. Baskets (orders) are naturally
    * small here so the hot-basket cap stays off; the cap's behavior
    * is spec'd separately (VersioningSpec). */
  val copurchasePairs: Q = Q(
    "q125_copurchase_pairs",
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |t AS (SELECT item, count(*) AS n FROM b GROUP BY item),
      |nb AS (SELECT count(DISTINCT bk) AS nbk FROM b),
      |p AS (SELECT a.item AS item_a, c.item AS item_b,
      |             count(*) AS n_shared
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT item_a, item_b, CAST(n_shared AS BIGINT) AS n_shared,
      |       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
      |       (1000000 * nb.nbk * n_shared) // (ta.n * tb.n) AS lift_ppm
      |FROM p
      |JOIN t ta ON ta.item = p.item_a
      |JOIN t tb ON tb.item = p.item_b
      |CROSS JOIN nb""".stripMargin
  ) { (s, dir) =>
    CoOccurrence.pairs(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", minShared = 2)
  }

  /** Item-to-item serving table (q126): top-3 co-occurring partners
    * per part by (shared baskets desc, partner asc) on the bounded
    * heap — the precomputed neighbor list a recommender reads, ranked
    * without a window over every pair row. */
  val copurchaseNeighbors: Q = Q(
    "q126_copurchase_neighbors",
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |p AS (SELECT a.item AS item_a, c.item AS item_b,
      |             count(*) AS n_shared
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |s AS (SELECT item_a AS item, item_b AS partner, n_shared FROM p
      |      UNION ALL
      |      SELECT item_b AS item, item_a AS partner, n_shared FROM p),
      |r AS (SELECT item, partner, CAST(n_shared AS BIGINT) AS n_shared,
      |             CAST(row_number() OVER (PARTITION BY item
      |                  ORDER BY n_shared DESC, partner ASC) AS BIGINT) AS rn
      |      FROM s)
      |SELECT item, partner, n_shared, rn FROM r WHERE rn <= 3""".stripMargin
  ) { (s, dir) =>
    CoOccurrence.topNeighbors(
      CoOccurrence.pairs(
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", minShared = 2),
      k = 3)
  }

  /** Directed association rules (q238): the support-confidence mining
    * step over q125's co-purchase pair table — confidence(a→b) =
    * n_shared/n_a in exact ppm, both directions per pair, gated at
    * 10% — calibrated to this corpus' basket sparsity (max observed
    * confidence 14.3%), keeping the head of the rule distribution
    * without emptying it. Rides
    * [[CoOccurrence.rules]]: pair-table-sized, no new pass over
    * lineitem beyond q125's own plan. */
  val assocRules: Q = Q(
    "q238_assoc_rules",
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |t AS (SELECT item, count(*) AS n FROM b GROUP BY item),
      |nb AS (SELECT count(DISTINCT bk) AS nbk FROM b),
      |p AS (SELECT a.item AS item_a, c.item AS item_b,
      |             count(*) AS n_shared
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |pl AS (SELECT item_a, item_b, CAST(n_shared AS BIGINT) AS n_shared,
      |              CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
      |              (1000000 * nb.nbk * n_shared) // (ta.n * tb.n) AS lift_ppm
      |       FROM p
      |       JOIN t ta ON ta.item = p.item_a
      |       JOIN t tb ON tb.item = p.item_b
      |       CROSS JOIN nb),
      |r AS (SELECT item_a AS antecedent, item_b AS consequent, n_shared,
      |             n_a AS n_ant, lift_ppm FROM pl
      |      UNION ALL
      |      SELECT item_b AS antecedent, item_a AS consequent, n_shared,
      |             n_b AS n_ant, lift_ppm FROM pl)
      |SELECT antecedent, consequent, n_shared, n_ant, lift_ppm,
      |       (1000000 * n_shared) // n_ant AS conf_ppm
      |FROM r WHERE (1000000 * n_shared) // n_ant >= 100000""".stripMargin
  ) { (s, dir) =>
    CoOccurrence.rules(
      CoOccurrence.pairs(
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", minShared = 2),
      minConfPpm = 100000L)
      .select("antecedent", "consequent", "n_shared", "n_ant",
        "lift_ppm", "conf_ppm")
  }

  /** Incremental reprocess (q130): the pipeline [[SnapshotDiff]]
    * exists to enable — only the added+changed slice of the new
    * snapshot is reprocessed, here through exact-digest dedup against
    * the UNCHANGED remainder (the "existing store"): a slice doc
    * whose content digest already exists among unchanged docs is a
    * re-post, not new content. Per-source report of (slice docs,
    * dups-of-existing, net-new). Every stage is digest math — the
    * whole incremental path hash-oracles, and no stage ever rescans
    * the unchanged corpus text beyond its digest projection. */
  val incrementalReprocess: Q = Q(
    "q130_incremental_reprocess",
    """WITH o AS (SELECT doc_id, md5(text) AS oh FROM documents
      |           WHERE doc_id % 10 <> 3),
      |n AS (SELECT doc_id, source,
      |             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
      |                      ELSE text END) AS nh
      |      FROM documents WHERE doc_id % 7 <> 2),
      |d AS (SELECT n.doc_id, n.source, n.nh,
      |             CASE WHEN o.doc_id IS NULL THEN 'added'
      |                  WHEN o.oh <> n.nh THEN 'changed'
      |                  ELSE 'unchanged' END AS status
      |      FROM n LEFT JOIN o ON o.doc_id = n.doc_id),
      |store AS (SELECT DISTINCT nh FROM d WHERE status = 'unchanged'),
      |slice AS (SELECT d.doc_id, d.source, d.nh, d.status,
      |                 (store.nh IS NOT NULL) AS dup_existing
      |          FROM d LEFT JOIN store USING (nh)
      |          WHERE d.status <> 'unchanged')
      |SELECT source, count(*) AS n_slice,
      |       CAST(sum(CASE WHEN dup_existing THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_dup_of_existing,
      |       CAST(sum(CASE WHEN dup_existing THEN 0 ELSE 1 END) AS BIGINT)
      |         AS n_net_new
      |FROM slice GROUP BY source""".stripMargin
  ) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val oldSnap = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
      .select(col("doc_id"), md5(col("text")).as("oh"))
    val newSnap = docs.filter(pmod(col("doc_id"), lit(7)) =!= 2)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"), md5(col("text")).as("nh"))
    val d = newSnap.join(oldSnap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("nh"),
        when(col("oh").isNull, lit("added"))
          .when(col("oh") =!= col("nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
    val store = d.filter(col("status") === "unchanged")
      .select(col("nh")).distinct()
    d.filter(col("status") =!= "unchanged")
      .join(store.withColumn("__hit", lit(true)), Seq("nh"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_slice"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_dup_of_existing"),
        sum(when(col("__hit"), 0L).otherwise(1L)).as("n_net_new"))
  }

  /** q199: per-item TRIANGLE counts in the co-purchase graph (q125's
    * edge set, minShared ≥ 2) — the local-cohesion census: an item in
    * many triangles sits inside a tight product community, not a
    * chain; triangle density is the standard community-vs-noise signal
    * before clustering the graph. The engine runs
    * [[Centrality.triangleCounts]]' degree-ordered orientation (hub-
    * safe: no degree² wedge fan-out — the scale argument lives there);
    * the oracle enumerates naively on a < b < c. Both produce the
    * identical triangle SET, so the per-node rollup hash-matches while
    * the engine keeps the shape that survives a power-law degree
    * distribution at 100 TB. */
  val triangleCount: Q = Q(
    "q199_triangle_count",
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |p AS (SELECT a.item AS ia, c.item AS ib
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |tr AS (SELECT e1.ia AS a, e1.ib AS b2, e2.ib AS c
      |       FROM p e1
      |       JOIN p e2 ON e2.ia = e1.ib
      |       JOIN p e3 ON e3.ia = e1.ia AND e3.ib = e2.ib),
      |m AS (SELECT unnest([a, b2, c]) AS item FROM tr)
      |SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM m GROUP BY 1""".stripMargin
  ) { (s, dir) =>
    Centrality.triangleCounts(CoOccurrence.pairCounts(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", minShared = 2))
  }

  /** q206: LOCAL CLUSTERING COEFFICIENT per item — q199's triangle
    * census normalized by the wedge capacity: cc = 2·tri / (deg·(deg−1))
    * in exact integer ppm, the per-node "how clique-like is my
    * neighborhood" number community detection thresholds on. One
    * degree rollup + a left join onto the (hub-safe, q199) triangle
    * counts; zero-triangle nodes stay in the report — a high-degree
    * item with cc = 0 is a CONNECTOR, the interesting anti-community
    * signal a triangles-only view silently drops. Only deg ≥ 2 nodes
    * qualify (a degree-1 node has no wedge to close). */
  val clusteringCoefficient: Q = Q(
    "q206_clustering_coeff",
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |p AS (SELECT a.item AS ia, c.item AS ib
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg FROM (
      |          SELECT ia AS item FROM p
      |          UNION ALL SELECT ib AS item FROM p) GROUP BY 1),
      |tr AS (SELECT e1.ia AS a, e1.ib AS b2, e2.ib AS c
      |       FROM p e1
      |       JOIN p e2 ON e2.ia = e1.ib
      |       JOIN p e3 ON e3.ia = e1.ia AND e3.ib = e2.ib),
      |tc AS (SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
      |       FROM (SELECT unnest([a, b2, c]) AS item FROM tr) GROUP BY 1)
      |SELECT deg.item, deg.deg,
      |       coalesce(tc.n_triangles, 0) AS n_triangles,
      |       (2000000 * coalesce(tc.n_triangles, 0))
      |         // (deg.deg * (deg.deg - 1)) AS cc_ppm
      |FROM deg LEFT JOIN tc USING (item)
      |WHERE deg.deg >= 2""".stripMargin
  ) { (s, dir) =>
    Centrality.triangleCountsWithDegrees(CoOccurrence.pairCounts(
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", minShared = 2))
      .filter(col("deg") >= 2)
      .select(col("item"), col("deg"), col("n_triangles"),
        expr("(2000000 * n_triangles) div (deg * (deg - 1))").as("cc_ppm"))
  }

  val all: Seq[Q] = Seq(snapshotDiff, snapshotDriftReport, weightedSample,
    copurchaseRank, copurchasePairs, copurchaseNeighbors,
    incrementalReprocess, triangleCount, clusteringCoefficient,
    assocRules)
}
