package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{CoOccurrence, Paths}
import graft.sources.Tables

/** Round-10 wave: GRAPH-DISTANCE analytics over the co-purchase graph
  * (the q125/q199 edge set) — [[graft.operators.Paths]]' bounded BFS
  * probed two ways: the per-node distance map from the top hub and
  * the catalog-reach histogram from the top-3 hub set. Both
  * hash-oracle against DuckDB via the unrolled Bellman-Ford form
  * (min-dist over UNION ALL per layer), which computes the identical
  * distance map as the frontier-only Spark loop — see
  * [[Paths.boundedDistances]]'s scaladoc for why the two forms agree.
  *
  * The common SQL prefix: baskets → support-≥2 co-purchase pairs →
  * symmetric edge list → degree table, exactly q125's graph.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The symmetric co-purchase edge list + seed selection shared by
    * q214/q215: edges from [[CoOccurrence.pairCounts]] (support ≥ 2,
    * the q125 contract), seeds = the `k` highest-degree nodes with
    * (degree desc, id asc) total-order tie-break — deterministic, so
    * the oracle picks the identical seed set. */
  private def edgesAndSeeds(s: SparkSession, dir: String,
      k: Int): (DataFrame, DataFrame, DataFrame) = {
    // pin the pair table: it is scanned by BOTH union branches of the
    // symmetric edge list, and the edge list is in turn scanned by the
    // seed rollup AND re-materialized by boundedDistances' edge pin —
    // unpinned, the basket self-join re-executed 4× (r14 optimization:
    // q214 profile)
    val pairs = CoOccurrence.pairCounts(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", minShared = 2)
      .select(col("item_a"), col("item_b"))
      .localCheckpoint(true)
    val edges = pairs.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(pairs.select(col("item_b").as("src"), col("item_a").as("dst")))
    // degree rollup via ONE explode pass over the pinned pair table:
    // each undirected pair contributes 1 to both endpoints, identical
    // to grouping the symmetric union by src, but the union form scans
    // the checkpoint once per leg (2×10 tasks, ~2 s CPU measured on
    // q214 at sf0.1) where the explode form scans it once (r15
    // optimization, guide §2.3 — aggregate over fewer scanned bytes).
    val seeds = pairs
      .select(explode(array(col("item_a"), col("item_b"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("id").asc)
      .limit(k)
      .select("id")
    (pairs, edges, seeds)
  }

  private val graphSql =
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |p AS (SELECT a.item AS ia, c.item AS ib
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |e AS (SELECT ia AS src, ib AS dst FROM p
      |      UNION ALL SELECT ib AS src, ia AS dst FROM p),
      |deg AS (SELECT src AS id, count(*) AS d FROM e GROUP BY 1),""".stripMargin

  /** The unrolled 4-hop min-dist pyramid over `e` starting from `s0`
    * (id, dist) — Bellman–Ford stated in SQL: each layer re-expands
    * the FULL reached set and keeps the min; identical result to the
    * Spark side's frontier-only loop. */
  private val bfs4Sql =
    """x1 AS (SELECT e.dst AS id, s0.dist + 1 AS dist FROM e JOIN s0 ON e.src = s0.id),
      |s1 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM s0 UNION ALL SELECT * FROM x1) GROUP BY id),
      |x2 AS (SELECT e.dst AS id, s1.dist + 1 AS dist FROM e JOIN s1 ON e.src = s1.id),
      |s2 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM s1 UNION ALL SELECT * FROM x2) GROUP BY id),
      |x3 AS (SELECT e.dst AS id, s2.dist + 1 AS dist FROM e JOIN s2 ON e.src = s2.id),
      |s3 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM s2 UNION ALL SELECT * FROM x3) GROUP BY id),
      |x4 AS (SELECT e.dst AS id, s3.dist + 1 AS dist FROM e JOIN s3 ON e.src = s3.id),
      |s4 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM s3 UNION ALL SELECT * FROM x4) GROUP BY id)""".stripMargin

  /** q214: the DISTANCE MAP from the single top-degree hub — every
    * item within 4 hops with its exact shortest-path length. The
    * per-node (not histogram) output is deliberate: it hash-pins
    * every individual BFS layer assignment, so a frontier bug that
    * mislabels even one node's layer fails the oracle. */
  val graphDistances: Q = Q(
    "q214_graph_distances",
    s"""$graphSql
      |s0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM deg
      |       ORDER BY d DESC, id ASC LIMIT 1),
      |$bfs4Sql
      |SELECT id AS item, CAST(dist AS BIGINT) AS dist FROM s4""".stripMargin
  ) { (s, dir) =>
    val (_, edges, seed) = edgesAndSeeds(s, dir, k = 1)
    Paths.boundedDistances(edges, seed, maxHops = 4)
      .select(col("id").as("item"), col("dist"))
  }

  /** q215: HUB PROXIMITY — the multi-source variant: distance to the
    * NEAREST of the top-3 hubs, rolled up to the reach histogram
    * (dist, n_items, share_ppm of all graph nodes). The
    * recommendation-reach question: what share of the catalog does a
    * k-hop walk from the hub items cover? share_ppm is the exact
    * integer rational floor(10⁶·n/|V|) — no FP division. */
  val hubProximity: Q = Q(
    "q215_hub_proximity",
    s"""$graphSql
      |seeds AS (SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT 3),
      |s0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM seeds),
      |$bfs4Sql
      |, nn AS (SELECT count(*) AS n_nodes FROM deg)
      |SELECT CAST(dist AS BIGINT) AS dist,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       (1000000 * count(*)) // max(nn.n_nodes) AS share_ppm
      |FROM s4 CROSS JOIN nn GROUP BY dist""".stripMargin
  ) { (s, dir) =>
    val (pairs, edges, seeds) = edgesAndSeeds(s, dir, k = 3)
    // node count off ONE explode pass over the pinned pair table: every
    // graph node appears as an endpoint of some pair (the union's src
    // column covers both directions), so count-distinct over the
    // exploded endpoints equals count-distinct over the union's src —
    // one checkpoint scan instead of two (r15, same reasoning as the
    // seed rollup above)
    val nNodes = pairs
      .select(explode(array(col("item_a"), col("item_b"))).as("id"))
      .distinct()
      .agg(count(lit(1)).as("n_nodes"))
    Paths.boundedDistances(edges, seeds, maxHops = 4)
      .groupBy("dist")
      .agg(count(lit(1)).as("n_items"))
      .crossJoin(broadcast(nNodes))
      .select(col("dist"), col("n_items"),
        expr("(1000000 * n_items) div n_nodes").cast(LongType).as("share_ppm"))
  }

  /** q265: DEGREE ASSORTATIVITY of the co-purchase graph — do hub
    * products co-occur with other hubs (r > 0, a "core catalog") or
    * with the long tail (r < 0, hub-and-spoke)? The number that says
    * whether q126's neighbor lists concentrate or spread demand, and
    * the edge-grain companion of q199/q206's triangle view. Newman's
    * r = Pearson correlation of endpoint degrees over DIRECTED edges
    * (each undirected edge counted in both orientations, the standard
    * symmetrization), computed from six exact BIGINT moment sums (deg
    * ≤ |items|, every product far inside int64) with ONE final
    * fixed-shape double — the q262 discipline on a graph statistic.
    *
    * Scale shape: edges come from the df-capped q125 pair build (the
    * adjudicated co-occurrence cost class); degrees are an item-grain
    * aggregate joined back onto edges by item key — two hash joins at
    * edge grain, one 6-sum reduce to a single row. No window, no
    * iteration. */
  val degreeAssortativity: Q = Q(
    "q265_degree_assortativity",
    """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
      |           FROM lineitem),
      |p AS (SELECT a.item AS item_a, c.item AS item_b
      |      FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |s AS (SELECT item_a AS item, item_b AS partner FROM p
      |      UNION ALL
      |      SELECT item_b AS item, item_a AS partner FROM p),
      |d AS (SELECT item, CAST(count(*) AS BIGINT) AS deg FROM s GROUP BY 1),
      |e AS (SELECT da.deg AS x, db.deg AS y
      |      FROM s JOIN d da ON s.item = da.item
      |             JOIN d db ON s.partner = db.item),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS mm,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(x * y) AS BIGINT) AS sxy,
      |        CAST(sum(x * x) AS BIGINT) AS sxx,
      |        CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM e)
      |SELECT mm AS n_directed_edges,
      |  CAST(round(1000.0 * (mm*sxy - sx*sy)
      |    / sqrt(CAST(mm*sxx - sx*sx AS DOUBLE) * (mm*syy - sy*sy)))
      |    AS BIGINT) AS assortativity_milli
      |FROM m""".stripMargin
  ) { (s, dir) =>
    // deliberately NOT pinned despite the 41-Exchange before-plan: the
    // duplicated pair-build subtrees are deduped by AQE's runtime
    // stage reuse within this single plan, and an eager pin here
    // measured 1.28× SLOWER (r14 optimization A/B)
    val p = graft.operators.CoOccurrence.pairs(
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", minShared = 2)
      .select("item_a", "item_b")
    val sEdges = p.select(col("item_a").as("item"), col("item_b").as("partner"))
      .union(p.select(col("item_b").as("item"), col("item_a").as("partner")))
    val d = sEdges.groupBy("item").agg(count(lit(1)).as("deg"))
    sEdges
      .join(d, Seq("item"))
      .join(d.withColumnRenamed("item", "partner")
        .withColumnRenamed("deg", "deg_p"), Seq("partner"))
      .select(col("deg").as("x"), col("deg_p").as("y"))
      .agg(count(lit(1)).as("mm"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("mm").as("n_directed_edges"),
        expr("CAST(round(1000.0 * (mm*sxy - sx*sy) " +
          "/ sqrt(CAST(mm*sxx - sx*sx AS DOUBLE) * (mm*syy - sy*sy))) " +
          "AS BIGINT)").as("assortativity_milli"))
  }

  val all: Seq[Q] = Seq(graphDistances, hubProximity, degreeAssortativity)
}
