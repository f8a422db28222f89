package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over an edge table — the weighted
  * companion of [[Dedup.resolve]]'s min-label propagation: resolve
  * answers "which component", this answers "how central inside the
  * whole graph" (seed-document selection, crawl prioritization,
  * source authority weighting for a mixture).
  *
  * Reference analogue: none — the reference has no graph operators;
  * this is part of the LLM-pipeline extension surface.
  */
object Centrality {

  /** PageRank in EXACT integer arithmetic: ranks are integers in
    * `scaleUnit` millionths, each propagation step credits
    * `floor(dampBp · pr / (10000 · outdeg))` to every out-neighbor
    * and every node restarts with the exact teleport share
    * `scaleUnit · (10000 − dampBp) / 10000`. Floating-point PageRank
    * is shuffle-order-dependent (FP addition does not associate), so
    * two runs of the same corpus can rank differently; the integer
    * form is bit-reproducible on any layout AND portable — any SQL
    * engine computes the identical fixed point, which is what lets
    * q123 hash-oracle a 3-iteration run against DuckDB. Quantization
    * loses < outdeg·10⁻⁶ of a unit per node per step — noise at
    * ranking granularity.
    *
    * Scale shape: `edges` (src, dst) materializes once with outdegree
    * attached (one groupBy + self-join, both keyed on src, then
    * pinned — every iteration reuses it without re-execution). Each
    * iteration is one join of the weighted edge list against the
    * current rank table on src (both sides hash-partitioned on the
    * same key) and one map-side-combining sum on dst — integer sums
    * combine partially, so a hub with 10⁸ in-edges ships one partial
    * per task, not 10⁸ rows. Ranks `localCheckpoint` per iteration
    * (lineage cut, same discipline as [[Dedup.resolveWithStats]]).
    * Hot-dst skew (a mega-hub) is partial-aggregation-bounded; the
    * join side's hot SRC (a node with huge fanout) replicates its one
    * rank row — exactly the AQE skew-join shape. Iteration count is
    * caller-fixed: centrality ranking stabilizes in a handful of
    * rounds, and a fixed count keeps the result deterministic and
    * oracle-able (no FP convergence test). */
  def integerPageRank(edges: DataFrame, iters: Int = 3,
      scaleUnit: Long = 1000000L, dampBp: Int = 8500): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampBp > 0 && dampBp < 10000, s"dampBp out of range: $dampBp")
    require(scaleUnit * (10000 - dampBp) % 10000 == 0,
      s"teleport share scaleUnit*(10000-dampBp)/10000 must be exact; " +
        s"got scaleUnit=$scaleUnit dampBp=$dampBp")
    val teleport = scaleUnit * (10000 - dampBp) / 10000
    val e = edges.select(col("src"), col("dst"))
    // weighted edge list, built once: (src, dst, outdeg)
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    var pr = nodes.withColumn("pr", lit(scaleUnit))
    for (_ <- 1 to iters) {
      val inflow = ew
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr(s"($dampBp * pr) div (10000 * outdeg)").as("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("inflow"))
      pr = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("inflow"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
