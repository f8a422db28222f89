package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Registry

/** Plan-quality assertions — the 100 TB posture, checked mechanically:
  * filters/projections must reach the parquet scan, dimension joins must
  * broadcast, aggregates must have a map-side partial phase, hot paths
  * must stay inside whole-stage codegen. A plan regression fails CI even
  * while results stay correct. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = Registry.byName(name).fn(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: predicates are pushed to the parquet scan") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // unused columns are pruned from the scan
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("l_partkey"),
      "scan reads pruned column l_partkey")
  }

  test("q07: dimension tables join via broadcast hash join") {
    val p = plan("q07_join_enrich")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q31: query vectors are broadcast against the corpus scan") {
    val p = plan("q31_knn_cosine")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q03: aggregation has a partial (map-side) phase before the shuffle") {
    val p = plan("q03_daily_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q30: similarity pair join broadcasts the small side and uses DotProductL") {
    val p = plan("q30_embedding_neardup")
    // broadcast nested-loop (range condition), never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.toLowerCase.contains("dotproductl"),
      "custom expression missing from plan")
  }

  test("RewriteDotProduct: declarative HOF dot product is rewritten to DotProductL") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    val df = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(V.quantize(col("embedding")).as("qv"))
      .select(V.dotQ(col("qv"), col("qv")).as("nsq"))     // declarative form
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.toLowerCase.contains("dotproductl"), p.take(1500))
    assert(!p.contains("aggregate(zip_with"), "HOF survived the rewrite")
    // and it computes the same values as the unrewritten interpreter path
    val direct = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(V.quantize(col("embedding")).as("qv"))
      .select(graft.functions.expressions.GraftExpressions
        .dotQFast(col("qv"), col("qv")).as("nsq"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      direct.collect().map(_.getLong(0)).toSeq)
  }

  test("q02: window delta shuffles once on the partition key") {
    val p = plan("q02_running_delta")
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p.take(2000))
  }
}
