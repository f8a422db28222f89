package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Q, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.*; this object is the thin façade
  * the driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way enrichment join + aggregation (SURVEY.md §3.2's serving
    * query shape, J1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_join_enrich")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
