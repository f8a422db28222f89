package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the warehouse `DESCRIBE`/dq-audit
  * primitive (null counts, distinct cardinalities, row totals per
  * column) as ONE aggregation pass over the frame, returned in long
  * form so downstream checks can join/filter on column name.
  *
  * Scale shape: a single `agg` with one `count(DISTINCT col)` per
  * profiled column — Spark plans the multi-distinct aggregate through
  * its Expand rewrite (one pass over the data, rows replicated
  * k-ways map-side, each branch partially aggregated before the
  * shuffle), so the exchange carries per-column partial states, not
  * the corpus. Profiling k columns costs one scan + one k-way
  * expanded aggregation — never k scans.
  */
object Profiling {

  /** (col_name, n_rows, n_null, n_distinct) per profiled column.
    * `n_distinct` counts non-null distinct values (both engines'
    * COUNT(DISTINCT) contract). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val aggs =
      cols.flatMap { c =>
        Seq(count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
          countDistinct(col(c)).as(s"__dist_$c"))
      }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    one.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"))
    }: _*)).as("p")).select("p.*")
  }
}
