package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — the equi-join plan for interval × point joins.
  *
  * Spark executes a bare `p.ts BETWEEN i.lo AND i.hi` join as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * broadcasts): every point is tested against every interval — O(n·m),
  * the plan that dies first at corpus scale. The standard fix (the
  * shape behind Databricks' range-join optimization and Flink's
  * interval join) is to overlay a fixed grid: replicate each interval
  * to every `binWidth`-wide bin it overlaps, map each point to its one
  * containing bin, hash-join on the bin id, and keep the residual
  * range predicate as a post-join filter. Each (interval, point) match
  * meets in exactly the point's bin, so no dedup pass is needed; work
  * is O(n + m·span/binWidth + matches).
  *
  * `binWidth` is the knob: it should be on the order of the TYPICAL
  * interval span — too small replicates long intervals across many
  * bins, too large piles unrelated points into each bin's hash bucket.
  * Skewed bins (a hot time window) are ordinary join skew — AQE's
  * skew split applies, same as any equi-join.
  */
object RangeJoin {

  /** Join `points` (at `ptCol`, integral) to every interval in
    * `intervals` with `loCol <= pt < hiCol` (half-open; lo/hi
    * integral; a row with lo >= hi matches nothing and is dropped
    * before binning). Column names must be disjoint across the two
    * frames. Returns matched rows carrying both frames' columns. */
  def binnedPointJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points/intervals column names must be disjoint, both have: " +
        overlap.mkString(", "))
    // pmod: floorDiv semantics for negative domains too — (x - mod) / w
    // is the floor division both engines agree on. BOTH the subtraction
    // and the division run in DECIMAL(38,0), not long/DOUBLE: an
    // epoch-NANOS timeline (~2^60) exceeds a double's 2^53 integer
    // range, and a long subtraction would WRAP for values within one
    // binWidth of Long.MinValue (x - pmod < Long.MinValue), yielding a
    // wrong bin id and silently dropped matches at the domain edge.
    // The numerator is an exact multiple of binWidth, so the decimal
    // quotient is an exact integer and the long cast is lossless.
    def bin(c: org.apache.spark.sql.Column) =
      ((c.cast("decimal(38,0)") - pmod(c, lit(binWidth)).cast("decimal(38,0)"))
        / lit(binWidth)).cast("long")
    // inverted intervals (lo >= hi) are dropped BEFORE the explode:
    // `lo <= pt < hi` is unsatisfiable for them, so this is exact
    // semantics — and without the guard, sequence() auto-steps -1 on a
    // descending range, so ONE corrupt row (swapped bounds) would
    // enumerate every bin from bin(lo) down to bin(hi-1): ~10¹²
    // elements on a microsecond timeline, an executor-killing
    // explosion instead of an empty match set.
    val binned = intervals.filter(col(loCol) < col(hiCol))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol) - lit(1)))))
    points.withColumn("__bin", bin(col(ptCol)))
      .join(binned,
        Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
