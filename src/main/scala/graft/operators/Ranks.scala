package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed global ranking. A bare `row_number() OVER (ORDER BY …)`
  * moves every row through ONE task (Spark warns "Moving all data to a
  * single partition") — fine for a 39-state dimension, dead at 100 TB.
  *
  * [[globalRowNumber]] is the two-phase form: range-partition on the
  * sort key, sort within partitions, then `zipWithIndex` — partition i
  * holds keys strictly below partition i+1, so partition-ordered local
  * indices + per-partition offsets ARE the global rank. zipWithIndex
  * computes the offsets with one lightweight counting job; both that
  * job and the indexing pass run over the SAME RDD graph, so the range
  * exchange executes once and its shuffle files are reused — the
  * nondeterministic re-sampling of `repartitionByRange` (which
  * produced duplicate ranks at sf0.1 when two separate plans consumed
  * the same ranged frame) cannot occur by construction, with no
  * full-data materialization and no cache to manage. One caveat:
  * `zipWithIndex` computes its per-partition offsets EAGERLY (a
  * lightweight counting job runs when this function is CALLED, not at
  * the first downstream action), so construct the frame only when the
  * rank is actually wanted.
  *
  * This is one of the rare justified RDD drops: the operator is
  * genuinely positional-per-partition, which Catalyst has no operator
  * for, and the alternative (two DataFrame consumers of one exchange)
  * needs an eager checkpoint to stay deterministic — measured 20×
  * slower at sf0.1 than the single-pass form.
  */
object Ranks {

  /** Global 1-based dense row numbering by `order` (which must be a
    * total order — include a unique tiebreaker — for deterministic
    * output). Result column `out` is IntegerType like `row_number`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      // IntegerType output mirrors row_number; past 2^31-1 rows the
      // rank would silently wrap negative — fail loudly instead (emit
      // LongType ranks from a widened variant if that scale ever lands)
      require(idx + 1 <= Int.MaxValue,
        s"globalRowNumber overflows IntegerType at row ${idx + 1}")
      Row.fromSeq(row.toSeq :+ (idx + 1).toInt)
    }
    spark.createDataFrame(indexed,
      sorted.schema.add(out, IntegerType, nullable = false))
  }

  /** Global inclusive running sum of `value` (null counts as 0) in
    * `order` — the prefix-sum sibling of [[globalRowNumber]], the
    * scalable form of `sum(v) OVER (ORDER BY …)` (which Spark executes
    * in ONE task). Since r10 this routes through the NATIVE Catalyst
    * operator ([[graft.plans.RunningSum]] → `RunningSumExec`,
    * registered by `GraftExtensions`): the planner owns the range
    * exchange (EnsureRequirements inserts it from the operator's
    * required distribution + ordering), rows stay UnsafeRow end to
    * end (the RDD form paid a Row conversion each way), and the
    * subtotal job runs at ACTION time instead of eagerly at call
    * time. The fused multi-column RDD form below remains for callers
    * needing several prefixes over one order. Simple attribute
    * references in `order`/`value` (incl. `.asc` and `lit`s) resolve
    * against `df`'s analyzed output; `numPartitions` is accepted for
    * API compatibility but the planner chooses the exchange's
    * partitioning (correctness is partition-count-independent by
    * construction).
    *
    * `order` must be a total order for a deterministic result. Output
    * column `out` is LongType; sums must stay within Long range
    * (`Math.addExact` fails loudly). */
  def globalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String, numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Cast, Expression, SortOrder}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val lp = df.queryExecution.analyzed
    val resolver = df.sparkSession.sessionState.conf.resolver
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute =>
        val n = u.nameParts.last
        lp.output.filter(a => resolver(a.name, n)) match {
          case collection.Seq(a) => a
          case other => sys.error(
            s"globalRunningSum: '$n' resolved to ${other.size} columns " +
              s"of ${lp.output.map(_.name)}")
        }
    }
    val orderExprs = order.map(c => resolve(ColumnBridge.catalystExpression(c)) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val v1 = resolve(ColumnBridge.catalystExpression(value))
    val v = if (v1.dataType == LongType) v1 else Cast(v1, LongType)
    val outAttr = AttributeReference(out, LongType, nullable = false)()
    ColumnBridge.ofRows(df.sparkSession,
      graft.plans.RunningSum(orderExprs, v, outAttr, lp))
  }

  /** N running sums in ONE two-phase pass — a caller needing several
    * prefix columns over the same order (q231's two per-group CDFs)
    * would otherwise pay a full range exchange + sort PER COLUMN; here
    * every extra column costs one Long of subtotal per partition and
    * one addition per row. Same construction and determinism contract
    * as the single-column form above. */
  def globalRunningSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)], numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "need at least one value column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val k = values.size
    val tmp = values.indices.map(i => s"__grs_v$i")
    val withVals = values.zipWithIndex.foldLeft(df) {
      case (d, ((v, _), i)) => d.withColumn(tmp(i), v.cast(LongType))
    }
    val sorted = withVals
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val idxs = tmp.map(sorted.schema.fieldIndex).toArray
    val rdd = sorted.rdd
    val subtotals = rdd.mapPartitionsWithIndex({ (i, it) =>
      val s = new Array[Long](k)
      it.foreach { r =>
        var j = 0
        while (j < k) {
          if (!r.isNullAt(idxs(j)))
            s(j) = Math.addExact(s(j), r.getLong(idxs(j)))
          j += 1
        }
      }
      Iterator((i, s))
    }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(j => Math.addExact(a(j), b(j)))
    }.dropRight(1)
    val summed = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).clone()
      it.map { r =>
        var j = 0
        while (j < k) {
          if (!r.isNullAt(idxs(j)))
            acc(j) = Math.addExact(acc(j), r.getLong(idxs(j)))
          j += 1
        }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    val schema = values.foldLeft(sorted.schema) {
      case (sc, (_, out)) => sc.add(out, LongType, nullable = false)
    }
    spark.createDataFrame(summed, schema).drop(tmp: _*)
  }
}
