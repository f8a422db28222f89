package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** GLOBAL RUNNING SUM as a first-class Catalyst operator — the custom
  * LogicalPlan + Strategy + SparkPlan tier of the extension stack
  * (expressions: `GraftExpressions`; optimizer rule:
  * [[RewriteDotProduct]]; this file: a whole-operator semantic Spark's
  * built-ins cannot express at scale).
  *
  * `sum(v) OVER (ORDER BY …)` is the semantic, but Spark's Window
  * REQUIRES a single partition for a global order — every row funnels
  * through one task (the warning PlanSpec bans repo-wide). The
  * two-phase form — range-partition on the order key, per-partition
  * subtotals (one Long each) become exclusive offsets, then one
  * streaming accumulation pass — previously lived as an RDD drop in
  * `operators/Ranks`; this operator expresses it INSIDE the planner:
  *
  *  - `requiredChildDistribution = OrderedDistribution(order)` and
  *    `requiredChildOrdering = order` make EnsureRequirements insert
  *    the range exchange + local sort — the planner owns the shuffle,
  *    AQE sees the whole plan, and `explain` shows `RunningSumExec`
  *    instead of an opaque `ExistingRDD` boundary;
  *  - rows stay `InternalRow`/UnsafeRow end to end (the RDD form paid
  *    a Row conversion each way across `df.rdd`);
  *  - the subtotal job runs inside `doExecute` — at ACTION time, not
  *    eagerly at construction (the RDD form's documented caveat);
  *    both passes run over the SAME child RDD instance, so the range
  *    exchange's shuffle files are written once and reused, and
  *    `repartitionByRange`'s nondeterministic re-sampling cannot
  *    split the passes (the q16 lesson, preserved).
  *
  * Determinism contract unchanged: `order` must be a total order;
  * null values count as 0; sums must stay within Long
  * (`Math.addExact` fails loudly). */
case class RunningSum(order: Seq[SortOrder], value: Expression,
    outAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  require(value.dataType == LongType,
    s"running-sum value must be LongType, got ${value.dataType}")
  // the exec appends one non-null long column; an outAttr declaring any
  // other shape would make the UnsafeProjection silently misread it
  require(outAttr.dataType == LongType,
    s"running-sum output attribute must be LongType, got ${outAttr.dataType}")
  require(!outAttr.nullable,
    "running-sum output attribute must be non-nullable (nulls count as 0)")
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): RunningSum =
    copy(child = newChild)
}

object RunningSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RunningSum(order, value, outAttr, child) =>
      RunningSumExec(order, value, outAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class RunningSumExec(order: Seq[SortOrder], value: Expression,
    outAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = order :: Nil

  // order- and partitioning-preserving: downstream ops may reuse both
  override def outputOrdering: Seq[SortOrder] = order

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): RunningSumExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val bound = BindReferences.bindReference(value, child.output)
    val childRDD = child.execute()
    // pass 1: one Long per partition; collect preserves partition order
    val subtotals = childRDD.mapPartitions { it =>
      var s = 0L
      it.foreach { r =>
        val v = bound.eval(r)
        if (v != null) s = Math.addExact(s, v.asInstanceOf[Long])
      }
      Iterator.single(s)
    }.collect()
    val offsets = subtotals.scanLeft(0L)(Math.addExact).dropRight(1)
    val attrs = output
    // pass 2: streaming accumulation from each partition's offset
    childRDD.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      val cum = new GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(attrs, attrs)
      it.map { r =>
        val v = bound.eval(r)
        if (v != null) acc = Math.addExact(acc, v.asInstanceOf[Long])
        cum.setLong(0, acc)
        proj(joined(r, cum))
      }
    }
  }
}
