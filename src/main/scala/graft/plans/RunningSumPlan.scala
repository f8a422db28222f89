package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
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

object RunningSumExec {
  /** Driver-filled, executor-read carrier for the pass-1 offsets.
    *
    * The offsets cannot be a plain codegen reference value: references
    * are captured at CODE-GENERATION time (`doCodeGen`, which also runs
    * for `explain("codegen")`), and materializing them there would run
    * a Spark job during explain — the eager-at-construction failure
    * mode this operator was built to avoid. Instead the generated code
    * references this mutable box; [[RunningSumExec.inputRDDs]] fills it
    * at EXECUTION time, which happens on the driver strictly before the
    * stage's tasks (and therefore the box's contents) serialize for the
    * pass-2 job. */
  final class OffsetsBox extends Serializable {
    @volatile var values: Array[Long] = _
    def at(i: Int): Long = values(i)
  }
}

/** Physical running sum. Two codegen-era paths, same two-pass design:
  *
  *  - WHOLE-STAGE CODEGEN (the default): the node pipelines inside the
  *    stage — `doProduce` delegates to the child (the planner-inserted
  *    range-exchange + sort feed it), and `doConsume` compiles the
  *    per-row work to three Java statements (evaluate value,
  *    `Math.addExact` into a primitive long field initialized from this
  *    partition's offset, emit). No interpreted `eval`, no per-row
  *    `UnsafeProjection` — the r10 verdict's last non-codegen hot loop
  *    joins the pipeline, and downstream operators keep consuming
  *    variables instead of materialized rows.
  *  - INTERPRETED FALLBACK (`doExecute`, codegen disabled): the
  *    original bound-eval + JoinedRow + UnsafeProjection loop.
  *
  * Pass 1 (per-partition subtotals → exclusive offsets) is shared: it
  * runs over `child.execute()` at action time — in the codegen path
  * from [[inputRDDs]], which WholeStageCodegenExec calls after
  * compiling but before the stage RDD's tasks serialize, so the
  * range-exchange shuffle files are written once and reused by both
  * passes (the q16 lesson, preserved). Pass 1 stays interpreted by
  * design: it touches one Long per partition, not one per row. */
case class RunningSumExec(order: Seq[SortOrder], value: Expression,
    outAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode with CodegenSupport {

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

  /** Pass 1: one Long per partition; collect preserves partition order. */
  private def computeOffsets(): Array[Long] = {
    val bound = BindReferences.bindReference(value, child.output)
    val subtotals = child.execute().mapPartitions { it =>
      var s = 0L
      it.foreach { r =>
        val v = bound.eval(r)
        if (v != null) s = Math.addExact(s, v.asInstanceOf[Long])
      }
      Iterator.single(s)
    }.collect()
    subtotals.scanLeft(0L)(Math.addExact).dropRight(1)
  }

  // ---- whole-stage codegen path ----

  private val box = new RunningSumExec.OffsetsBox

  override def inputRDDs(): Seq[RDD[InternalRow]] = {
    // execution time, driver side, before task serialization: run pass 1
    // and fill the box the generated code references (see OffsetsBox)
    box.values = computeOffsets()
    child.asInstanceOf[CodegenSupport].inputRDDs()
  }

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    val boxTerm = ctx.addReferenceObj("offsetsBox", box,
      classOf[RunningSumExec.OffsetsBox].getName)
    // partition offset into a primitive field; the generated init() sets
    // partitionIndex before mutable-state init functions run
    val acc = ctx.addMutableState(CodeGenerator.JAVA_LONG, "runningSumAcc",
      v => s"$v = $boxTerm.at(partitionIndex);")
    ctx.currentVars = input
    ctx.INPUT_ROW = null
    val v = BindReferences.bindReference(value, child.output).genCode(ctx)
    val cum = ctx.freshName("cumulative")
    val accCode = ExprCode.forNonNullValue(JavaCode.variable(cum, LongType))
    s"""
       |${v.code}
       |if (!${v.isNull}) {
       |  $acc = java.lang.Math.addExact($acc, ${v.value});
       |}
       |final long $cum = $acc;
       |${consume(ctx, input :+ accCode)}
     """.stripMargin
  }

  // ---- interpreted fallback (spark.sql.codegen.wholeStage=false) ----

  override protected def doExecute(): RDD[InternalRow] = {
    val bound = BindReferences.bindReference(value, child.output)
    val childRDD = child.execute()
    val offsets = computeOffsets()
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
