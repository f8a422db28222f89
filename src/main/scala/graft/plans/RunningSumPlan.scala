package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** GLOBAL RUNNING SUMS as a first-class Catalyst operator — the custom
  * LogicalPlan + Strategy + SparkPlan tier of the extension stack
  * (expressions: `GraftExpressions`; optimizer rule:
  * [[RewriteDotProduct]]; this file: a whole-operator semantic Spark's
  * built-ins cannot express at scale).
  *
  * `sum(v) OVER (ORDER BY …)` is the semantic, but Spark's Window
  * REQUIRES a single partition for a global order — every row funnels
  * through one task (the warning PlanSpec bans repo-wide). The
  * two-phase form — range-partition on the order key, per-partition
  * subtotals (k Longs each) become exclusive offsets, then one
  * streaming accumulation pass — previously lived as RDD drops in
  * `operators/Ranks`; this operator expresses it INSIDE the planner:
  *
  *  - `requiredChildDistribution = OrderedDistribution(order)` and
  *    `requiredChildOrdering = order` make EnsureRequirements insert
  *    the range exchange + local sort — the planner owns the shuffle,
  *    AQE sees the whole plan, and `explain` shows `RunningSumExec`
  *    instead of an opaque `ExistingRDD` boundary;
  *  - rows stay `InternalRow`/UnsafeRow end to end (the RDD form paid
  *    a Row conversion each way across `df.rdd`);
  *  - the subtotal job runs at ACTION time, not eagerly at
  *    construction (the RDD form's documented caveat); the range
  *    exchange's shuffle files are written once and reused by both
  *    passes, and `repartitionByRange`'s nondeterministic re-sampling
  *    cannot split the passes (the q16 lesson, preserved);
  *  - N columns sum in ONE pass (r11 — the fused multi-column form,
  *    previously a separate RDD drop): every extra column costs one
  *    Long of subtotal per partition and one addition per row, never
  *    a second exchange;
  *  - `row_number() OVER (ORDER BY …)` is the `values = lit(1)` case,
  *    so `Ranks.globalRowNumber` rides the same operator (r11 —
  *    replacing the `zipWithIndex` RDD drop and its eager counting
  *    job).
  *
  * Determinism contract unchanged: `order` must be a total order;
  * null values count as 0; sums must stay within Long
  * (`Math.addExact` fails loudly). */
case class RunningSum(order: Seq[SortOrder], values: Seq[Expression],
    outAttrs: Seq[AttributeReference], child: LogicalPlan) extends UnaryNode {
  require(values.nonEmpty, "running sum needs at least one value column")
  require(values.size == outAttrs.size,
    s"${values.size} values but ${outAttrs.size} output attributes")
  values.foreach(v => require(v.dataType == LongType,
    s"running-sum value must be LongType, got ${v.dataType}"))
  // the exec appends non-null long columns; an outAttr declaring any
  // other shape would make the UnsafeProjection silently misread it
  outAttrs.foreach { a =>
    require(a.dataType == LongType,
      s"running-sum output attribute must be LongType, got ${a.dataType}")
    require(!a.nullable,
      "running-sum output attribute must be non-nullable (nulls count as 0)")
  }
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): RunningSum =
    copy(child = newChild)
}

object RunningSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RunningSum(order, values, outAttrs, child) =>
      RunningSumExec(order, values, outAttrs, planLater(child)) :: Nil
    case _ => Nil
  }
}

object RunningSumExec {
  /** Driver-filled, executor-read carrier for the pass-1 offsets
    * (`values(partition)(column)`).
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
    @volatile var values: Array[Array[Long]] = _
    def at(partition: Int, column: Int): Long = values(partition)(column)
  }
}

/** Physical running sums. Two codegen-era paths, same two-pass design:
  *
  *  - WHOLE-STAGE CODEGEN (the default): the node pipelines inside the
  *    stage — `doProduce` delegates to the child (the planner-inserted
  *    range-exchange + sort feed it), and `doConsume` compiles the
  *    per-row work to three Java statements per column (evaluate,
  *    `Math.addExact` into a primitive long field initialized from
  *    this partition's offset, emit). No interpreted `eval`, no
  *    per-row `UnsafeProjection` — downstream operators keep consuming
  *    variables instead of materialized rows.
  *  - INTERPRETED FALLBACK (`doExecute`, codegen disabled): the
  *    bound-eval + JoinedRow + UnsafeProjection loop.
  *
  * Pass 1 (per-partition subtotals → exclusive offsets) is shared: it
  * runs over `child.execute()` at action time — in the codegen path
  * from [[inputRDDs]], which WholeStageCodegenExec calls after
  * compiling but before the stage RDD's tasks serialize, so the
  * range-exchange shuffle files are written once and reused by both
  * passes (the q16 lesson, preserved). Pass 1 stays interpreted by
  * design: it touches k Longs per partition, not k per row. */
case class RunningSumExec(order: Seq[SortOrder], values: Seq[Expression],
    outAttrs: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = child.output ++ outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = order :: Nil

  // order- and partitioning-preserving: downstream ops may reuse both
  override def outputOrdering: Seq[SortOrder] = order

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): RunningSumExec =
    copy(child = newChild)

  /** Pass 1: k Longs per partition; collect preserves partition order;
    * exclusive scan per column yields each partition's start offsets. */
  private def computeOffsets(): Array[Array[Long]] = {
    val bound = values.map(BindReferences.bindReference(_, child.output))
    val k = bound.size
    val subtotals = child.execute().mapPartitions { it =>
      val s = new Array[Long](k)
      it.foreach { r =>
        var i = 0
        while (i < k) {
          val v = bound(i).eval(r)
          if (v != null) s(i) = Math.addExact(s(i), v.asInstanceOf[Long])
          i += 1
        }
      }
      Iterator.single(s)
    }.collect()
    val offsets = new Array[Array[Long]](subtotals.length)
    val run = new Array[Long](k)
    var p = 0
    while (p < subtotals.length) {
      offsets(p) = run.clone()
      var i = 0
      while (i < k) { run(i) = Math.addExact(run(i), subtotals(p)(i)); i += 1 }
      p += 1
    }
    offsets
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
    ctx.currentVars = input
    ctx.INPUT_ROW = null
    val bound = values.map(v =>
      BindReferences.bindReference(v, child.output).genCode(ctx))
    val cols = values.indices.map { i =>
      // partition offset into a primitive field; the generated init()
      // sets partitionIndex before mutable-state init functions run
      val acc = ctx.addMutableState(CodeGenerator.JAVA_LONG, s"runningSumAcc$i",
        v => s"$v = $boxTerm.at(partitionIndex, $i);")
      val cum = ctx.freshName(s"cumulative$i")
      val v = bound(i)
      val code =
        s"""
           |${v.code}
           |if (!${v.isNull}) {
           |  $acc = java.lang.Math.addExact($acc, ${v.value});
           |}
           |final long $cum = $acc;
         """.stripMargin
      (code, ExprCode.forNonNullValue(JavaCode.variable(cum, LongType)))
    }
    cols.map(_._1).mkString("\n") + "\n" +
      consume(ctx, input ++ cols.map(_._2))
  }

  // ---- interpreted fallback (spark.sql.codegen.wholeStage=false) ----

  override protected def doExecute(): RDD[InternalRow] = {
    val bound = values.map(BindReferences.bindReference(_, child.output))
    val k = bound.size
    val childRDD = child.execute()
    val offsets = computeOffsets()
    val attrs = output
    // pass 2: streaming accumulation from each partition's offsets
    childRDD.mapPartitionsWithIndex { (p, it) =>
      val acc = offsets(p).clone()
      val cum = new GenericInternalRow(k)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(attrs, attrs)
      it.map { r =>
        var i = 0
        while (i < k) {
          val v = bound(i).eval(r)
          if (v != null) acc(i) = Math.addExact(acc(i), v.asInstanceOf[Long])
          cum.setLong(i, acc(i))
          i += 1
        }
        proj(joined(r, cum))
      }
    }
  }
}
