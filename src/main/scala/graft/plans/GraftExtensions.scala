package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.expressions.DotProductL

/** Catalyst optimizer rule: rewrite the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)
  *
  * into the whole-stage-codegen `DotProductL(a, b)` (25-50× on pair
  * joins — higher-order functions are CodegenFallback, interpreted per
  * element). Sound because DotProductL reproduces the HOF null
  * semantics exactly (null on length mismatch / null element; see
  * DotProductL). Users writing the idiomatic declarative form get the
  * native expression automatically.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** (x, y) -> x * y with the operands bound to EXACTLY the lambda's two
    * declared variables, one each. Without the exprId binding, adjacent
    * forms like (x, y) -> x * x would be silently rewritten to a dot
    * product — computing sum(a_i*b_i) instead of sum(a_i^2). */
  private object MulLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(
            Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
            Seq(v1: NamedLambdaVariable, v2: NamedLambdaVariable), _) =>
        Set(l.exprId, r.exprId) == Set(v1.exprId, v2.exprId) &&
          l.exprId != r.exprId
      case _ => false
    }
  }

  /** (acc, x) -> acc + x, operands bound to exactly {acc, x} — rejects
    * (acc, x) -> acc + acc and lambdas referencing outer variables. */
  private object AddLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(
            Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
            Seq(v1: NamedLambdaVariable, v2: NamedLambdaVariable), _) =>
        Set(l.exprId, r.exprId) == Set(v1.exprId, v2.exprId) &&
          l.exprId != r.exprId
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mul), Literal(0L, LongType), add, fin)
          if MulLambda.unapply(mul) && AddLambda.unapply(add) &&
            IdentityLambda.unapply(fin) && isLongArray(a) && isLongArray(b) =>
        DotProductL(a, b)
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectPlannerStrategy(_ => RunningSumStrategy)
  }
}
