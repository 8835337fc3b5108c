package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  *               0.0, (acc, v) => acc + v) }}}
  *
  * over float arrays into the compiled [[VecDotHofCompat]] kernel. Users
  * who write the declarative form (or inherit it from older code)
  * silently get the compiled loop — the optimizer, not the author, picks
  * the physical kernel, which is the Catalyst way. The substitution is
  * unconditional because [[VecDotHofCompat]] reproduces the HOF's null
  * semantics exactly (NULL on length mismatch — zip_with pads with
  * nulls — and on null elements).
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` (see
  * [[GraftFunctions.register]]); user-provided rules run after the main
  * optimizer batches, so the pattern is matched post-folding.
  */
object VecKernelRewrite extends Rule[LogicalPlan] {

  private object FloatArray {
    def unapply(e: Expression): Option[Expression] = e.dataType match {
      case ArrayType(FloatType, _) => Some(e)
      case _ => None
    }
  }

  private def isDoubleCastOf(e: Expression, v: NamedExpression): Boolean =
    e match {
      case Cast(c: NamedLambdaVariable, DoubleType, _, _) =>
        c.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(FloatArray(a), FloatArray(b),
            LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable,
              y: NamedLambdaVariable), _)),
          Literal(zero: Double, DoubleType),
          LambdaFunction(Add(accRef: NamedLambdaVariable,
            vRef: NamedLambdaVariable, _), Seq(acc: NamedLambdaVariable,
            v: NamedLambdaVariable), _),
          finishLambda)
          if zero == 0.0 &&
            isDoubleCastOf(mx, x) && isDoubleCastOf(my, y) &&
            accRef.exprId == acc.exprId && vRef.exprId == v.exprId &&
            isIdentityFinish(finishLambda) =>
        VecDotHofCompat(a, b)
    }

  private def isIdentityFinish(l: Expression): Boolean = l match {
    case LambdaFunction(body: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => body.exprId == arg.exprId
    case _ => false
  }
}
