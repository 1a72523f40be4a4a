package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the allocation-free codegen'd [[VecDot]] expression. Users (and
  * the SQL surface) can keep writing the idiomatic HOF form; plans get
  * the native kernel. Registered cluster-wide through [[GraftExtensions]]
  * or per-session via `spark.experimental.extraOptimizations`.
  *
  * The rewrite preserves semantics bit-for-bit: both forms fold
  * left-to-right accumulating in double over float/double arrays, both
  * return NULL on a length mismatch, and both return NULL when an
  * element is null ([[VecFoldExpression]] checks elements exactly when
  * the schema says they may be null — `containsNull=false` inputs keep
  * the check-free tight loop), so nullable-element arrays (every
  * parquet-sourced array claims `containsNull=true`) are eligible too.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The lambda body is `x * y` (possibly with double up-casts) over
    * exactly the two lambda variables.
    */
  private def isMulOfVars(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => strip(c)
      case other => other
    }
    body match {
      case Multiply(l, r, _) =>
        (strip(l).semanticEquals(x) && strip(r).semanticEquals(y)) ||
          (strip(l).semanticEquals(y) && strip(r).semanticEquals(x))
      case _ => false
    }
  }

  private def isAddOfVars(body: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = body match {
    case Add(l, r, _) =>
      (l.semanticEquals(acc) && r.semanticEquals(v)) ||
        (l.semanticEquals(v) && r.semanticEquals(acc))
    case _ => false
  }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) => body.semanticEquals(acc)
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(mulBody, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(addBody, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isNumericArray(a) && isNumericArray(b) &&
        isMulOfVars(mulBody, x, y) && isAddOfVars(addBody, acc, v) &&
        isIdentityFinish(finish) =>
      VecDot(a, b)
  }
}
