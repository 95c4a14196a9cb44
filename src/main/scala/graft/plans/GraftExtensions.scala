package graft.plans

import graft.functions.DotProductF64
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the idiomatic higher-order dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)
  *
  * and fuse it into the native codegen'd [[DotProductF64]] expression, so
  * user code written with built-ins silently gets the fast path (one fused
  * loop, no intermediate array allocation, inside whole-stage codegen).
  *
  * Caveat encoded in the guard: `zip_with` pads the shorter array with
  * nulls while DotProductF64 stops at the shorter length, so the rewrite
  * fires only for non-null-element double arrays, where the pattern is the
  * embedding-column dot product this engine uses (equal-length vectors).
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  // containsNull must be false: zip_with/aggregate return NULL on null
  // elements while DotProductF64 would read garbage from the null slot.
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, el: NamedLambdaVariable, _),
            Seq(acc2: NamedLambdaVariable, el2: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
        if zero == 0.0 &&
          mx.exprId == ax.exprId && my.exprId == ay.exprId &&
          acc.exprId == acc2.exprId && el.exprId == el2.exprId &&
          fin.exprId == fin2.exprId &&
          isDoubleArray(left) && isDoubleArray(right) =>
      DotProductF64(left, right)
  }
}

/** Session extensions entry point: enables the fusion rule and the
  * graft_dot SQL function on any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseDotProduct)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductF64].getCanonicalName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
        DotProductF64(exprs(0), exprs(1))
      }))
  }
}
