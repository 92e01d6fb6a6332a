package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, e) -> acc + e) }}}
  *
  * into the native codegen'd [[DotProduct]]. Users writing the
  * documented `functions.aggregate`/`zip_with` formulation get the fast
  * path automatically (no intermediate array, whole-stage codegen)
  * without changing their code — the same left-to-right fold, so results
  * are bit-identical.
  *
  * Matching is deliberately strict: element-wise Multiply must reference
  * exactly the two zip_with lambda variables, the fold must be
  * Add(acc, elem) over a 0.0 seed, the finish lambda must be identity,
  * and both inputs must be array<double>. Anything else is left alone.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aa: NamedLambdaVariable, ae: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
            aa.exprId == acc.exprId && ae.exprId == elem.exprId &&
            fin.exprId == fv.exprId &&
            isDoubleArray(left) && isDoubleArray(right) =>
        Some((left, right))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(left, right) => DotProduct(left, right)
    }
}
