package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Optimizer rule: rewrite the idiomatic non-empty-intersection test
  *
  * {{{ size(array_intersect(a, b)) > 0 }}}
  *
  * into `arrays_overlap(a, b)`. The intersection formulation builds and
  * deduplicates a whole intermediate array per row only to test
  * emptiness; arrays_overlap short-circuits on the first common element
  * — on wide token arrays (dedup candidate checks, tag filters) that is
  * the difference between O(|a|+|b|) with allocation and an early-exit
  * probe.
  *
  * Guarded for exact null-semantics equivalence: only fires when neither
  * array's element type admits nulls (arrays_overlap returns NULL when
  * the only shared element is null, size(intersect)>0 returns true) and
  * the comparison is exactly `> 0` against a literal. Top-level null
  * arrays agree in both forms (size(null)=null under the non-legacy
  * default, so both yield NULL).
  */
object RewriteIntersectOverlap extends Rule[LogicalPlan] {

  private def nullFreeArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayIntersect(a, b), false), Literal(0, IntegerType))
          if nullFreeArray(a) && nullFreeArray(b) =>
        ArraysOverlap(a, b)
    }
}
