package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: eager aggregation — push a PARTIAL aggregate below an
  * inner equi-join onto the fact side (Yan & Larson, "Eager Aggregation
  * and Lazy Aggregation", VLDB'95).
  *
  * {{{
  *   Aggregate [dim.g] [sum(fact.x)]          Aggregate [dim.g] [sum(_pp0)]
  *     Join fact.k = dim.k           ==>        Join fact.k = dim.k
  *       fact                                     Aggregate [fact.k] [sum(fact.x) AS _pp0]
  *       dim                                        fact
  *                                                dim
  * }}}
  *
  * At 100 TB the join shuffles the full fact table on `k` only for the
  * aggregate to collapse it afterwards; pre-aggregating by the join key
  * first shrinks the shuffled/joined volume to |distinct k| rows. Spark's
  * own partial aggregation cannot do this — it combines within map tasks
  * of the SAME aggregate, above the join — so the full fact still crosses
  * the wire twice (join shuffle, then agg shuffle). This rule removes the
  * first full-volume crossing; the dim side is untouched.
  *
  * Fires only when provably safe AND the arithmetic re-associates
  * exactly:
  *  - inner join whose condition is purely a conjunction of attr = attr;
  *  - every aggregate function is SUM / COUNT (no distinct, no FILTER) /
  *    MIN / MAX with deterministic, single-side inputs — the partials
  *    re-aggregate as sum-of-sums, sum-of-counts (dim-side duplicate join
  *    keys replicate partial rows, which is exactly the multiplicity the
  *    un-pushed plan sees), min-of-mins, max-of-maxs;
  *  - grouping expressions referencing the fact side are bare attributes
  *    (they join the pushed grouping); dim-side grouping stays above;
  *  - the fact side is not already an Aggregate (fixpoint guard).
  *
  * COUNT over zero rows must yield 0, but an empty pushed side yields an
  * empty join and a NULL upper sum — the replacement is
  * coalesce(sum(partial_count), 0). SUM over decimals widens precision
  * per level, so the upper sum is cast back to the original result type.
  * Disable with `spark.graft.eagerAgg.enabled=false`.
  *
  * AVG is deliberately NOT decomposed (sum/count would be algebraically
  * exact, but re-associating a double sum changes the floating-point
  * summation order, making results visibly depend on whether the rule
  * fired — this engine keeps float aggregation bit-stable by policy;
  * decimal-typed averages in the registry already spell out
  * sum(decimal)/count explicitly and those pieces push fine).
  */
object PushAggThroughJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.eagerAgg.enabled", "true").toBoolean

  private def decomposable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
      (ae.aggregateFunction match {
        case _: Sum | _: Min | _: Max | _: Count => true
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg @ Aggregate(_, _, join: Join, _) =>
        rewrite(agg, join).getOrElse(agg)
      // Column pruning leaves an attribute-only Project between the
      // aggregate and the join; it carries no computation, so the rewrite
      // sees through it (both new aggregates prune implicitly).
      case agg @ Aggregate(_, _, Project(projList, join: Join), _)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(agg, join).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, join: Join): Option[LogicalPlan] = {
    if (join.joinType != Inner || join.condition.isEmpty) return None
    val (l, r) = (join.left, join.right)
    val (leftOut, rightOut) = (AttributeSet(l.output), AttributeSet(r.output))

    // Strict equi-join: every conjunct is attr = attr across the sides.
    val pairs = splitConjunctivePredicates(join.condition.get).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => Some((a, b))
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(b) && rightOut.contains(a) => Some((b, a))
      case _ => None
    }
    if (pairs.contains(None)) return None
    val (leftKeys, rightKeys) = pairs.flatten.unzip

    val aggFns = agg.aggregateExpressions.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggFns.isEmpty || !aggFns.forall(decomposable)) return None
    if (!agg.groupingExpressions.forall(_.deterministic)) return None

    // Fact side = the side all aggregate inputs come from. A count-only
    // aggregate constrains nothing, so the grouping decides: the side the
    // grouping does NOT reference is the one worth collapsing.
    val funcRefs = AttributeSet(aggFns.flatMap(_.references))
    val groupRefs = AttributeSet(agg.groupingExpressions.flatMap(_.references))
    val factIsLeft =
      if (funcRefs.nonEmpty) {
        if (funcRefs.subsetOf(leftOut)) true
        else if (funcRefs.subsetOf(rightOut)) false
        else return None
      } else {
        if (groupRefs.subsetOf(rightOut)) true
        else if (groupRefs.subsetOf(leftOut)) false
        else return None
      }
    val (fact, dim, factOut, factKeys) =
      if (factIsLeft) (l, r, leftOut, leftKeys) else (r, l, rightOut, rightKeys)
    if (fact.isInstanceOf[Aggregate]) return None // fixpoint guard
    if (!fact.deterministic) return None

    // Fact-side grouping expressions must be bare attributes (they become
    // pushed grouping keys); mixed-side expressions can't split.
    val factGroupAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference if factOut.contains(a) => a
    }
    val splittable = agg.groupingExpressions.forall {
      case a: AttributeReference if factOut.contains(a) => true
      case g => g.references.isEmpty || !g.references.exists(factOut.contains)
    }
    if (!splittable) return None

    // Pushed aggregate: group by join keys + fact-side grouping attrs,
    // computing each distinct aggregate once.
    val pushedKeys = (factKeys ++ factGroupAttrs)
      .groupBy(_.exprId).map(_._2.head).toSeq.sortBy(_.exprId.id)
    val partials = aggFns.groupBy(_.canonicalized).map(_._2.head).toSeq.zipWithIndex
      .map { case (ae, i) => ae.canonicalized -> (ae, Alias(ae, s"_pp$i")()) }
    val pushed = Aggregate(pushedKeys, pushedKeys ++ partials.map(_._2._2), fact, None)
    val newJoin =
      if (factIsLeft) join.copy(left = pushed) else join.copy(right = pushed)

    // Upper aggregate: the same functions re-aggregate the partials.
    val byCanon = partials.toMap
    val newAggExprs = agg.aggregateExpressions.map(_.transform {
      case ae: AggregateExpression if byCanon.contains(ae.canonicalized) =>
        val partial = byCanon(ae.canonicalized)._2.toAttribute
        ae.aggregateFunction match {
          case s: Sum =>
            val up = ae.copy(aggregateFunction = s.copy(child = partial),
              resultId = NamedExpression.newExprId)
            if (up.dataType == ae.dataType) up else Cast(up, ae.dataType)
          case m: Min =>
            ae.copy(aggregateFunction = m.copy(child = partial),
              resultId = NamedExpression.newExprId)
          case m: Max =>
            ae.copy(aggregateFunction = m.copy(child = partial),
              resultId = NamedExpression.newExprId)
          case _: Count =>
            Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(partial), resultId = NamedExpression.newExprId),
              Literal(0L)))
        }
    }.asInstanceOf[NamedExpression])
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newJoin))
  }
}
