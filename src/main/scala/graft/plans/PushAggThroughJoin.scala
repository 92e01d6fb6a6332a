package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

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
  * Float/double SUM and AVG are NOT pushed: per-key partials summed in a
  * different order (and dim-side duplicate keys adding a partial once
  * instead of row-by-row) re-associate IEEE-754 addition, so results
  * could visibly depend on whether the rule fired — this engine keeps
  * float aggregation bit-stable by policy. Integral and decimal SUM
  * re-associate exactly and push. Decimal AVG is decomposed into
  * sum/count and pushed: the final division is taken verbatim from
  * [[Average.evaluateExpression]] (buffer attrs substituted with the real
  * Sum/Count aggregates), so precision, scale, rounding, and
  * divide-by-zero semantics are bit-identical to the un-pushed plan.
  *
  * Cardinality guard: pre-aggregation pays only when it collapses rows.
  * When CBO column stats exist for the pushed grouping keys, the rewrite
  * is skipped if estimated |distinct keys| / |fact rows| exceeds
  * `spark.graft.eagerAgg.maxKeyRatio` (default 0.8) — a near-unique key
  * would add a full extra shuffle pass for ~zero reduction. Without
  * stats the rule fires on shape (map-side partials keep the downside
  * small).
  */
object PushAggThroughJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.eagerAgg.enabled", "true").toBoolean

  private def decomposable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
      (ae.aggregateFunction match {
        // Sum over float/double re-associates IEEE-754 addition (see
        // class doc); integral, decimal, and interval sums are exact.
        case s: Sum => s.child.dataType match {
          case FloatType | DoubleType => false
          case _ => true
        }
        case _: Min | _: Max | _: Count => true
        case _ => false
      })

  /** Rewrite AVG over decimal into the exact sum/count form so the
    * Sum/Count push machinery applies. The division expression is
    * Average's own `evaluateExpression` with its two buffer attributes
    * (sum, count) substituted by real aggregate expressions — not a
    * re-derivation — so rounding/precision/null semantics cannot drift
    * from the un-pushed plan. Float/double AVG stays un-decomposed (the
    * pushed double sum would re-associate; see class doc). */
  private def decomposeDecimalAvg(exprs: Seq[NamedExpression]): Seq[NamedExpression] =
    exprs.map(_.transform {
      case ae @ AggregateExpression(avg: Average, _, false, None, _)
          if avg.child.dataType.isInstanceOf[DecimalType] && ae.deterministic =>
        val Seq(sumAttr, countAttr) = avg.aggBufferAttributes
        val sumAe = AggregateExpression(Sum(avg.child), ae.mode, isDistinct = false)
        val cntAe = AggregateExpression(Count(Seq(avg.child)), ae.mode, isDistinct = false)
        avg.evaluateExpression.transform {
          case a: AttributeReference if a.exprId == sumAttr.exprId => sumAe
          case a: AttributeReference if a.exprId == countAttr.exprId => cntAe
        }
    }.asInstanceOf[NamedExpression])

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

  private def rewrite(agg0: Aggregate, join: Join): Option[LogicalPlan] = {
    if (join.joinType != Inner || join.condition.isEmpty) return None
    // Decimal AVG → exact sum/count form (only takes effect if the push
    // succeeds: every bail-out below returns None and the caller keeps
    // the original aggregate untouched).
    val agg = agg0.copy(aggregateExpressions = decomposeDecimalAvg(agg0.aggregateExpressions))
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

    // Cardinality guard (see class doc): with column stats available,
    // skip the push when the key is near-unique on the fact side.
    val guardRatio = SQLConf.get
      .getConfString("spark.graft.eagerAgg.maxKeyRatio", "0.8").toDouble
    val factStats = fact.stats
    val ndvs = pushedKeys.flatMap(k =>
      factStats.attributeStats.get(k).flatMap(_.distinctCount))
    val nearUniqueKey = factStats.rowCount.exists { rows =>
      ndvs.size == pushedKeys.size && rows > 0 && {
        val ndv = ndvs.map(BigDecimal(_)).product.min(BigDecimal(rows))
        ndv / BigDecimal(rows) > guardRatio
      }
    }
    if (nearUniqueKey) return None
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
