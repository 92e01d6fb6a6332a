package graft.operators

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Mechanically-guarded GLOBAL windows.
  *
  * A window with no partition key serializes its whole input through one
  * task — correct but a scale bug when the input is raw rows, and exactly
  * right when the input is post-aggregate (a daily series, distinct
  * p_size values, a value dictionary): the window then runs over GROUP
  * CARDINALITY rows however big the underlying table is. The repo's five
  * global-window sites are all the second kind, but that safety argument
  * used to live in comments; this helper makes it code:
  *
  *   - [[aggregated]] REQUIRES the window input to sit on an aggregation
  *     boundary (walking only through cardinality-preserving nodes), so a
  *     refactor that silently feeds raw rows to a global window fails
  *     fast instead of serializing a table;
  *   - [[orderBy]] builds the spec with a constant partition key —
  *     execution is identical to an empty partition spec (every row hashes
  *     to one partition) but `WindowExec`'s single-partition warning,
  *     which cannot see the upstream aggregate, no longer fires on a
  *     window this helper has proven bounded.
  */
object BoundedWindow {

  /** Walks down through nodes that cannot increase cardinality; true iff
    * the walk reaches an aggregation boundary, i.e. the frame's row count
    * is bounded by group cardinality, not by raw table size. */
  @tailrec
  private def boundedByAggregate(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: Distinct => true
    case _: Deduplicate => true
    case n: Project => boundedByAggregate(n.child)
    case n: Filter => boundedByAggregate(n.child)
    case n: Sort => boundedByAggregate(n.child)
    case n: SubqueryAlias => boundedByAggregate(n.child)
    case n: org.apache.spark.sql.catalyst.plans.logical.Window =>
      boundedByAggregate(n.child)
    case n: GlobalLimit => boundedByAggregate(n.child)
    case n: LocalLimit => boundedByAggregate(n.child)
    case _ => false
  }

  /** Assert `df` is post-aggregate (its row count is group cardinality)
    * and return it unchanged — the mechanical precondition for running a
    * global [[orderBy]] window over it. `reason` names the bounded domain
    * for the failure message. */
  def aggregated(df: DataFrame, reason: String): DataFrame = {
    require(boundedByAggregate(df.queryExecution.analyzed),
      s"BoundedWindow($reason): input has no aggregation boundary — a global window " +
        "over raw rows would serialize the whole table through one task; aggregate " +
        "first or partition the window")
    df
  }

  /** Global ordered window spec with a constant-VALUED partition key:
    * `pmod(hash(k), 1)` is 0 for every row, so execution is identical to
    * `Window.orderBy` (all rows meet in one partition, ordered the same),
    * but the key is not foldable — a plain literal would be stripped by
    * the optimizer's foldable-partition elimination, re-emptying the spec
    * — so WindowExec's single-partition warning, aimed at unintentional
    * global windows, does not fire on a window [[aggregated]] has proven
    * bounded. The first order column must be a plain column expression
    * (all call sites order by one). */
  def orderBy(order: Column*): WindowSpec = {
    require(order.nonEmpty, "BoundedWindow.orderBy needs at least one order column")
    Window.partitionBy(pmod(hash(order.head), lit(1))).orderBy(order: _*)
  }
}
