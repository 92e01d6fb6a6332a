package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-scalable interval overlap join (the B14 scale path).
  *
  * The exact baseline (q27) evaluates `ls <= re AND rs <= le` as a theta
  * join, which Spark can only execute as a (broadcast) nested loop — fine
  * while one side broadcasts, quadratic disaster for two unbounded sides.
  * This operator makes the overlap join shuffle-partitionable:
  *
  *  1. each interval explodes into the fixed-width bins it covers
  *     (`floorDiv(start,w) .. floorDiv(end,w)` — explode factor is
  *     interval length / binWidth, so pick binWidth near the typical
  *     interval length);
  *  2. candidates meet with ONE equi-shuffle on the bin id — overlapping
  *     intervals must share the bin containing `max(ls, rs)`;
  *  3. the exact predicate filters residual same-bin non-overlaps, and
  *     each true pair is kept only in that first shared bin
  *     (`bin == floorDiv(greatest(ls, rs), w)`), so no distinct() is
  *     needed to dedup pairs that share several bins.
  *
  * All bin math is integer (exact for any long epoch; no double
  * rounding). Inputs must satisfy start <= end on both sides.
  * Equivalence to the theta join is property-tested on random interval
  * sets (OperatorsSpec) and oracle-checked end-to-end (q124, which must
  * hash-match q27's result through DuckDB).
  */
object RangeJoin {

  /** Floor division that is negative-safe and exact for |c| < 2^53
    * (c - posMod is an exact multiple of w, so the one double division
    * is representation-exact within that domain — epoch days/seconds/
    * millis all qualify). The 2^53 domain is ENFORCED in-plan, not
    * assumed: an epoch-MICROS caller (~1.7e18) would silently misbucket
    * otherwise — the r12 Column./ lesson as a guard instead of a doc
    * line. */
  private def floorDiv(c: Column, w: Long): Column = {
    val posMod = ((c % w) + w) % w
    Guards(abs(c) <= lit(1L << 53),
      ((c - posMod) / w).cast("long"), // float-ok: exact multiple of w below 2^53, proven by the guard
      Guards.msg("rangejoin",
        lit("bucket input "), c.cast("string"),
        lit(" exceeds 2^53 - the double floor division is no longer "),
        lit("exact; rescale the interval unit (e.g. micros -> millis)")))
  }

  /** Overlap-join `left` and `right` on closed intervals
    * `[lsCol, leCol]` x `[rsCol, reCol]` (long-valued columns; cast dates
    * to epoch days with `unix_date` first). Returns all columns of both
    * inputs for each overlapping pair, each pair exactly once.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lsCol: String,
      leCol: String,
      rsCol: String,
      reCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // The bin equi-join keeps both sides' columns, and the residual
    // filters reference lsCol/reCol by bare name — a shared column name
    // would resolve ambiguously (or clobber caller data via the __bin
    // withColumn), so fail loudly instead of guessing an aliasing.
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"overlapJoin requires disjoint column names between sides " +
        s"(shared: ${shared.toSeq.sorted.mkString(", ")}) — rename one side first")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "__bin is reserved by overlapJoin; rename the input column")
    val lb = left.withColumn(
      "__bin", explode(sequence(floorDiv(col(lsCol), binWidth), floorDiv(col(leCol), binWidth))))
    val rb = right.withColumn(
      "__bin", explode(sequence(floorDiv(col(rsCol), binWidth), floorDiv(col(reCol), binWidth))))
    lb.join(rb, "__bin")
      .filter(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol))
      .filter(col("__bin") === floorDiv(greatest(col(lsCol), col(rsCol)), binWidth))
      .drop("__bin")
  }
}
