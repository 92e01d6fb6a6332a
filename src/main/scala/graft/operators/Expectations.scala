package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * idea as a Spark-first operator): a caller states WHAT must hold —
  * not-null, in-range, regex shape, accepted value set, key uniqueness,
  * referential integrity — and gets back one verdict row per rule
  * (rule, n, violations, pass), ready to gate a pipeline run or land in
  * a monitoring table. The reference pipeline validates records
  * imperatively inside its ingest loop
  * (`/root/reference/fetch_data.py:96-118` — drop-null + try-cast with
  * inline counters); this generalizes that check into a reusable,
  * composable rule engine over any frame.
  *
  * Scale shape — the engine plans the MINIMUM passes, not one per rule:
  *  - ALL row-local rules ([[Expectations.NotNull]], [[Expectations.InRange]],
  *    [[Expectations.Matches]], [[Expectations.InSet]]) fold into ONE
  *    aggregate over one scan (a conditional sum per rule inside a single
  *    partial-agg'd reduction — 100 rules still cost one pass), then
  *    unpivot to rows via an array/explode of the single totals row.
  *  - each [[Expectations.Unique]] is one partial-agg'd shuffle on its
  *    key set (violations = Σ(c−1) = n − |distinct|; never a window).
  *  - each [[Expectations.RefIntegrity]] is one left equi-join against
  *    the distinct dimension keys (AQE broadcasts small dims), counted
  *    in the same pass as the join.
  *
  * Null semantics (explicit, engine-portable): [[Expectations.NotNull]]
  * counts NULL as its violation; for InRange/Matches/InSet a NULL value
  * also VIOLATES (a null can't prove it's in range — `coalesce(pred,
  * false)` makes the choice visible); for RefIntegrity a NULL child key
  * PASSES (SQL FK semantics: nothing to resolve); Unique treats NULL as
  * a key value like any other (two null-keyed rows collide).
  */
object Expectations {

  /** One declarative expectation; `name` keys the verdict row. */
  sealed trait Rule { def name: String }

  /** `column` must never be NULL. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null($column)"
  }

  /** `column` must lie in [lo, hi] (inclusive; NULL violates). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($column,$lo,$hi)"
  }

  /** `column` must contain a match of `regex` (Spark `rlike` semantics —
    * unanchored search; anchor with ^...$ for a full match. NULL
    * violates). */
  final case class Matches(column: String, regex: String) extends Rule {
    def name = s"matches($column)"
  }

  /** `column` (cast to string) must be one of `values` (NULL violates). */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    def name = s"in_set($column)"
  }

  /** The tuple `columns` must be unique across the frame; violations =
    * rows beyond the first in every colliding group (n − |distinct|). */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Every non-null `column` value must exist in `dim.dimKey`
    * (referential integrity; violations = orphaned child rows). */
  final case class RefIntegrity(column: String, dim: DataFrame, dimKey: String) extends Rule {
    def name = s"ref_integrity($column->$dimKey)"
  }

  /** Evaluate `rules` over `df`: one output row per rule —
    * (rule, n, violations, pass) with n the rows checked, ordered by
    * rule name so the verdict frame is deterministic. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "[expectations] no rules given")
    require(rules.map(_.name).distinct.size == rules.size,
      s"[expectations] duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).mkString(",")}")

    val rowPreds: Seq[(String, org.apache.spark.sql.Column)] = rules.collect {
      case r: NotNull => r.name -> col(r.column).isNull
      case r: InRange =>
        r.name -> !coalesce(col(r.column) >= r.lo && col(r.column) <= r.hi, lit(false))
      case r: Matches => r.name -> !coalesce(col(r.column).rlike(r.regex), lit(false))
      case r: InSet =>
        r.name -> !coalesce(col(r.column).cast("string").isin(r.values: _*), lit(false))
    }

    val parts = Seq.newBuilder[DataFrame]

    if (rowPreds.nonEmpty) {
      val aggs = count(lit(1)).as("n") +: rowPreds.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"v$i")
      }
      parts += df.agg(aggs.head, aggs.tail: _*)
        .select(col("n"), explode(array(rowPreds.zipWithIndex.map { case ((nm, _), i) =>
          struct(lit(nm).as("rule"), col(s"v$i").as("violations"))
        }: _*)).as("r"))
        .select(col("r.rule").as("rule"), col("n"), col("r.violations").as("violations"))
    }

    rules.foreach {
      case r: Unique =>
        parts += df.groupBy(r.columns.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum("c"), lit(0L)).as("n"),
            coalesce(sum(col("c") - 1L), lit(0L)).as("violations"))
          .select(lit(r.name).as("rule"), col("n"), col("violations"))
      case r: RefIntegrity =>
        val d = r.dim.select(col(r.dimKey).as("__k")).distinct()
        parts += df.select(col(r.column).as("__c"))
          .join(d, col("__c") === col("__k"), "left")
          .agg(count(lit(1)).as("n"),
            sum(when(col("__c").isNotNull && col("__k").isNull, 1L)
              .otherwise(0L)).as("violations"))
          .select(lit(r.name).as("rule"), col("n"), col("violations"))
      case _ => () // row-local: already folded into the single-scan pass
    }

    parts.result().reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }
}
