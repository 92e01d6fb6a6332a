package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / governance audit over a release candidate: k-anonymity
  * (Sweeney 2002) and l-diversity (Machanavajjhala et al. 2007) per
  * quasi-identifier equivalence class. Before a dataset (or a training
  * corpus slice) ships, the pipeline asks two questions: does any
  * combination of quasi-identifier values isolate fewer than k rows
  * (re-identification risk), and does any class carry fewer than l
  * distinct sensitive values (attribute disclosure even when k holds —
  * a class of 50 rows that all share one salary still leaks it)?
  *
  * Output: one row per equivalence class — the quasi columns, class
  * size `n`, `l_distinct` (distinct sensitive values; NULL counts as
  * one value, matching SQL GROUP BY semantics on both engines), and the
  * two violation flags. Exact; scale shape is two partial-agg'd
  * hash-aggregate shuffles ((quasi, sensitive) counts, then quasi) with
  * no joins and nothing global — the same shape as
  * [[EvalMetrics.concentrationPerGroup]]. The inner group bounds state
  * by the OBSERVED (class, value) pairs, so a wide sensitive domain
  * never materializes a dense grid.
  */
object Privacy {

  def kAnonymityAudit(
      df: DataFrame, quasi: Seq[String], sensitive: Column,
      k: Long, l: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityAudit needs at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"kAnonymityAudit thresholds must be >= 1 (k=$k, l=$l)")
    val qc = quasi.map(col)
    df.select(qc :+ sensitive.as("__s"): _*)
      .groupBy(qc :+ col("__s"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(qc: _*)
      .agg(sum("__c").as("n"), count(lit(1)).as("l_distinct"))
      .select(qc ++ Seq(
        col("n"), col("l_distinct"),
        (col("n") < k).as("k_violation"),
        (col("l_distinct") < l).as("l_violation")): _*)
  }
}
