package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) builder: collapse an event
  * history (key, ts, attribute) into effective-dated intervals
  * [valid_from, valid_to) — one row per RUN of consecutive identical
  * attribute values, the dimension shape an as-of/range join (B13/B14)
  * then probes. The inverse of the reference's overwrite-in-place
  * snapshots (`run.yml:29-35`): history in, versioned dimension out.
  *
  * Pure window algebra partitioned by key (gaps-and-islands: a run
  * starts where the attribute differs from its lag; the run id is the
  * running count of starts), so the only shuffle is the hash partition
  * on the dimension key and every partition is one entity's history —
  * skew-free at 100 TB unless one key holds the whole corpus. The same
  * formulation is SQL-replayable, which q164's oracle does.
  */
object Scd {

  /** `ord` breaks ties within (key, ts) deterministically (pass the
    * change-source's unique id). Returns (key, attr, version,
    * valid_from, valid_to, is_current) with valid_to null on the
    * current row; `version` numbers the key's intervals 1..n in time
    * order — the SCD2 surrogate-version column, and the column that
    * makes the output totally ordered even when several status flips
    * share one timestamp. */
  def buildType2(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      attrCol: String): DataFrame = {
    val byTs = Window.partitionBy(keyCol).orderBy(col(tsCol), col(ordCol))
    val runs = df
      .withColumn("__chg",
        when(coalesce(lag(col(attrCol), 1).over(byTs) === col(attrCol), lit(false)), 0)
          .otherwise(1))
      .withColumn("__run", sum(col("__chg")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs
      .groupBy(col(keyCol), col("__run"))
      .agg(first(col(attrCol)).as(attrCol), min(col(tsCol)).as("valid_from"))
    val byFrom = Window.partitionBy(keyCol).orderBy(col("__run"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", col("__run").cast("int"))
      .drop("__run")
  }
}
