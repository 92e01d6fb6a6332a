package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the entity-
  * resolution candidate generator that complements [[EditDistanceJoin]]:
  * sort the corpus by a blocking key, compare each record only to its w
  * successors. Candidate volume is EXACTLY n*w whatever the data
  * distribution (PassJoin's candidate count depends on segment
  * collisions), at the price of recall limited to pairs the sort
  * brings within w positions.
  *
  * The global rank is NOT a single-partition window: the frame is
  * range-repartitioned on the sort key, sorted within partitions (so
  * partition i's rows all precede partition i+1's — the range exchange
  * guarantees it), and indexed with zipWithIndex, whose per-partition
  * offsets cost one lightweight count job. This is the one legitimate
  * RDD drop-down in the codebase: a distributed total order with
  * sequential ids has no columnar equivalent. The neighbor join is then
  * an exploded-offset EQUI-join on the rank (fan-out w, no range join,
  * no window over the corpus).
  */
object Blocking {

  /** Attach a 1-based dense global rank under `sortCols` order. */
  def globalRank(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val sorted = df
      .repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1)) },
      org.apache.spark.sql.types.StructType(sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("rn", LongType, nullable = false)))
  }

  /** Candidate pairs within `window` positions of the sorted order:
    * (left columns prefixed a_, right prefixed b_). Deterministic iff
    * `sortCols` is a total order — pass a unique tie-break column. */
  def sortedNeighborhood(
      df: DataFrame,
      sortCols: Seq[Column],
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ranked = globalRank(df, sortCols)
    val left = ranked.columns.foldLeft(ranked)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .select(col("*"), explode(array((1 to window).map(o => lit(o.toLong)): _*)).as("__off"))
      .withColumn("__match", col("a_rn") + col("__off"))
    val right = ranked.columns.foldLeft(ranked)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    left.join(right, col("__match") === col("b_rn"))
      .drop("__off", "__match")
  }
}
