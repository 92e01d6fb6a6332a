package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst keeps full freedom for
  * predicate pushdown, column pruning and partition pruning. Nothing is
  * cached here — at the 100 TB design point every query must be able to
  * prune at the source, and caching a full scan would defeat that.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (done in Verify/Bench and
    * the test harness); the column then arrives as nanoseconds-since-epoch
    * `LongType` and is converted here to a microsecond-precision timestamp
    * (integral `div 1000`, i.e. truncation — matching DuckDB's
    * `CAST(ts_ns AS TIMESTAMP)`).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
