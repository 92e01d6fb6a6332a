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

  /** Schema-adaptive `events.ts` decode. The driver has regenerated the
    * testdata with different parquet timestamp encodings across rounds
    * (TIMESTAMP(NANOS), then timestamp[us]/TIMESTAMP_NTZ), so the loader
    * branches on the type actually read rather than hardcoding one:
    *
    *  - `LongType`: parquet TIMESTAMP(NANOS) surfaced as nanos-since-epoch
    *    under `spark.sql.legacy.parquet.nanosAsLong=true` (Spark rejects
    *    NANOS otherwise) → truncate to micros, matching DuckDB's
    *    `CAST(ts_ns AS TIMESTAMP)`.
    *  - `TimestampType` / `TimestampNTZType`: already a timestamp; cast to
    *    session-TZ `TimestampType`. Sessions pin UTC, so the NTZ cast is
    *    value-preserving and keeps `date_format`/`window` oracle parity.
    *
    * This mirrors the reference's own per-page dtype-drift tolerance
    * (fetch_data.py:146,154 — pandas re-infers int64 vs float64 per page).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // A long epoch is itself ambiguous (nanos? micros? millis?
        // seconds?), so sniff the unit per row by magnitude — scan-stage,
        // codegen'd, no driver action, and tolerant of per-row drift the
        // way the reference's pandas re-inference is. Bands are unambiguous
        // for timestamps between 1973 and ~2280: nanos > 1e16 (≥ Apr 1970
        // as nanos, ≥ year 2286 as micros), micros > 1e13, millis > 1e10,
        // else seconds. Integral division truncates toward the epoch,
        // matching DuckDB's CAST semantics on the nanos path.
        df.withColumn("ts",
          when(col("ts") > 10000000000000000L, expr("timestamp_micros(ts div 1000)"))
            .when(col("ts") > 10000000000000L, expr("timestamp_micros(ts)"))
            .when(col("ts") > 10000000000L, expr("timestamp_millis(ts)"))
            .otherwise(expr("timestamp_seconds(ts)")))
      case _ =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
