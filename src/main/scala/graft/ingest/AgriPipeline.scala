package graft.ingest

import graft.functions.GraftFunctions.safeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Layer-A parity: the reference ingester's ETL semantics
  * (`/root/reference/fetch_data.py`) re-expressed as one idiomatic Spark
  * batch pipeline.
  *
  * Reference behaviors mapped (SURVEY.md §2 Layer A):
  *  - A4 JSON/CSV decode with explicit schema (no inference in prod paths)
  *  - A5 day-first date parse, null on error (`fetch_data.py:149-153`)
  *  - A6 numeric coercion, null on error (`fetch_data.py:154`)
  *  - A7 drop rows lacking Commodity/Modal_Price (`fetch_data.py:156`)
  *  - A9 safe_name partition-key normalization (`fetch_data.py:36-40`)
  *  - A8/A10 value-partitioned append sink (`fetch_data.py:119-128,158-159`)
  *    as `partitionBy(commodity_key)` parquet — dir-per-key, the idiomatic
  *    equivalent of one-CSV-per-commodity
  *  - A3's at-least-once duplicate window repaired by natural-key dedup
  *
  * Scale: the pipeline is a single narrow scan->project->filter chain (no
  * shuffle) until the partitioned write; dedup adds one hash shuffle on
  * the natural key. Partition count on disk = commodity cardinality
  * (~316 in the harvested corpus), each internally splittable parquet.
  */
object AgriPipeline {

  /** Raw wire schema — all strings, exactly as the agmarknet API delivers
    * (11 columns, e.g. `/root/reference/data/crops/egg.csv:1`). */
  val rawSchema: StructType = StructType(Seq(
    StructField("State", StringType),
    StructField("District", StringType),
    StructField("Market", StringType),
    StructField("Commodity", StringType),
    StructField("Variety", StringType),
    StructField("Grade", StringType),
    StructField("Arrival_Date", StringType),
    StructField("Min_Price", StringType),
    StructField("Max_Price", StringType),
    StructField("Modal_Price", StringType),
    StructField("Commodity_Code", StringType)))

  /** RFC-4180 CSV read (quoted Market values with commas are in the real
    * corpus) with the explicit raw schema. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .schema(rawSchema)
      .csv(path)

  /** JSON page read (A4) with the same explicit schema. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawSchema).json(path)

  /** Type normalization: day-first dates (null on parse failure), numeric
    * try-casts (null on failure), normalized partition key. */
  def normalize(raw: DataFrame): DataFrame =
    raw.select(
      col("State").as("state"),
      col("District").as("district"),
      col("Market").as("market"),
      col("Commodity").as("commodity"),
      safeName(col("Commodity")).as("commodity_key"),
      col("Variety").as("variety"),
      col("Grade").as("grade"),
      // try_to_date: null on invalid input under any ANSI setting (A5's
      // errors="coerce"). Pandas dayfirst=True (`fetch_data.py:149-153`)
      // is a *preference*, not a strict format — it still absorbs ISO
      // yyyy-MM-dd strings. Coalescing the two formats matches that
      // observed behavior instead of silently nulling ISO rows.
      coalesce(
        expr("try_to_date(Arrival_Date, 'd/M/yyyy')"),
        expr("try_to_date(Arrival_Date, 'yyyy-M-d')")).as("arrival_date"),
      expr("try_cast(Min_Price AS DOUBLE)").as("min_price"),
      expr("try_cast(Max_Price AS DOUBLE)").as("max_price"),
      expr("try_cast(Modal_Price AS DOUBLE)").as("modal_price"),
      expr("try_cast(Commodity_Code AS INT)").as("commodity_code"))

  /** A7: keep only rows with both a commodity and a modal price. */
  def dropInvalid(df: DataFrame): DataFrame =
    df.na.drop(Seq("commodity", "modal_price"))

  /** Natural-key dedup healing A3's crash-between-append-and-checkpoint
    * duplicate window. Deterministic: keeps the row with the lowest
    * modal_price on key ties (stable across retries). */
  def dedupNaturalKey(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = Seq("state", "district", "market", "commodity", "variety", "grade", "arrival_date")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("modal_price").asc_nulls_last, col("min_price").asc_nulls_last)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A8/A10: value-partitioned parquet sink (dir per commodity_key).
    *
    * The pre-write `repartition(commodity_key)` matters at scale: without
    * it every one of N shuffle tasks opens a file for every key it sees
    * (N x keys small files per batch — the classic partitionBy
    * small-files failure). With it each key lands in one task, one file
    * per key per batch. A pathologically hot key would then bottleneck
    * one task — split it further by salting the repartition columns
    * (cf. q36_salted_join) if the corpus develops one.
    */
  def writePartitioned(df: DataFrame, outDir: String, mode: String = "append"): Unit =
    df.repartition(col("commodity_key"))
      .write.mode(mode).partitionBy("commodity_key").parquet(outDir)

  /** Full batch pass: read -> normalize -> filter -> dedup -> write. */
  def runBatch(spark: SparkSession, csvPath: String, outDir: String): Long = {
    val cleaned = dedupNaturalKey(dropInvalid(normalize(readCsv(spark, csvPath))))
    writePartitioned(cleaned, outDir, mode = "overwrite")
    spark.read.parquet(outDir).count()
  }
}
