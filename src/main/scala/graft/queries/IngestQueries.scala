package graft.queries

import graft.{Q, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Layer-A ingestion semantics demonstrated over the driver's testdata
  * (SURVEY.md A5-A9, B1, B39): coercion-to-null, drop-null filtering,
  * key normalization, natural-key dedup. The oracles simulate the same
  * coercions with CASE arms, proving the null-on-error semantics rather
  * than assuming them.
  */
object IngestQueries {

  val qs: Seq[Q] = Seq(
    // A9/B26: safe_name as the partition-key normalizer over a dirty
    // synthetic commodity string built from part attributes.
    Q(
      "q70_safe_name_keys",
      (s, dir) =>
        Tables.part(s, dir)
          .select(safeName(concat(col("p_type"), lit("  ("), col("p_brand"), lit(") !"))).as("key"))
          .groupBy("key")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("key"),
      Some("""
        SELECT regexp_replace(regexp_replace(regexp_replace(lower(p_type || '  (' || p_brand || ') !'),
                              '^\s+|\s+$', '', 'g'), '[^\w\s-]', '', 'g'), '\s+', '_', 'g') AS key,
               COUNT(*) AS cnt
        FROM part
        GROUP BY 1
        ORDER BY key""")),

    // A5: day-first date parsing with null-on-error. Dates are rendered
    // dd/MM/yyyy (with an injected invalid 31/02 for every 97th order),
    // parsed back day-first; the oracle simulates the identical round trip.
    Q(
      "q71_dayfirst_dates",
      (s, dir) =>
        Tables.orders(s, dir)
          .withColumn("raw",
            when(col("o_orderkey") % 97 === 0, lit("31/02/1999"))
              .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy")))
          // try_to_timestamp -> null on invalid dates regardless of the
          // session's ANSI setting (A5's errors="coerce")
          .withColumn("parsed", expr("try_to_timestamp(raw, 'd/M/yyyy')").cast(DateType))
          .groupBy(year(col("parsed")).as("y"))
          .agg(count(lit(1)).as("cnt"), count(col("parsed")).as("parsed_cnt"))
          .orderBy(col("y").asc_nulls_first),
      Some("""
        SELECT CAST(year(parsed) AS INT) AS y, COUNT(*) AS cnt, COUNT(parsed) AS parsed_cnt
        FROM (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                          ELSE CAST(o_orderdate AS DATE) END AS parsed
              FROM orders)
        GROUP BY 1
        ORDER BY y NULLS FIRST""")),

    // A6: numeric try_cast with injected garbage -> null, then aggregate.
    Q(
      "q72_try_cast_numeric",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("raw",
            when(col("event_id") % 13 === 0, lit("N/A"))
              .otherwise(format_number(col("value"), 2)))
          .withColumn("v", expr("try_cast(replace(raw, ',', '') AS DOUBLE)"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("v")).as("n_parsed"),
            sum(col("v").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_v")),
      Some("""
        SELECT COUNT(*) AS n_rows, COUNT(v) AS n_parsed,
               CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        FROM (SELECT CASE WHEN event_id % 13 = 0 THEN NULL
                          ELSE round(value, 2) END AS v
              FROM events)""")),

    // A7: drop-null filter (na.drop) semantics.
    Q(
      "q73_dropna_filter",
      (s, dir) =>
        Tables.orders(s, dir)
          .withColumn("maybe_prio", nullif(col("o_orderpriority"), lit("5-LOW")))
          .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("P")))
          .na.drop(Seq("maybe_prio", "maybe_status"))
          .groupBy("maybe_status")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("maybe_status"),
      Some("""
        SELECT maybe_status, COUNT(*) AS cnt
        FROM (SELECT nullif(o_orderstatus, 'P') AS maybe_status,
                     nullif(o_orderpriority, '5-LOW') AS maybe_prio
              FROM orders)
        WHERE maybe_status IS NOT NULL AND maybe_prio IS NOT NULL
        GROUP BY 1
        ORDER BY maybe_status""")),

    // B1: RFC-4180 CSV round trip — write part (whose p_name values force
    // quoting when concatenated with commas) to CSV, read it back with an
    // explicit schema, aggregate. The oracle aggregates the original
    // parquet: equality proves the CSV writer/reader are lossless.
    Q(
      "q75_csv_roundtrip",
      (s, dir) => {
        val tmp = graft.Q.scratchDir("csv_rt")
        Tables.part(s, dir)
          .withColumn("noisy", concat(col("p_name"), lit(", \"x\" "), col("p_brand")))
          .write.mode("overwrite").option("header", "true").csv(tmp)
        s.read
          .option("header", "true")
          .schema("p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE, noisy STRING")
          .csv(tmp)
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(length(col("noisy"))).as("noisy_chars"),
            sum(col("p_retailprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS cnt,
               CAST(SUM(length(p_name || ', "x" ' || p_brand)) AS BIGINT) AS noisy_chars,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // B3/A4: JSON round trip — write events (with its embedded-JSON props
    // string) to JSON lines, read back with an explicit schema, aggregate.
    Q(
      "q77_json_roundtrip",
      (s, dir) => {
        val tmp = graft.Q.scratchDir("json_rt")
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").json(tmp)
        s.read
          .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
          .json(tmp)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
            sum(from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
              .getField("k")).as("sum_k"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // B2 extras: parquet schema evolution — two write generations with
    // different schemas (the second adds a column), read back with
    // mergeSchema. At 100 TB a table's schema WILL change mid-corpus;
    // this pins that old files surface the new column as null instead of
    // failing the scan. The oracle reconstructs both generations from
    // the original table.
    Q(
      "q103_schema_evolution",
      (s, dir) => {
        val tmp = graft.Q.scratchDir("schema_evo")
        val o = Tables.orders(s, dir)
        o.select(col("o_orderkey"), col("o_orderstatus"))
          .write.mode("overwrite").parquet(s"$tmp/gen=0")
        o.select(col("o_orderkey"), col("o_orderstatus"),
            year(col("o_orderdate").cast(DateType)).as("o_year"))
          .write.mode("overwrite").parquet(s"$tmp/gen=1")
        s.read.option("mergeSchema", "true").parquet(tmp)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("o_year")).as("n_with_year"),
            min(col("o_year")).as("min_year"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
               COUNT(*) AS n_with_year,
               CAST(MIN(year(CAST(o_orderdate AS DATE))) AS INT) AS min_year
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // B1-adjacent: ORC round trip (the third columnar/wire format).
    Q(
      "q78_orc_roundtrip",
      (s, dir) => {
        val tmp = graft.Q.scratchDir("orc_rt")
        Tables.supplier(s, dir).write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy(col("s_nationkey"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("s_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_bal"))
          .orderBy("s_nationkey")
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS cnt,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM supplier
        GROUP BY s_nationkey
        ORDER BY s_nationkey""")),

    // B1-adjacent: XML round trip — Spark 4's native XML source (the
    // fourth wire format, SPARK-44265), exercised write-then-read with
    // an explicit read schema (XML infers everything as string
    // otherwise) and verified by the same decimal-exact aggregate as the
    // other round trips.
    Q(
      "q181_xml_roundtrip",
      (s, dir) => {
        val tmp = graft.Q.scratchDir("xml_rt")
        val src = Tables.supplier(s, dir)
        src.write.mode("overwrite")
          .option("rootTag", "suppliers").option("rowTag", "supplier")
          .xml(tmp)
        s.read.schema(src.schema).option("rowTag", "supplier").xml(tmp)
          .groupBy(col("s_nationkey"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("s_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_bal"))
          .orderBy("s_nationkey")
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS cnt,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM supplier
        GROUP BY s_nationkey
        ORDER BY s_nationkey""")),

    // B2/A8: value-partitioned parquet + partition pruning — write orders
    // partitioned by status to a temp dir, read back only one partition.
    // Oracle filters the original table; the plan-level pruning assertion
    // lives in PlanQualitySpec.
    Q(
      "q76_partition_pruning",
      (s, dir) => {
        val tmp = graft.Q.scratchDir("part_prune")
        Tables.orders(s, dir)
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("o_orderstatus") === "F")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // Data-quality sweep: one-pass per-column profile of events (null
    // counts, exact distincts, numeric ranges) — the first job any
    // training-data pipeline runs on a new drop.
    Q(
      "q79_profile_columns",
      (s, dir) =>
        graft.operators.Profiler.profile(
          Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"))
          .orderBy("col_name"),
      Some("""
        SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(event_id) AS n_nulls,
               COUNT(DISTINCT event_id) AS n_distinct,
               CAST(MIN(event_id) AS DOUBLE) AS min_val, CAST(MAX(event_id) AS DOUBLE) AS max_val
        FROM events
        UNION ALL
        SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
               COUNT(DISTINCT event_type), NULL, NULL FROM events
        UNION ALL
        SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
               COUNT(DISTINCT user_id),
               CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE) FROM events
        UNION ALL
        SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
               COUNT(DISTINCT value),
               CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE) FROM events
        ORDER BY col_name""")),

    // A3-repair/B6: natural-key dedup cardinality (keys vs raw rows) on a
    // deliberately coarse key — the metric a checkpoint-replay healer
    // monitors.
    Q(
      "q74_natural_key_dedup",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_keys"))
          .select(
            col("n_rows"), col("n_keys"),
            (col("n_rows") - col("n_keys")).as("n_excess")),
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_keys,
               COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_excess
        FROM lineitem"""))
  ) :+ profilerQ

  /** q160: lexical table profiler — `Profiler.profileLexical` (q79's
    * numeric profiler extended with type-stable STRING min/max
    * renderers, so string/date/integer columns get real bounds) over
    * seven lineitem columns in one aggregate pass. Counts and min/max
    * are plain partial-agg'd aggregates; the exact distincts ride
    * Spark's Expand — the honest 100 TB trade is `exact = false`
    * (or q97's graft_hll registers, also oracle-verifiable) in the
    * same pass. The shipdate timestamp is pre-cast to DATE so the
    * rendered bound is engine-portable.
    */
  private def profilerQ: Q = {
    val plain = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    Q(
      "q160_profile_table",
      (s, dir) => {
        val cols = plain.map(col) :+ to_date(col("l_shipdate")).as("l_shipday")
        graft.operators.Profiler
          .profileLexical(Tables.lineitem(s, dir).select(cols: _*))
          .orderBy("column_name")
      },
      Some {
        val selects = (plain.map(c => c -> c) :+
          ("l_shipday" -> "CAST(l_shipdate AS DATE)")).map { case (name, e) =>
          s"""SELECT '$name' AS column_name, count(*) AS n_rows,
                count(*) - count($e) AS n_nulls,
                count(DISTINCT $e) AS n_distinct,
                CAST(min($e) AS VARCHAR) AS min_s,
                CAST(max($e) AS VARCHAR) AS max_s
              FROM lineitem"""
        }.mkString(" UNION ALL ")
        s"SELECT * FROM ($selects) ORDER BY column_name"
      })
  }
}
