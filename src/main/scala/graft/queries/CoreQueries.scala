package graft.queries

import graft.{Q, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan / filter / project / aggregate / sort / set-op / pivot surface
  * (SURVEY.md B1-B5, B15-B17, B23-B28, B31).
  *
  * Float discipline: every aggregated money/quantity column is cast to
  * decimal per-row, summed exactly, and only then cast back to double, so
  * Spark and DuckDB produce bit-identical doubles regardless of partial-agg
  * combine order. Per-row double arithmetic (IEEE) is identical across
  * engines and needs no such care.
  */
object CoreQueries {

  /** Exact decimal sum rendered as double — Spark side. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact decimal sum rendered as double — oracle side. */
  private def osum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  val qs: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // B15/B16: TPC-H-Q1-style hash aggregate with partial->final combine.
    // The agri analogue: modal-price stats per (commodity, grade)
    // (reference stores exactly this shape per data/crops/*.csv).
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        val disc  = (lit(1.0) - col("l_discount")).cast(DecimalType(6, 4))
        val plus  = (lit(1.0) + col("l_tax")).cast(DecimalType(6, 4))
        val price = col("l_extendedprice").cast(DecimalType(12, 2))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            // true scale of price*(1-d) is 4 and of price*(1-d)*(1+t) is 6,
            // so a rescale to 6 is exact (never rounds) and the unscaled
            // value stays under 2^53 -> both engines cast to the same double
            sum(price * disc).cast(DoubleType).as("sum_disc_price"),
            sum((price * disc).cast(DecimalType(24, 6)) * plus).cast(DecimalType(30, 6)).cast(DoubleType).as("sum_charge"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(6,4)) AS DECIMAL(24,6)) * CAST(1.0 + l_tax AS DECIMAL(6,4))) AS DECIMAL(30,6)) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    // B5: predicate zoo — BETWEEN, IN, LIKE, RLIKE, null-safe conjunction.
    Q(
      "q02_filter_predicates",
      (s, dir) =>
        Tables.part(s, dir)
          .filter(
            col("p_size").between(10, 30) &&
              col("p_type").isin("PROMO", "ECONOMY") &&
              col("p_name").like("%o%") &&
              col("p_brand").rlike("Brand#[12][0-9]"))
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, p_name, p_brand, p_type, p_size
        FROM part
        WHERE p_size BETWEEN 10 AND 30
          AND p_type IN ('PROMO','ECONOMY')
          AND p_name LIKE '%o%'
          AND regexp_matches(p_brand, 'Brand#[12][0-9]')
        ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // B4: projection + derived columns; per-row IEEE double arithmetic is
    // engine-identical so revenue needs no decimal detour.
    Q(
      "q03_projection",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            round(abs(log(col("l_extendedprice"))), 6).as("log_price"),
            col("l_shipdate").cast(DateType).as("ship_date"))
          .orderBy("l_orderkey", "l_linenumber", "revenue", "log_price", "ship_date")
          .limit(1000),
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS revenue,
               round(abs(ln(l_extendedprice)), 6) AS log_price,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, revenue, log_price, ship_date
        LIMIT 1000""")),

    // ------------------------------------------------------------------
    // B17: rollup — the state->district->market hierarchy analogue.
    Q(
      "q04_rollup",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("cnt"), col("sum_qty"))
          .orderBy("rf", "ls"),
      Some("""
        SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // B17: cube.
    Q(
      "q05_cube",
      (s, dir) =>
        Tables.orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("cnt"), col("sum_price"))
          .orderBy("st", "prio"),
      Some("""
        SELECT COALESCE(o_orderstatus,'ALL') AS st, COALESCE(o_orderpriority,'ALL') AS prio,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY st, prio""")),

    // B17: grouping sets via the SQL surface (spark.sql over a temp view).
    Q(
      "q06_grouping_sets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
        s.sql("""
          SELECT COALESCE(o_orderstatus,'ALL') AS st, COALESCE(o_orderpriority,'ALL') AS prio,
                 COUNT(*) AS cnt
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY st, prio""")
      },
      Some("""
        SELECT COALESCE(o_orderstatus,'ALL') AS st, COALESCE(o_orderpriority,'ALL') AS prio,
               COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY st, prio""")),

    // ------------------------------------------------------------------
    // B24: top-k — Catalyst plans this as TakeOrderedAndProject (no full
    // sort, per-partition heaps then a k-way driver merge: exactly what you
    // want at 100 TB).
    Q(
      "q07_topk_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10""")),

    // B23: multi-key sort with explicit null ordering.
    Q(
      "q08_sort_nulls",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            nullif(col("o_orderpriority"), lit("5-LOW")).as("prio_or_null"))
          .orderBy(col("prio_or_null").desc_nulls_last, col("o_orderkey"))
          .limit(500),
      Some("""
        SELECT o_orderkey, nullif(o_orderpriority,'5-LOW') AS prio_or_null
        FROM orders
        ORDER BY prio_or_null DESC NULLS LAST, o_orderkey
        LIMIT 500""")),

    // ------------------------------------------------------------------
    // B25: union / intersect / except over two brand type-sets.
    Q(
      "q09_set_ops",
      (s, dir) => {
        val p = Tables.part(s, dir)
        val a = p.filter(col("p_brand") === "Brand#1").select("p_type").distinct()
        val b = p.filter(col("p_brand") === "Brand#2").select("p_type").distinct()
        a.union(b).distinct().withColumn("op", lit("union"))
          .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
          .unionByName(a.except(b).withColumn("op", lit("except")))
          .select("op", "p_type")
          .orderBy("op", "p_type")
      },
      Some("""
        WITH a AS (SELECT DISTINCT p_type FROM part WHERE p_brand='Brand#1'),
             b AS (SELECT DISTINCT p_type FROM part WHERE p_brand='Brand#2')
        SELECT 'union' AS op, p_type FROM (SELECT p_type FROM a UNION SELECT p_type FROM b)
        UNION ALL
        SELECT 'intersect' AS op, p_type FROM (SELECT p_type FROM a INTERSECT SELECT p_type FROM b)
        UNION ALL
        SELECT 'except' AS op, p_type FROM (SELECT p_type FROM a EXCEPT SELECT p_type FROM b)
        ORDER BY op, p_type""")),

    // ------------------------------------------------------------------
    // B26/A9: string function zoo incl. the reference's safe_name.
    Q(
      "q10_string_funcs",
      (s, dir) =>
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            safeName(concat_ws(" ", col("p_brand"), col("p_name"))).as("safe"),
            upper(col("p_name")).as("uname"),
            substring(col("p_name"), 1, 3).as("pre3"),
            size(split(col("p_name"), " ")).as("n_words"),
            levenshtein(col("p_name"), lit("red widget")).as("lev"),
            length(col("p_name")).as("len"))
          .orderBy("p_partkey")
          .limit(500),
      Some("""
        SELECT p_partkey,
               regexp_replace(regexp_replace(regexp_replace(lower(p_brand || ' ' || p_name), '^\s+|\s+$', '', 'g'), '[^\w\s-]', '', 'g'), '\s+', '_', 'g') AS safe,
               upper(p_name) AS uname,
               substr(p_name, 1, 3) AS pre3,
               CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
               CAST(levenshtein(p_name, 'red widget') AS INT) AS lev,
               CAST(length(p_name) AS INT) AS len
        FROM part
        ORDER BY p_partkey
        LIMIT 500""")),

    // ------------------------------------------------------------------
    // B27/A5: date/time function zoo (dayofweek aligned to Spark's
    // 1=Sunday; DuckDB dayofweek is 0=Sunday, hence the +1).
    Q(
      "q11_datetime_funcs",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofweek(col("o_orderdate")).as("dow"),
            date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
            datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType)).as("days_since"),
            add_months(col("o_orderdate").cast(DateType), 3).as("plus3m"),
            last_day(col("o_orderdate").cast(DateType)).as("eom"))
          .orderBy("o_orderkey")
          .limit(500),
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
               last_day(CAST(o_orderdate AS DATE)) AS eom
        FROM orders
        ORDER BY o_orderkey
        LIMIT 500""")),

    // ------------------------------------------------------------------
    // B28: statistical aggregates. Moments are accumulated as exact
    // decimals and the stddev/corr formulas evaluated in double with the
    // same expression tree on both sides -> bit-identical results without
    // depending on either engine's internal accumulation order.
    Q(
      "q12_math_stats",
      (s, dir) => {
        val q  = col("l_quantity").cast(DecimalType(18, 2))
        val p  = col("l_extendedprice").cast(DecimalType(18, 2))
        val n  = count(lit(1)).cast(DoubleType)
        val sx = sum(q).cast(DoubleType)
        val sy = sum(p).cast(DoubleType)
        val sxx = sum(q * q).cast(DoubleType)
        val syy = sum(p * p).cast(DoubleType)
        val sxy = sum(q * p).cast(DoubleType)
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            n.cast(LongType).as("n"),
            // the squared-sum moments overflow 2^53 unscaled, so their
            // double renderings can differ by 1 ulp between engines
            // (DuckDB int128->double double-rounds); round the derived
            // statistics coarsely enough to absorb that wobble
            round(sqrt((sxx - sx * sx / n) / (n - lit(1.0))), 6).as("std_qty"),
            round((sxy - sx * sy / n) / (n - lit(1.0)), 4).as("covar_qty_price"),
            round((sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 9).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag,
                 COUNT(*) AS cnt,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, cnt AS n,
               round(sqrt((sxx - sx * sx / n) / (n - 1.0)), 6) AS std_qty,
               round((sxy - sx * sy / n) / (n - 1.0), 4) AS covar_qty_price,
               round((sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 9) AS corr_qty_price
        FROM m
        ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // B28 extras: bitwise aggregates (bit_and/bit_or/bit_xor) — exact
    // integer semantics, identical in both engines.
    Q(
      "q100_bitwise_agg",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .withColumn("v", (col("l_partkey") % 256).cast(IntegerType))
          .groupBy(col("l_returnflag"))
          .agg(
            expr("bit_and(v)").as("band"),
            expr("bit_or(v)").as("bor"),
            expr("bit_xor(v)").as("bxor"),
            expr("bit_count(bit_or(v))").as("bits_used"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               bit_and(v) AS band, bit_or(v) AS bor, bit_xor(v) AS bxor,
               CAST(bit_count(bit_or(v)) AS INT) AS bits_used
        FROM (SELECT l_returnflag, CAST(l_partkey % 256 AS INT) AS v FROM lineitem)
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // B26 extras: padding / translate / repeat / ascii-chr round trip.
    Q(
      "q101_string_pad",
      (s, dir) =>
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("lp"),
            rpad(col("p_brand"), 12, "-").as("rp"),
            translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
            expr("repeat(p_brand, 2)").as("rep"),
            reverse(col("p_type")).as("rev"),
            ascii(col("p_name")).as("first_code"),
            expr("chr(ascii(p_name))").as("first_char"))
          .orderBy("p_partkey")
          .limit(400),
      Some("""
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS lp,
               rpad(p_brand, 12, '-') AS rp,
               translate(p_name, 'aeiou', 'AEIOU') AS tr,
               repeat(p_brand, 2) AS rep,
               reverse(p_type) AS rev,
               ascii(p_name) AS first_code,
               chr(ascii(p_name)) AS first_char
        FROM part
        ORDER BY p_partkey
        LIMIT 400""")),

    // B29 extras: array set algebra. Both engines' set ops are
    // order-unstable, so every set-valued output is sorted, then joined
    // to a single string: the compare harness row-sorts results with
    // pandas, which cannot hash raw array cells — oracle-checked outputs
    // must be scalar columns.
    Q(
      "q102_array_setops",
      (s, dir) => {
        val words = split(col("p_name"), " ")
        val probe = array(lit("red"), lit("green"), lit("blue"))
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            array_join(sort_array(array_distinct(words)), " ").as("uniq"),
            array_join(sort_array(array_intersect(words, probe)), " ").as("inter"),
            array_join(sort_array(array_except(words, probe)), " ").as("minus"),
            array_contains(words, "red").as("has_red"),
            size(array_union(words, probe)).as("n_union"))
          .orderBy("p_partkey")
          .limit(400)
      },
      Some("""
        SELECT p_partkey,
               -- DuckDB's array_to_string is NULL on an empty list where
               -- Spark's array_join is '' — coalesce to match
               COALESCE(array_to_string(list_sort(list_distinct(words)), ' '), '') AS uniq,
               COALESCE(array_to_string(list_sort(list_intersect(words, ['red','green','blue'])), ' '), '') AS inter,
               COALESCE(array_to_string(list_sort(list_filter(list_distinct(words), w -> NOT list_contains(['red','green','blue'], w))), ' '), '') AS minus,
               list_contains(words, 'red') AS has_red,
               CAST(len(list_distinct(list_concat(words, ['red','green','blue']))) AS INT) AS n_union
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
        ORDER BY p_partkey
        LIMIT 400""")),

    // ------------------------------------------------------------------
    // B31: pivot (Spark .pivot with explicit value list; oracle uses
    // portable CASE-WHEN — same result matrix).
    Q(
      "q13_pivot",
      (s, dir) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val renames = Map(
          "1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high", "3-MEDIUM" -> "p_medium",
          "4-NOT SPECIFIED" -> "p_notspec", "5-LOW" -> "p_low")
        val piv = Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", prios)
          .agg(count(lit(1)))
        renames.foldLeft(piv) { case (df, (from, to)) =>
          df.withColumn(to, coalesce(col(s"`$from`"), lit(0L))).drop(from)
        }.orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p_urgent,
               COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p_high,
               COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p_medium,
               COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
               COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p_low
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // B31: unpivot via stack() back to long form, then aggregate.
    Q(
      "q14_unpivot",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .selectExpr("stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) AS (metric, val)")
          .groupBy("metric")
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("val").cast(DecimalType(18, 4))).cast(DoubleType).as("total"))
          .orderBy("metric"),
      Some("""
        SELECT metric, COUNT(*) AS cnt,
               CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM (
          SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
          UNION ALL SELECT 'discount', l_discount FROM lineitem
          UNION ALL SELECT 'tax', l_tax FROM lineitem)
        GROUP BY metric
        ORDER BY metric""")),

    // B26: second string batch — pad/translate/reverse/repeat/position.
    Q(
      "q18_string_extras",
      (s, dir) =>
        Tables.customer(s, dir)
          .select(
            col("c_custkey"),
            lpad(col("c_name"), 25, "*").as("padded"),
            translate(col("c_name"), "Cust#", "Kd_").as("translated"),
            reverse(col("c_name")).as("reversed"),
            expr("repeat('ab', 3)").as("repeated"),
            expr("position('#' IN c_name)").as("hash_pos"),
            split_part(col("c_name"), lit("#"), lit(2)).as("cust_num"))
          .orderBy("c_custkey")
          .limit(400),
      Some("""
        SELECT c_custkey,
               lpad(c_name, 25, '*') AS padded,
               -- translate drops chars with no counterpart: 'Cust#'->'Kd_'
               translate(c_name, 'Cust#', 'Kd_') AS translated,
               reverse(c_name) AS reversed,
               repeat('ab', 3) AS repeated,
               CAST(position('#' IN c_name) AS INT) AS hash_pos,
               split_part(c_name, '#', 2) AS cust_num
        FROM customer
        ORDER BY c_custkey
        LIMIT 400""")),

    // B27: second datetime batch — quarter, ISO week, unix round trip,
    // months_between-equivalent arithmetic, next_day.
    Q(
      "q19_datetime_extras",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            quarter(col("o_orderdate")).as("q"),
            weekofyear(col("o_orderdate")).as("iso_week"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            from_unixtime(unix_timestamp(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("rt"),
            ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1).as("months_since"),
            next_day(col("o_orderdate").cast(DateType), "Mon").as("next_monday"))
          .orderBy("o_orderkey")
          .limit(400),
      Some("""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS rt,
               CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS INT) AS months_since,
               CAST(CAST(o_orderdate AS DATE) + CAST((7 - dayofweek(o_orderdate)) % 7 + 1 AS INT) AS DATE) AS next_monday
        FROM orders
        ORDER BY o_orderkey
        LIMIT 400""")),

    // ------------------------------------------------------------------
    // Sketch-based join pruning: build a Bloom filter over the "hot" key
    // set, prune the probe side before the exact join — the standard
    // pattern for cutting a 100 TB probe-side scan when the build side is
    // selective. Verified properties: zero false negatives (every exact
    // match survives pruning) and a bounded false-positive rate.
    Q(
      "q16_bloom_prune",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val hot = li.filter(col("l_quantity") >= 49).select("l_orderkey")
        val bf = hot.stat.bloomFilter("l_orderkey", 10000, 0.01)
        val mightContain = udf((k: Long) => bf.mightContain(k))
        val orders = Tables.orders(s, dir)
        val prunedCnt = orders.filter(mightContain(col("o_orderkey"))).count()
        val exact = orders.join(hot.distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        val exactCnt = exact.count()
        val falseNeg = exact.filter(!mightContain(col("o_orderkey"))).count()
        val total = orders.count()
        import s.implicits._
        Seq((exactCnt, falseNeg == 0,
          (prunedCnt - exactCnt).toDouble / math.max(1L, total - exactCnt) <= 0.05))
          .toDF("exact_cnt", "no_false_negatives", "fp_rate_ok")
      },
      Some("""
        SELECT COUNT(*) AS exact_cnt, TRUE AS no_false_negatives, TRUE AS fp_rate_ok
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""")),

    // Count-Min sketch frequency estimation: overestimates only, within a
    // relative-error bound — the sketch that answers "how hot is this
    // key" without a groupBy over 100 TB.
    Q(
      "q17_countmin",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val cms = li.stat.countMinSketch(col("l_returnflag"), 0.001, 0.99, 42)
        val truth = li.groupBy("l_returnflag").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
        val rows = truth.map { case (flag, cnt) =>
          val est = cms.estimateCount(flag)
          (flag, cnt, est >= cnt, est <= (cnt * 1.05).toLong)
        }
        import s.implicits._
        rows.toSeq.toDF("l_returnflag", "true_cnt", "never_underestimates", "within_5pct")
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS true_cnt,
               TRUE AS never_underestimates, TRUE AS within_5pct
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // B15 extras: predicate aggregates, distinct-set aggregation, and a
    // tie-proof argmax via struct-max (min_by/max_by tie-break is
    // undefined in both engines; max(struct(value, key)) is total).
    Q(
      "q38_agg_extras",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(
            count_if(col("o_totalprice") > 100000).as("n_big"),
            bool_and(col("o_totalprice") > 0).as("all_positive"),
            bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
            array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("prios"),
            max(struct(col("o_totalprice"), col("o_orderkey")))
              .getField("o_orderkey").as("argmax_key"))
          .orderBy("o_orderstatus"),
      Some("""
        WITH am AS (
          SELECT o_orderstatus, o_orderkey,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
          FROM orders)
        SELECT o.o_orderstatus,
               CAST(count_if(o.o_totalprice > 100000) AS BIGINT) AS n_big,
               bool_and(o.o_totalprice > 0) AS all_positive,
               bool_or(o.o_orderpriority = '1-URGENT') AS any_urgent,
               array_to_string(list_sort(list_distinct(list(o.o_orderpriority))), ',') AS prios,
               ANY_VALUE(am.o_orderkey) AS argmax_key
        FROM orders o
        JOIN am ON am.o_orderstatus = o.o_orderstatus AND am.rn = 1
        GROUP BY o.o_orderstatus
        ORDER BY o.o_orderstatus""")),

    // B5/B26: null-handling function family — coalesce/nullif/nvl2-shape,
    // NaN detection and replacement, null-safe equality.
    Q(
      "q92_null_funcs",
      (s, dir) =>
        Tables.customer(s, dir)
          .select(
            col("c_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg_filled"),
            when(col("c_acctbal") < 0, lit(Double.NaN)).otherwise(col("c_acctbal")).as("bal_nan"),
            isnan(when(col("c_acctbal") < 0, lit(Double.NaN)).otherwise(col("c_acctbal"))).as("is_nan"),
            nanvl(when(col("c_acctbal") < 0, lit(Double.NaN)).otherwise(col("c_acctbal")), lit(0.0)).as("bal_clean"),
            (nullif(col("c_mktsegment"), lit("BUILDING")) <=> lit(null)).as("nullsafe_eq_null"))
          .filter(col("is_nan") || col("nullsafe_eq_null"))
          .drop("bal_nan")
          .orderBy("c_custkey")
          .limit(500),
      Some("""
        SELECT c_custkey, seg_nb, seg_filled, is_nan, bal_clean, nullsafe_eq_null
        FROM (
          SELECT c_custkey,
                 nullif(c_mktsegment, 'BUILDING') AS seg_nb,
                 coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_filled,
                 isnan(CASE WHEN c_acctbal < 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END) AS is_nan,
                 CASE WHEN isnan(CASE WHEN c_acctbal < 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END)
                      THEN 0.0 ELSE c_acctbal END AS bal_clean,
                 nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS nullsafe_eq_null
          FROM customer)
        WHERE is_nan OR nullsafe_eq_null
        ORDER BY c_custkey
        LIMIT 500""")),

    // Correlated scalar subquery — Catalyst decorrelates it into a join
    // (RewriteCorrelatedScalarSubquery; SURVEY §4). Written via the SQL
    // surface to exercise the analyzer path a reference user would hit.
    Q(
      "q37_correlated_subquery",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("cust_cs")
        Tables.orders(s, dir).createOrReplaceTempView("ord_cs")
        s.sql("""
          SELECT c_custkey,
                 (SELECT COUNT(*) FROM ord_cs o WHERE o.o_custkey = c.c_custkey) AS n_orders,
                 (SELECT MAX(o_totalprice) FROM ord_cs o WHERE o.o_custkey = c.c_custkey) AS max_spent
          FROM cust_cs c
          ORDER BY c_custkey
          LIMIT 500""")
      },
      Some("""
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_spent
        FROM customer c
        ORDER BY c_custkey
        LIMIT 500""")),

    // ------------------------------------------------------------------
    // B29: array / higher-order functions over the embeddings table.
    // float->double casts are exact; the 8-element slice sum is a
    // sequential fold on both sides.
    Q(
      "q15_array_funcs",
      (s, dir) => {
        val emb = asDouble(col("embedding"))
        Tables.embeddings(s, dir)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            round(element_at(emb, 1), 6).as("e1"),
            round(aggregate(slice(emb, 1, 8), lit(0.0), (a, x) => a + x), 6).as("sum8"),
            round(array_max(emb), 6).as("mx"),
            round(array_min(emb), 6).as("mn"))
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
               round(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 6) AS sum8,
               round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
               round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn
        FROM embeddings
        ORDER BY vec_id""")),

    // Skyline (Pareto frontier): parts where no other part has >= price
    // AND <= size with one strictly better — multi-objective selection
    // (the curation analogue: pick docs maximizing quality while
    // minimizing length). The naive definition is the O(n^2) NOT EXISTS
    // the oracle runs; the engine path is the 2-D sweep: reduce to the
    // per-size max price (hash aggregate, bounded by distinct sizes),
    // then one window pass ordered by size keeps a point iff its price
    // beats every smaller size's running max. At 100 TB the reduction is
    // a partial-agg'd shuffle on size and the window runs over |distinct
    // sizes| rows — no pairwise comparison anywhere.
    Q(
      "q155_skyline",
      (s, dir) => {
        val perSize = graft.operators.BoundedWindow.aggregated(
          Tables.part(s, dir)
            .groupBy("p_size").agg(max(col("p_retailprice")).as("price")),
          "distinct p_size values")
        val w = graft.operators.BoundedWindow.orderBy(col("p_size"))
          .rowsBetween(Window.unboundedPreceding, -1)
        perSize
          .withColumn("prev_best", max(col("price")).over(w))
          .filter(col("prev_best").isNull || col("price") > col("prev_best"))
          .select(col("p_size"), col("price"))
          .orderBy("p_size")
      },
      Some("""
        WITH pts AS (SELECT p_size, max(p_retailprice) AS price
                     FROM part GROUP BY 1)
        SELECT p_size, price FROM pts a
        WHERE NOT EXISTS (
          SELECT 1 FROM pts b
          WHERE b.price >= a.price AND b.p_size <= a.p_size
            AND (b.price > a.price OR b.p_size < a.p_size))
        ORDER BY p_size"""))
  )
}
