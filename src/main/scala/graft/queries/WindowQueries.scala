package graft.queries

import graft.{Q, Tables}
import graft.operators.{AsOfJoin, BoundedWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface (SURVEY.md B20-B22), deterministic dedup (B6)
  * and the as-of join demo (B13).
  *
  * Frames over money columns stay DECIMAL until after the window sum, so
  * sliding-frame results are exact and engine-independent (DuckDB computes
  * sliding sums with a segment tree; Spark re-adds per frame — with
  * doubles those would differ in the last bits, with decimals they can't).
  */
object WindowQueries {

  val qs: Seq[Q] = Seq(
    // B20: ranking family (row_number needs a total tiebreak; rank and
    // dense_rank are shown over the value-only ordering so ties surface).
    Q(
      "q30_window_rank",
      (s, dir) => {
        val wOrd   = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
        val wPrice = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
        Tables.part(s, dir)
          .select(
            col("p_brand"), col("p_partkey"), col("p_retailprice"),
            row_number().over(wOrd).as("rn"),
            rank().over(wPrice).as("rk"),
            dense_rank().over(wPrice).as("drk"),
            ntile(4).over(wOrd).as("quartile"))
          .filter(col("rn") <= 3)
          .orderBy("p_brand", "rn")
      },
      Some("""
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk, CAST(drk AS INT) AS drk,
               quartile FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn,
                 rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rk,
                 dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drk,
                 CAST(ntile(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INT) AS quartile
          FROM part)
        WHERE rn <= 3
        ORDER BY p_brand, rn""")),

    // B21: lag/lead over the daily revenue series (day-over-day delta —
    // the reference corpus' day-over-day modal-price query shape).
    Q(
      "q31_window_lag_lead",
      (s, dir) => {
        val daily = BoundedWindow.aggregated(
          Tables.orders(s, dir)
            .groupBy(col("o_orderdate").cast(DateType).as("d"))
            .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"),
              count(lit(1)).as("n")),
          "distinct order dates")
        val w = BoundedWindow.orderBy(col("d"))
        daily
          .select(
            col("d"),
            col("rev_dec").cast(DoubleType).as("rev"),
            lag(col("rev_dec"), 1).over(w).cast(DoubleType).as("prev_rev"),
            lead(col("rev_dec"), 1).over(w).cast(DoubleType).as("next_rev"),
            (col("rev_dec") - lag(col("rev_dec"), 1).over(w)).cast(DoubleType).as("delta"))
          .orderBy("d")
          .limit(1000)
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
          FROM orders GROUP BY 1)
        SELECT d,
               CAST(rev_dec AS DOUBLE) AS rev,
               CAST(lag(rev_dec, 1) OVER (ORDER BY d) AS DOUBLE) AS prev_rev,
               CAST(lead(rev_dec, 1) OVER (ORDER BY d) AS DOUBLE) AS next_rev,
               CAST(rev_dec - lag(rev_dec, 1) OVER (ORDER BY d) AS DOUBLE) AS delta
        FROM daily
        ORDER BY d
        LIMIT 1000""")),

    // B22: sliding frame — 7-row moving sum/avg over the daily series,
    // exact via decimal-through-the-frame.
    Q(
      "q32_window_moving_avg",
      (s, dir) => {
        val daily = BoundedWindow.aggregated(
          Tables.orders(s, dir)
            .groupBy(col("o_orderdate").cast(DateType).as("d"))
            .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec")),
          "distinct order dates")
        val w = BoundedWindow.orderBy(col("d")).rowsBetween(-6, 0)
        daily
          .select(
            col("d"),
            col("rev_dec").cast(DoubleType).as("rev"),
            sum(col("rev_dec")).over(w).cast(DoubleType).as("mov_sum"),
            (sum(col("rev_dec")).over(w).cast(DoubleType) / count(lit(1)).over(w)).as("mov_avg"))
          .orderBy("d")
          .limit(1000)
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
          FROM orders GROUP BY 1)
        SELECT d,
               CAST(rev_dec AS DOUBLE) AS rev,
               CAST(SUM(rev_dec) OVER w AS DOUBLE) AS mov_sum,
               CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY d
        LIMIT 1000""")),

    // B20/B21 extras: percent_rank, cume_dist, first/last/nth value over
    // explicit frames (int/exact-ratio outputs — cross-engine safe).
    Q(
      "q35_window_extras",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val wFrame = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.customer(s, dir)
          .select(
            col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            round(percent_rank().over(wOrd), 9).as("pr"),
            round(cume_dist().over(wOrd), 9).as("cd"),
            first(col("c_custkey")).over(wFrame).as("richest_so_far"),
            nth_value(col("c_custkey"), 2).over(wFrame).as("second_richest"))
          .filter(col("pr") <= 0.01)
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""
        SELECT c_mktsegment, c_custkey, c_acctbal, pr, cd, richest_so_far, second_richest
        FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 round(percent_rank() OVER w, 9) AS pr,
                 round(cume_dist() OVER w, 9) AS cd,
                 first_value(c_custkey) OVER wf AS richest_so_far,
                 nth_value(c_custkey, 2) OVER wf AS second_richest
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
                 wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        WHERE pr <= 0.01
        ORDER BY c_mktsegment, c_custkey""")),

    // B22: value-based RANGE frame — a true 7-calendar-day trailing sum
    // (unlike the ROWS frame of q32, gaps in the date series don't
    // stretch the window). Ordering key is integer day-number; the summed
    // measure stays decimal through the frame for exactness.
    Q(
      "q93_window_range_frame",
      (s, dir) => {
        val daily = BoundedWindow.aggregated(
          Tables.orders(s, dir)
            .groupBy(col("o_orderdate").cast(DateType).as("d"))
            .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"))
            .withColumn("day_num", datediff(col("d"), lit("1995-01-01").cast(DateType))),
          "distinct order dates")
        val w = BoundedWindow.orderBy(col("day_num")).rangeBetween(-6, 0)
        daily
          .select(
            col("d"),
            sum(col("rev_dec")).over(w).cast(DoubleType).as("trailing_7d"),
            count(lit(1)).over(w).as("days_present"))
          .orderBy("d")
          .limit(1000)
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
                 datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num
          FROM orders GROUP BY 1, 3)
        SELECT d,
               CAST(SUM(rev_dec) OVER w AS DOUBLE) AS trailing_7d,
               COUNT(*) OVER w AS days_present
        FROM daily
        WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY d
        LIMIT 1000""")),

    // B21: first/last with ignoreNulls over frames — carry-forward of the
    // most recent non-null value (the gap-fill idiom for sparse series).
    Q(
      "q94_last_ignore_nulls",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .withColumn("maybe_prio",
            when(col("o_orderkey") % 3 === 0, col("o_orderpriority")))
          .select(
            col("o_orderstatus"), col("o_orderkey"), col("maybe_prio"),
            last(col("maybe_prio"), ignoreNulls = true).over(w).as("prio_filled"),
            first(col("maybe_prio"), ignoreNulls = true).over(w).as("prio_first"))
          .orderBy("o_orderstatus", "o_orderkey")
          .limit(1000)
      },
      Some("""
        SELECT o_orderstatus, o_orderkey, maybe_prio,
               last_value(maybe_prio IGNORE NULLS) OVER w AS prio_filled,
               first_value(maybe_prio IGNORE NULLS) OVER w AS prio_first
        FROM (SELECT o_orderstatus, o_orderkey,
                     CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS maybe_prio
              FROM orders)
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderstatus, o_orderkey
        LIMIT 1000""")),

    // B6: deterministic keep-first dedup (the downstream repair for the
    // reference's at-least-once checkpoint window, fetch_data.py:143-162).
    Q(
      "q33_dedup_keep_first",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
          .orderBy("user_id", "event_type")
      },
      Some("""
        SELECT user_id, event_type, event_id AS first_event_id FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
          FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type""")),

    // B13 (native operator): the same as-of semantics through the custom
    // LogicalPlan -> AsOfJoinStrategy -> sort-merge AsOfJoinExec
    // (graft.plans) — one shuffle+sort per side, O(1) merge state.
    Q(
      "q39_asof_native",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
        AsOfJoin.asOfNative(purchases, views,
            Seq("user_id"), Seq("v_user"), "ts", "view_ts")
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_view_ts"))
          .orderBy("event_id")
      },
      Some("""
        SELECT p.event_id, p.user_id,
               strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime(CAST(v.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS last_view_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        ORDER BY p.event_id""")),

    // B13: as-of join — each purchase picks up the user's latest view at
    // or before it (union+window formulation; oracle uses DuckDB ASOF).
    Q(
      "q34_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
        AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts", "ts", Seq("view_ts"))
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            date_format(col("asof_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_view_ts"))
          .orderBy("event_id")
      },
      Some("""
        SELECT p.event_id, p.user_id,
               strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime(CAST(v.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS last_view_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        ORDER BY p.event_id""")),

    // B13, pandas-merge_asof direction/tolerance surface: each purchase
    // attaches the NEXT view within one hour (forward direction +
    // tolerance) — DuckDB has no forward ASOF, so the oracle brute-forces
    // it as min-of-later-within-window. Same union+window plan shape as
    // q34: one shuffle per side, no pair blowup; the tolerance is a
    // post-carry filter, not a join predicate.
    Q(
      "q127_asof_forward_tolerance",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
        AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts", "ts", Seq("view_ts"),
            direction = "forward", tolerance = Some(3600.0))
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            date_format(col("asof_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("next_view_ts"))
          .orderBy("event_id")
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'view'),
        m AS (SELECT p.event_id, MIN(v.ts) AS next_ts
              FROM p JOIN v
                ON v.user_id = p.user_id AND v.ts >= p.ts
               AND epoch(v.ts) - epoch(p.ts) <= 3600
              GROUP BY p.event_id)
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime(m.next_ts, '%Y-%m-%d %H:%M:%S.%f') AS next_view_ts
        FROM p LEFT JOIN m USING (event_id)
        ORDER BY p.event_id"""))
  )
}
