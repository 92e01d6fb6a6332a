package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join surface (SURVEY.md B8-B14): shuffle/broadcast/sort-merge equi-joins,
  * outer/semi/anti, non-equi range joins, interval overlap, as-of.
  *
  * Scale notes: small dimensions are explicitly `broadcast()` so the fact
  * side never shuffles for them; the two large-table joins shuffle on their
  * join key exactly once; the range joins broadcast the tiny band/period
  * side (BroadcastNestedLoopJoin over a handful of rows, not a cross join
  * of two big relations); the as-of join is the union+window formulation
  * that shuffles each side once by key instead of exploding pairs.
  */
object JoinQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** One-time bucketed-table materialization for q29, keyed on the sf
    * dir: lineitem and orders CLUSTERED BY their join key into matching
    * bucket counts. */
  private var bucketedFor: Option[String] = None
  private[queries] def ensureBucketed(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    synchronized {
      // The memo is per-JVM but the CTAS lives in a session catalog: a
      // fresh session in the same JVM would otherwise skip creation and
      // fail with TABLE_OR_VIEW_NOT_FOUND.
      if (!bucketedFor.contains(dir) ||
          !s.catalog.tableExists("graft_li_b") || !s.catalog.tableExists("graft_ord_b")) {
        val tmp = graft.Q.scratchDir("bucketed")
        s.sql("DROP TABLE IF EXISTS graft_li_b")
        s.sql("DROP TABLE IF EXISTS graft_ord_b")
        Tables.lineitem(s, dir).createOrReplaceTempView("li_src")
        Tables.orders(s, dir).createOrReplaceTempView("ord_src")
        s.sql(s"""CREATE TABLE graft_li_b USING PARQUET
                  CLUSTERED BY (l_orderkey) INTO 8 BUCKETS
                  LOCATION '$tmp/li' AS SELECT * FROM li_src""")
        s.sql(s"""CREATE TABLE graft_ord_b USING PARQUET
                  CLUSTERED BY (o_orderkey) INTO 8 BUCKETS
                  LOCATION '$tmp/ord' AS SELECT * FROM ord_src""")
        bucketedFor = Some(dir)
      }
    }

  val qs: Seq[Q] = Seq(
    // B8: shuffle hash/sort-merge equi-join, fact x fact, then aggregate.
    Q(
      "q20_join_agg",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_lines"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // B9: explicit broadcast of the small dims (nation: 25, region: 5).
    Q(
      "q21_join_broadcast",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("r_name"),
      Some("""
        SELECT r_name, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // B10: force the large-large sort-merge path with a merge hint.
    Q(
      "q22_join_sortmerge",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .hint("merge")
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // B11: left outer join preserving order-less customers.
    Q(
      "q23_join_left_outer",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(count(col("o_orderkey")).as("n_orders"), dsum(col("o_totalprice")).as("spent"))
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey""")),

    // B11: left anti — customers that never ordered.
    Q(
      "q24_join_anti",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")),

    // B11: left semi — suppliers with at least one heavy shipment.
    Q(
      "q25_join_semi",
      (s, dir) =>
        Tables.supplier(s, dir)
          .join(
            Tables.lineitem(s, dir).filter(col("l_quantity") > 45),
            col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey"),
      Some("""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        ORDER BY s_suppkey""")),

    // B12: non-equi range join against a tiny broadcast band table.
    Q(
      "q26_join_range_bands",
      (s, dir) => {
        val bands = s.createDataFrame(Seq(
          ("A_low", 0.0, 20000.0),
          ("B_mid", 20000.0, 60000.0),
          ("C_high", 60000.0, 200000.0)
        )).toDF("band", "lo", "hi")
        Tables.lineitem(s, dir)
          .join(broadcast(bands),
            col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("band")
      },
      Some("""
        SELECT band, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        JOIN (VALUES ('A_low', 0.0, 20000.0),
                     ('B_mid', 20000.0, 60000.0),
                     ('C_high', 60000.0, 200000.0)) AS bands(band, lo, hi)
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band
        ORDER BY band""")),

    // Bucketing mandate: co-located large-large join. Both fact tables are
    // written CLUSTERED BY the join key into the same bucket count, so the
    // join needs NO exchange on either side (PlanQualitySpec asserts it) —
    // at 100 TB this is the difference between re-shuffling petabytes per
    // query and shuffling once at write time.
    Q(
      "q29_bucketed_join",
      (s, dir) => {
        // bucketing is a WRITE-TIME layout decision: the CTAS pair runs
        // once per (JVM, sf dir) — re-clustering the fact tables on every
        // query would measure the one-time ETL, not the zero-exchange
        // join the layout buys
        JoinQueries.ensureBucketed(s, dir)
        // merge hint: at test SF the small side would auto-broadcast and
        // ignore the bucket layout; at 100 TB neither side broadcasts and
        // the bucketed SMJ below (zero exchanges) is exactly the plan
        s.table("graft_li_b")
          .hint("merge")
          .join(s.table("graft_ord_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // Skew mandate (SURVEY §7 risks): two-stage salted aggregation — the
    // manual fallback when one key dominates and AQE's skew handling can't
    // apply (e.g. a single hot commodity at 100 TB). Stage 1 aggregates
    // (key, salt) partials; stage 2 combines per key. Result is identical
    // to the direct groupBy, which is exactly what the oracle checks.
    Q(
      "q28_salted_agg",
      (s, dir) =>
        graft.operators.Skew.twoPhaseAgg(
          Tables.lineitem(s, dir), Seq("l_returnflag"), 16, Seq(col("l_partkey")))(
          Seq(
            count(lit(1)).as("pc"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).as("pq")),
          Seq(
            sum(col("pc")).as("cnt"),
            sum(col("pq")).cast(DoubleType).as("sum_qty")))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // Skew join fallback: salted replication join. The fact side gets a
    // deterministic salt; the dimension side is replicated once per salt
    // value, so one hot key spreads over `SALT` reducers instead of one.
    // The oracle is the plain join — salting must not change results.
    Q(
      "q36_salted_join",
      (s, dir) => {
        graft.operators.Skew.saltedEquiJoin(
            Tables.lineitem(s, dir), Tables.orders(s, dir),
            Seq("l_orderkey"), Seq("o_orderkey"),
            buckets = 8, entropyCols = Seq(col("l_partkey"), col("l_suppkey")))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // B11: full outer join — customer slice vs order-aggregate slice with
    // deliberate mismatches on both sides.
    Q(
      "q90_full_outer",
      (s, dir) => {
        val custs = Tables.customer(s, dir)
          .filter(col("c_custkey") < 800)
          .select("c_custkey", "c_mktsegment")
        val spenders = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("o_custkey") >= 700 && col("o_custkey") < 1200)
        custs.join(spenders, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_mktsegment"), col("n_orders"))
          .orderBy("custkey")
      },
      Some("""
        SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_mktsegment, n_orders
        FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 800) c
        FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
                         WHERE o_custkey >= 700 AND o_custkey < 1200
                         GROUP BY o_custkey) o
          ON c_custkey = o_custkey
        ORDER BY custkey""")),

    // B25: duplicate-sensitive set-op variants (unionAll/intersectAll/
    // exceptAll) — cardinalities distinguish them from the distinct forms.
    Q(
      "q91_setops_all",
      (s, dir) => {
        val a = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45).select("l_returnflag")
        val b = Tables.lineitem(s, dir).filter(col("l_extendedprice") > 90000).select("l_returnflag")
        // One plan, one job: per-key counts on each side, full-outer join,
        // and all four multiset cardinalities fall out of a single final
        // aggregate (UNION ALL = ca+cb, INTERSECT ALL = min, EXCEPT ALL =
        // max(ca-cb,0), UNION DISTINCT = #keys). Replaces 4 driver-side
        // .count() actions with zero extra scans of lineitem.
        val ca = a.groupBy("l_returnflag").agg(count(lit(1)).as("ca"))
        val cb = b.groupBy("l_returnflag").agg(count(lit(1)).as("cb"))
        ca.join(cb, Seq("l_returnflag"), "full_outer")
          .select(
            coalesce(col("ca"), lit(0L)).as("ca"),
            coalesce(col("cb"), lit(0L)).as("cb"))
          .agg(
            coalesce(sum(col("ca") + col("cb")), lit(0L)).as("union_all"),
            coalesce(sum(least(col("ca"), col("cb"))), lit(0L)).as("intersect_all"),
            coalesce(sum(greatest(col("ca") - col("cb"), lit(0L))), lit(0L)).as("except_all"),
            count(lit(1)).as("union_distinct"))
          .select(expr(
            """stack(4,
               'union_all', union_all,
               'intersect_all', intersect_all,
               'except_all', except_all,
               'union_distinct', union_distinct) AS (op, cnt)"""))
          .orderBy("op")
      },
      Some("""
        WITH a AS (SELECT l_returnflag FROM lineitem WHERE l_quantity >= 45),
             b AS (SELECT l_returnflag FROM lineitem WHERE l_extendedprice > 90000)
        SELECT 'union_all' AS op, (SELECT COUNT(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) AS cnt
        UNION ALL SELECT 'intersect_all', (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
        UNION ALL SELECT 'except_all', (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
        UNION ALL SELECT 'union_distinct', (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
        ORDER BY op""")),

    // B14: interval overlap join — 30-day order windows vs promo periods.
    Q(
      "q27_join_interval_overlap",
      (s, dir) => {
        val promos = s.createDataFrame(Seq(
          ("NEWYEAR96", "1996-01-01", "1996-02-15"),
          ("SUMMER97", "1997-06-01", "1997-08-31"),
          ("FALL99", "1999-09-01", "1999-11-15")
        )).toDF("promo", "p_start", "p_end")
          .select(col("promo"), col("p_start").cast(DateType), col("p_end").cast(DateType))
        val o = Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            col("o_orderdate").cast(DateType).as("o_start"),
            date_add(col("o_orderdate").cast(DateType), 30).as("o_end"))
        o.join(broadcast(promos),
            col("o_start") <= col("p_end") && col("p_start") <= col("o_end"))
          .groupBy(col("promo"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("promo")
      },
      Some("""
        SELECT promo, COUNT(*) AS n_orders
        FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_start,
                     CAST(o_orderdate AS DATE) + 30 AS o_end
              FROM orders) o
        JOIN (VALUES ('NEWYEAR96', DATE '1996-01-01', DATE '1996-02-15'),
                     ('SUMMER97', DATE '1997-06-01', DATE '1997-08-31'),
                     ('FALL99', DATE '1999-09-01', DATE '1999-11-15')) AS p(promo, p_start, p_end)
          ON o_start <= p_end AND p_start <= o_end
        GROUP BY promo
        ORDER BY promo""")),

    // B14 scale path: the same interval-overlap semantics as q27, but
    // executed as a bin-bucketed EQUI join (operators/RangeJoin) instead
    // of a broadcast nested loop — one shuffle on the bin id, survives
    // two unbounded sides. Must hash-match q27's oracle exactly.
    Q(
      "q124_interval_bin_join",
      (s, dir) => {
        val promos = s.createDataFrame(Seq(
          ("NEWYEAR96", "1996-01-01", "1996-02-15"),
          ("SUMMER97", "1997-06-01", "1997-08-31"),
          ("FALL99", "1999-09-01", "1999-11-15")
        )).toDF("promo", "p_start", "p_end")
          .select(col("promo"),
            unix_date(col("p_start").cast(DateType)).cast("long").as("ps"),
            unix_date(col("p_end").cast(DateType)).cast("long").as("pe"))
        val o = Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            unix_date(col("o_orderdate").cast(DateType)).cast("long").as("os"),
            (unix_date(col("o_orderdate").cast(DateType)) + 30).cast("long").as("oe"))
        graft.operators.RangeJoin.overlapJoin(o, promos, "os", "oe", "ps", "pe", binWidth = 32)
          .groupBy(col("promo"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("promo")
      },
      Some("""
        SELECT promo, COUNT(*) AS n_orders
        FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_start,
                     CAST(o_orderdate AS DATE) + 30 AS o_end
              FROM orders) o
        JOIN (VALUES ('NEWYEAR96', DATE '1996-01-01', DATE '1996-02-15'),
                     ('SUMMER97', DATE '1997-06-01', DATE '1997-08-31'),
                     ('FALL99', DATE '1999-09-01', DATE '1999-11-15')) AS p(promo, p_start, p_end)
          ON o_start <= p_end AND p_start <= o_end
        GROUP BY promo
        ORDER BY promo"""))
  )
}
