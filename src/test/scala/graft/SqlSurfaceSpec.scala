package graft

import org.apache.spark.sql.functions._

/** The SQL-text entry surface: QueryRegistry.sqlViews registers the
  * testdata tables + graft native functions, and SQL strings round-trip
  * to the same results (and the same plans) as the DataFrame programs. */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sqlViews registers every table; plain SQL matches the DataFrame twin") {
    QueryRegistry.sqlViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaDf = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("long").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.toSeq === viaDf.toSeq)
    assert(viaSql.nonEmpty)
  }

  test("graft aggregates are reachable from SQL text (bottom_k, tdigest, top_k, hll)") {
    QueryRegistry.sqlViews(spark, dir)
    // grouped top-k straight from a SQL string — the q145 shape
    val topk = spark.sql(
      """SELECT lang, inline(graft_bottom_k(n_chars, doc_id, 2, true))
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin).collect()
    assert(topk.length > 0)
    // same rows as the window formulation
    val viaWindow = spark.sql(
      """SELECT lang, n_chars AS k, doc_id AS v FROM (
        |  SELECT lang, n_chars, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) WHERE rk <= 2 ORDER BY lang, rk""".stripMargin).collect()
    assert(topk.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      viaWindow.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    // sketch aggregates parse, execute and bound sanely from SQL text
    val sk = spark.sql(
      """SELECT graft_tdigest(l_extendedprice, 0.5)[0] AS p50,
        |       graft_top_k(l_returnflag, 1)[0].value AS top_flag,
        |       graft_hll(CAST(conv(substr(md5(cast(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)) AS regs
        |FROM lineitem""".stripMargin).collect().head
    assert(sk.getDouble(0) > 0)
    assert(Set("A", "N", "R").contains(sk.getString(1)))
  }

  test("sketch aggregates widen int/string inputs at analysis instead of crashing executors") {
    QueryRegistry.sqlViews(spark, dir)
    // conv() returns STRING; before the ImplicitCastInputTypes fix this
    // threw ClassCastException deep inside the aggregate update
    val hll = spark.sql(
      """SELECT graft_hll(conv(substr(md5(cast(l_orderkey AS STRING)), 1, 15), 16, 10)) AS regs
        |FROM lineitem""".stripMargin).collect()
    assert(hll.length === 1)
    // int-typed measure widens to the double the t-digest expects
    val td = spark.sql(
      "SELECT graft_tdigest(l_linenumber, 0.5)[0] AS p50 FROM lineitem")
      .collect().head.getDouble(0)
    assert(td >= 1.0 && td <= 7.0, s"p50 of linenumber was $td")
  }

  test("graft_bloom builds the same registers from SQL text as from the DataFrame API") {
    QueryRegistry.sqlViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT graft_bloom(conv(substr(md5('t:' || cast(o_custkey AS STRING)), 1, 15), 16, 10),
        |                   1024, 3) AS regs
        |FROM orders""".stripMargin).collect().head.getSeq[Long](0)
    val viaDf = Tables.orders(spark, dir)
      .agg(call_function("graft_bloom",
        functions.GraftFunctions.hash60("t", col("o_custkey")), lit(1024), lit(3)))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaDf)
    assert(viaSql.exists(_ != 0L))
  }

  test("optimizer rewrites fire from SQL text exactly as from the DataFrame API") {
    QueryRegistry.sqlViews(spark, dir)
    // the HOF dot-product spelled as SQL must be rewritten to the native
    // codegen expression by RewriteDotProduct
    // the documented formulation: array<double> inputs, bare multiply
    // lambda, 0.0D seed — the shapes RewriteDotProduct strictly matches
    val q = spark.sql(
      """SELECT vec_id,
        |       aggregate(zip_with(transform(embedding, v -> CAST(v AS DOUBLE)),
        |                          transform(embedding, v -> CAST(v AS DOUBLE)),
        |                          (x, y) -> x * y),
        |                 0.0D, (acc, v) -> acc + v) AS dot
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_dot"), plan)
    q.collect().foreach(r => assert(r.getDouble(1) >= 0))
  }
}
