package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

import scala.util.Random

/** Native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  * equivalence with the union+window formulation and with brute force,
  * plus physical-plan shape. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(77)

  test("native as-of equals union+window formulation on random data") {
    val left = (1 to 800).map(i => (rnd.nextInt(25).toLong, rnd.nextInt(50000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 1200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(50000).toLong))
      .toDF("k", "t").withColumn("rv", col("t"))

    val viaWindow = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("rv"))
      .select(col("lid"), col("asof_rv").as("rv"))
    val native = AsOfJoin.asOfNative(
        left, right.select(col("k").as("rk"), col("t").as("rt"), col("rv")),
        Seq("k"), Seq("rk"), "t", "rt")
      .select(col("lid"), col("rv"))
    assert(native.count() === 800)
    assert(native.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(native).count() === 0)
  }

  test("unmatched left rows null-fill the right side") {
    val left = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 3L, "r1")).toDF("rk", "rt", "rv")
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("tag", "rv").as[(String, Option[String])].collect().toMap
    assert(out("a") === Some("r1"))
    assert(out("b") === None)
  }

  test("plans through AsOfJoinExec with one exchange+sort per side") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val df = AsOfJoin.asOfNative(p, v, Seq("user_id"), Seq("vu"), "ts", "vts")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the operator prints as
    // "AsOfJoin [keys]..."
    assert(plan.contains("AsOfJoin ["), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, s"exchanges:\n$plan")
    // and it computes the same result as the window formulation
    val viaWindow = AsOfJoin.asOf(
      p, ev.filter(col("event_type") === "view").select(col("user_id"), col("ts"), col("ts").as("view_ts")),
      Seq("user_id"), "ts", "ts", Seq("view_ts"))
      .select(col("event_id"), col("asof_view_ts").as("vts"))
    val native = df.select(col("event_id"), col("vts"))
    assert(native.exceptAll(viaWindow).count() === 0)
  }
}
