package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salting must be invisible in results and
  * visible in the shuffle key. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a tail
  private def fact = spark.range(0, 20000)
    .select(
      when(col("id") < 18000, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("rowid"),
      (col("id") % 1000).cast("double").as("x"))
  private def dim = (0L until 50L).toDF("dk").withColumn("dv", col("dk") * 100)

  test("saltedEquiJoin equals the plain join, row for row") {
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("rowid", "dv").as[(Long, Long)].collect().sorted
    val salted = Skew.saltedEquiJoin(fact, dim, Seq("k"), Seq("dk"),
        buckets = 8, entropyCols = Seq(col("rowid")))
      .select("rowid", "dv").as[(Long, Long)].collect().sorted
    assert(salted === plain)
  }

  test("salted join shuffles on (key, salt), spreading the hot key") {
    val salted = Skew.saltedEquiJoin(fact, dim, Seq("k"), Seq("dk"),
      buckets = 8, entropyCols = Seq(col("rowid")))
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt not in the shuffle key:\n$plan")
    // the hot key's rows really do carry multiple salt values
    val spread = Skew.addSalt(fact.filter(col("k") === 7), 8, Seq(col("rowid")))
      .select("__salt").distinct().count()
    assert(spread === 8, s"hot key only spread over $spread buckets")
  }

  test("twoPhaseAgg equals the plain aggregation") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sum_x"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val salted = Skew.twoPhaseAgg(fact, Seq("k"), 16, Seq(col("rowid")))(
      Seq(count(lit(1)).as("pc"), sum(col("x")).as("px")),
      Seq(sum(col("pc")).as("cnt"), sum(col("px")).as("sum_x")))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(salted === plain)
  }
}
