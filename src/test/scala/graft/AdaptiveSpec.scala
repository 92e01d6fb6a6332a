package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE at work — the runtime re-plan layer that complements the manual
  * skew fallbacks (salted agg q28, salted replication join q36): on a
  * real cluster `spark.sql.adaptive.skewJoin` splits a hot partition into
  * sub-tasks at shuffle-read time with no query rewrite. This spec pins
  * that the feature actually engages on a skewed join, so the claim
  * "AQE handles moderate skew; salting is for the pathological tail"
  * in SURVEY.md stays tested rather than hoped-for.
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew-join splits the hot partition at shuffle-read time") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so the test-sized skew (one key with 100k rows
      // vs 100 rows for every other key) is detected
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // forbid broadcast so the join stays a shuffle join AQE must heal
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {

      val left = spark.range(0, 110000)
        .select(when(col("id") < 100000, 0L).otherwise(col("id") % 100).as("k"),
          concat(lit("payload_padding_padding_padding_"), col("id")).as("v"))
      val right = (0L until 100L).toDF("k").withColumn("rv", col("k") * 10)
      // assert on the bare join: a keyed aggregate on top would make AQE
      // skip the skew split (splitting breaks the agg's co-partitioning)
      val joined = left.join(right, "k")
      val rows = joined.collect()
      // correctness: hot key kept all its rows (ids 0..99999 plus the
      // 100 ids >= 100000 that are ≡ 0 mod 100), every key matched
      assert(rows.length === 100100 + 99 * 100)
      assert(rows.count(_.getLong(0) == 0L) === 100100)

      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("plan did not go through AQE"))
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    }
  }

  test("AQE coalesces the many tiny post-shuffle partitions of a small agg") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "200") {
      val df = spark.range(0, 1000).groupBy(col("id") % 7).count()
      assert(df.count() === 7)
      // 200 configured shuffle partitions collapse to a handful of reads
      assert(df.rdd.getNumPartitions < 20,
        s"AQE did not coalesce: ${df.rdd.getNumPartitions} partitions")
    }
  }
}
