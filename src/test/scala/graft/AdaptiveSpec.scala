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

  test("runtime bloom-filter injection semi-reduces the fact side of a selective join") {
    // The third runtime-filtering tier next to static partition pruning
    // (q76) and DPP: a selective filter on the dim side materializes a
    // bloom filter that pre-filters the fact scan BEFORE the join
    // shuffle — at 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the matching sliver. Thresholds are
    // lowered to test scale; the assertion is that Spark's
    // InjectRuntimeFilter actually plants BloomFilterMightContain on the
    // fact side of this plan shape.
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val dir = "/root/testdata/sf0.001"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("BloomFilter"),
        s"runtime bloom filter not injected:\n$optimized")
      assert(q.collect().nonEmpty)
    }
  }

  test("dynamic partition pruning subsets the fact scan from the dim filter") {
    // DPP proper: the fact table is PARTITIONED on the join key, the dim
    // side carries a selective filter, and the fact scan's partition list
    // is decided at runtime from the dim rows — the directory-level
    // counterpart of the bloom test above.
    val tmp = new java.io.File(graft.Q.scratchDir("dpp"))
    try {
      (0 until 2000).map(i => (i % 20, i.toLong))
        .toDF("pk", "v")
        .write.partitionBy("pk").mode("overwrite")
        .parquet(s"${tmp.getAbsolutePath}/fact")
      (0 until 20).map(i => (i, if (i < 2) "keep" else "drop"))
        .toDF("dk", "tag")
        .write.mode("overwrite").parquet(s"${tmp.getAbsolutePath}/dim")
      val fact = spark.read.parquet(s"${tmp.getAbsolutePath}/fact")
      // the dim must be a real scan: a LocalRelation filter constant-folds
      // away before the DPP rule looks for a selective predicate
      val dim = spark.read.parquet(s"${tmp.getAbsolutePath}/dim")
      val q = fact.join(dim, col("pk") === col("dk"))
        .filter(col("tag") === "keep")
        .groupBy("pk").count()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in:\n$plan")
      assert(q.collect().map(_.getInt(0)).toSet === Set(0, 1))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
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
