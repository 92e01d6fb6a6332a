package graft

import graft.ingest.AgriPipeline
import org.apache.spark.sql.functions._

/** DataSource V2 paged source (A1/A2/A12): parallel offset-range scan,
  * retry ladder on transient failures, end-to-end into the Layer-A
  * pipeline. */
class PagedSourceSpec extends SparkSpec {

  private def read(opts: (String, String)*) = {
    val r = spark.read.format("graft.sources.PagedSource")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("scans the full offset space across parallel partitions") {
    val df = read("max_offset" -> "5000", "page_size" -> "500", "num_partitions" -> "4")
    assert(df.count() === 5000)
    assert(df.rdd.getNumPartitions === 4)
    // deterministic generator: same read twice -> same content
    val a = df.agg(sum(expr("try_cast(Min_Price AS DOUBLE)"))).head().getDouble(0)
    val b = read("max_offset" -> "5000", "page_size" -> "500", "num_partitions" -> "4")
      .agg(sum(expr("try_cast(Min_Price AS DOUBLE)"))).head().getDouble(0)
    assert(a === b)
  }

  test("retry ladder recovers transiently-failing pages (A2)") {
    val flaky = read(
      "max_offset" -> "3000", "page_size" -> "300",
      "num_partitions" -> "2", "flaky_every" -> "2", "retries" -> "5")
    // every 2nd page fails on first attempt; retries recover all of them
    assert(flaky.count() === 3000)
  }

  test("exhausted retries skip the page but keep scanning (A12 semantics)") {
    val lossy = read(
      "max_offset" -> "3000", "page_size" -> "300",
      "num_partitions" -> "1", "flaky_every" -> "2", "retries" -> "1")
    // pages 0,2,4,6,8 (every 2nd of 10) are dropped after 1 attempt
    assert(lossy.count() === 1500)
  }

  test("column pruning pushes into the scan (only requested fields decoded)") {
    val df = read("max_offset" -> "2000", "page_size" -> "500", "num_partitions" -> "2")
      .select("Commodity", "Modal_Price")
    // the BatchScan itself must output exactly the 2 pruned columns
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) === Seq("Commodity", "Modal_Price"),
      s"scan not pruned: ${scan.output.map(_.name)}")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PrunedColumns: [Commodity, Modal_Price]"),
      s"pushdown not reported:\n$explained")
    assert(df.distinct().count() > 0)
  }

  test("limit pushes into the scan (readers stop fetching at the cap)") {
    val df = read("max_offset" -> "1000000", "page_size" -> "1000", "num_partitions" -> "4")
      .limit(7)
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedLimit: 7"), s"limit not pushed:\n$explained")
    // 1M-offset space, but only ~limit rows per partition are fetched —
    // this completes instantly instead of generating a million records
    assert(df.count() === 7)
  }

  test("feeds the Layer-A pipeline end-to-end (paged scan -> normalize)") {
    val raw = read("max_offset" -> "2000", "page_size" -> "250", "num_partitions" -> "4")
    val cleaned = AgriPipeline.dropInvalid(AgriPipeline.normalize(raw))
    // every 97th record has an empty Modal_Price -> dropped
    assert(cleaned.count() === 2000 - 21)
    val keys = cleaned.select("commodity_key").distinct().collect().map(_.getString(0)).toSet
    assert(keys.contains("paddydhancommon") && keys.contains("banana_-_green"))
    // day-first dates parsed
    assert(cleaned.filter(col("arrival_date").isNull).count() === 0)
  }
}
