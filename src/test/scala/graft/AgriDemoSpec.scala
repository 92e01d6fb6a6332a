package graft

import java.nio.file.Files

import graft.examples.AgriDemo
import org.apache.spark.sql.functions._

/** End-to-end migration demo: DSv2 harvest -> partitioned corpus ->
  * reference-user analytics. */
class AgriDemoSpec extends SparkSpec {

  test("harvest -> corpus -> analytics end to end") {
    val out = graft.Q.scratchDir("agri_demo")
    val corpus = AgriDemo.harvest(spark, 20000L, out)
    val landed = corpus.count()
    // every 97th record lacks a modal price; generator keys are unique
    assert(landed > 19000 && landed <= 20000, s"landed=$landed")

    // partitioned layout on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("commodity_key=")) === 6)

    val top = AgriDemo.topCommodities(corpus, 5).collect()
    assert(top.length === 5)
    assert(top.forall(_.getAs[Double]("avg_modal") > 0))

    val mov = AgriDemo.movingAvg(corpus)
      .filter(col("mov_avg_price").isNull).count()
    assert(mov === 0, "moving average produced nulls")

    val mom = AgriDemo.momDelta(corpus).collect()
    assert(mom.nonEmpty)
    // first month of each commodity has null delta, the rest are defined
    val (first, rest) = mom.partition(_.isNullAt(3))
    assert(first.length === mom.map(_.getString(0)).distinct.length)
    assert(rest.nonEmpty)
  }
}
