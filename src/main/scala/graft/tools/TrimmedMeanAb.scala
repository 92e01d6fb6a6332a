package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RobustStats

/** A/B the two trimmed-mean tiers IN ISOLATION at each scale — the
  * routed operator (`RobustStats.trimmedMean`) picks exact-rank-trim vs
  * t-digest-threshold-trim by max group size, and that threshold should
  * come from a measurement, not faith. q149's bench exponent can't
  * answer this: the query runs BOTH tiers (the exact anchor rides along
  * for the tolerance contract), so its cost conflates them.
  *
  * Times each tier on lineitem grouped by l_returnflag (3 groups — the
  * worst case for the exact tier, whose window sort funnels each group
  * into one task) at every dir passed. Emits one JSON line for the
  * BENCH_scale.json notes.
  *
  * Usage: runMain graft.tools.TrimmedMeanAb <dir1> <dir2> ...
  */
object TrimmedMeanAb {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li(dir: String) = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"),
        col("l_orderkey"), col("l_linenumber"))

    def timeIt(f: () => Long): (Double, Long) = {
      f() // warmup
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val body = dirs.map { dir =>
      val rows = li(dir).count()
      val (tExact, _) = timeIt(() =>
        RobustStats.trimmedMeanExact(li(dir), Seq("l_returnflag"), "q", 0.05).count())
      val (tApprox, _) = timeIt(() =>
        RobustStats.trimmedMeanApprox(li(dir), Seq("l_returnflag"), "q", 0.05).count())
      System.err.println(s"[ab] $dir rows=$rows exact=${r3(tExact)}s approx=${r3(tApprox)}s")
      s""""$dir":{"rows":$rows,"exact_s":${r3(tExact)},"approx_s":${r3(tApprox)}}"""
    }.mkString(",")
    println(s"""{"metric":"trimmed_mean_ab","group":"l_returnflag (3 groups)","trim":0.05,"dirs":{$body}}""")
    spark.stop()
  }
}
