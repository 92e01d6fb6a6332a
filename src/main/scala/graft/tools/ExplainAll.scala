package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.QueryRegistry

/** Batch plan dump for the optimization-round evidence files:
  * `sbt "runMain graft.tools.ExplainAll plans/r15 _before q239_hits q179_label_prop ..."`
  * writes each query's .explain("formatted") to <dir>/<name><suffix>.txt
  * in ONE session (tools.Explain pays a JVM per query — fine for one
  * plan, not for thirty).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainAll <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val txt =
        try QueryRegistry.byName(name).run(spark, dir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.write(outDir.resolve(s"$name$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[explainall] wrote $name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
