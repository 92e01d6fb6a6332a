package graft.tools

import org.apache.spark.sql.SparkSession

import graft.QueryRegistry

/** Plan inspection for any registry query:
  * `sbt "runMain graft.tools.Explain q147_weighted_subset_es /root/testdata/sf0.01"`
  * prints the formatted physical plan (the .explain("formatted") the
  * scale review reads: shuffle count, pushed filters, codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QueryRegistry.byName(name).run(spark, dir).explain("formatted")
    spark.stop()
  }
}
