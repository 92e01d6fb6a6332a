package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: prints a registered query's executed plan
  * (the same text PlanQualitySpec pins against) without running a test
  * cycle. `runMain graft.tools.PlanPeek <query> <sfDir>`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qe = graft.QueryRegistry.byName(name).run(spark, sfDir).queryExecution
    println("==== FORMATTED ====")
    println(qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println("==== EXECUTED ====")
    println(qe.executedPlan.toString)
    spark.stop()
  }
}
