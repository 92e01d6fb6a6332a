package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev smoke: drives SparkEntry.entry the way the driver's t1 does. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY ROWS=" + df.count())
    spark.stop()
  }
}
