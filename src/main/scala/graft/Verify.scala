package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    graft.tools.HarnessLog.quietUnavoidableStreamingWarns()
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts encoding drifts between testdata regenerations; this
      // keeps the TIMESTAMP(NANOS) variant readable (as long) while
      // Tables.events adapts to whichever encoding is live.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // re-assert: setLogLevel resets the root level these loggers inherit
    graft.tools.HarnessLog.quietUnavoidableStreamingWarns()
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q145,q146 runs just those
    // (prefix match). Unset = everything — the driver's contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    // A failed query must surface as a RED row, never a missing one: r7's
    // 18-row regression shipped invisibly because failures were only
    // stderr lines and the driver omits absent outputs. On failure we
    // write a one-row sentinel (column "graft_verify_error") — its schema
    // can never match an oracle, so the driver's compare goes red with the
    // error text in the dump — plus an errors.json for humans.
    import spark.implicits._
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = e.getClass.getName + ": " + Option(e.getMessage).getOrElse("")
        failures(name) = msg.replaceAll("\\s+", " ").take(300)
        System.err.println(s"[verify] $name failed: $msg")
        try Seq(failures(name)).toDF("graft_verify_error")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failures.nonEmpty) {
      val errJson = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    }
    // Loud invariant: every registered query produced an output directory.
    val written = selected.keys.count(n => new java.io.File(s"$outDir/$n").exists())
    if (written != selected.size)
      System.err.println(s"[verify] INVARIANT VIOLATED: wrote $written of ${selected.size} outputs")
    System.err.println(s"[verify] ${selected.size} queries, ${failures.size} failed")
    spark.stop()
    // Query failures are NOT an exit-1: they already surface as red rows
    // via the sentinels, and a nonzero rc could make the driver discard
    // the whole correctness file. Only a broken sentinel path (an output
    // genuinely missing) is irrecoverably silent — that exits 1.
    if (written != selected.size) sys.exit(1)
  }
}
