package graft

import org.apache.spark.sql.functions._

/** Pins the substrate the round-13 sum posture rests on: the per-term
  * guards (Dsir, jsCounts, entropyPerGroup, ndcgAtK, Bootstrap) prove
  * each PRODUCT fits int64 and rely on ANSI mode (Spark 4 default, no
  * surface overrides it) to make the downstream SUM loud rather than
  * silently wrapped. If a future config change turned ANSI off, sums
  * would wrap silently where the DuckDB oracle errors — the inverse of
  * the refuse-loudly contract — so this spec fails the build the moment
  * that substrate moves.
  */
class AnsiOverflowSpec extends SparkSpec {
  import spark.implicits._

  test("session default: ANSI on, long SUM overflow raises instead of wrapping") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "ANSI is off - every per-term-guarded sum in the engine would wrap silently")
    val big = Seq(Long.MaxValue / 2, Long.MaxValue / 2, 10L).toDF("x")
    val e = intercept[Exception] { big.agg(sum("x")).collect() }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("overflow"), s"unexpected failure mode: $msg")
  }

  test("aggregate() HOF long add overflow is equally loud (the ndcg DCG path)") {
    val df = Seq(Seq(Long.MaxValue / 2, Long.MaxValue / 2, 10L)).toDF("xs")
    val e = intercept[Exception] {
      df.select(aggregate(col("xs"), lit(0L), (a, x) => a + x)).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("overflow"), s"unexpected failure mode: $msg")
  }
}
