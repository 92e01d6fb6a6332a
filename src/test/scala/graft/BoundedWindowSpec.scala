package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.BoundedWindow

/** The mechanical guard for global windows: the aggregate precondition,
  * result-equivalence with the bare `Window.orderBy`, and the non-empty
  * partition spec that keeps WindowExec's single-partition warning out of
  * logs for inputs proven bounded. */
class BoundedWindowSpec extends SparkSpec {
  import spark.implicits._

  private def daily = (1 to 500).map(i => (i % 37, i.toDouble))
    .toDF("k", "v").groupBy("k").agg(sum("v").as("s"))

  test("orderBy spec computes exactly what the bare global window computes") {
    val bare = daily.withColumn("c", sum("s").over(Window.orderBy("k")))
      .withColumn("r", row_number().over(Window.orderBy("k")))
      .withColumn("l", lag("s", 1).over(Window.orderBy("k")))
    val guarded = BoundedWindow.aggregated(daily, "test series")
      .withColumn("c", sum("s").over(BoundedWindow.orderBy(col("k"))))
      .withColumn("r", row_number().over(BoundedWindow.orderBy(col("k"))))
      .withColumn("l", lag("s", 1).over(BoundedWindow.orderBy(col("k"))))
    assert(bare.orderBy("k").collect().toSeq == guarded.orderBy("k").collect().toSeq)
  }

  test("a frame with sliding rows/range frames is frame-for-frame identical") {
    val bare = daily.withColumn("m",
      sum("s").over(Window.orderBy("k").rowsBetween(-3, 0)))
    val guarded = daily.withColumn("m",
      sum("s").over(BoundedWindow.orderBy(col("k")).rowsBetween(-3, 0)))
    assert(bare.orderBy("k").collect().toSeq == guarded.orderBy("k").collect().toSeq)
  }

  test("aggregated() accepts post-aggregate frames through projections/filters") {
    BoundedWindow.aggregated(daily, "plain agg")
    BoundedWindow.aggregated(daily.withColumn("d", col("s") * 2), "project over agg")
    BoundedWindow.aggregated(daily.filter(col("k") > 3), "filter over agg")
    BoundedWindow.aggregated(
      (1 to 50).toDF("x").distinct(), "distinct is an aggregation boundary")
  }

  test("aggregated() rejects raw rows — the scale bug it exists to catch") {
    val raw = (1 to 100).toDF("x")
    val e = intercept[IllegalArgumentException] {
      BoundedWindow.aggregated(raw, "raw rows")
    }
    assert(e.getMessage.contains("raw rows"))
    // a join above an aggregate re-opens cardinality — also rejected
    val joined = daily.join((1 to 10).toDF("k"), "k")
    intercept[IllegalArgumentException] {
      BoundedWindow.aggregated(joined, "join over agg")
    }
  }

  test("the guarded spec carries a non-empty partition spec (no WindowExec warning)") {
    val plan = daily
      .withColumn("c", sum("s").over(BoundedWindow.orderBy(col("k"))))
      .queryExecution.optimizedPlan
    val w = plan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(w.isDefined, s"no Window node found:\n$plan")
    assert(w.get.partitionSpec.nonEmpty,
      s"partition spec emptied by the optimizer — warning would fire:\n$plan")
  }
}
