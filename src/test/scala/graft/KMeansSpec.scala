package graft

import graft.functions.GraftFunctions._
import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Lloyd's k-means coarse quantizer: inertia monotonicity, determinism,
  * and clustering quality on the labeled embeddings. */
class KMeansSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))

  test("inertia is non-increasing across iterations") {
    val (_, inertias) = KMeans.fit(vecs, "vec_id", "v", k = 8, iters = 4)
    assert(inertias.size === 4)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9), s"inertia rose: $inertias")
    }
  }

  test("fit is deterministic (same data, same seed rows -> same centroids)") {
    val (c1, _) = KMeans.fit(vecs, "vec_id", "v", k = 4, iters = 2)
    val (c2, _) = KMeans.fit(vecs, "vec_id", "v", k = 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  test("init is a TakeOrderedAndProject, not a single-partition window/sort") {
    val v = vecs.select(col("vec_id").as("__id"), col("v").as("__v"))
    val plan = KMeans.initPlan(v, 8).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"init must not use a window:\n$plan")
    // no global Sort of the full input either (TakeOrdered subsumes it)
    assert(!plan.contains("Sort "), s"init must not globally sort:\n$plan")
  }

  test("refined centroids beat the unrefined init as IVF cells") {
    val (refined, inertias) = KMeans.fit(vecs, "vec_id", "v", k = 8, iters = 5)
    // final inertia must be meaningfully below the first-assignment inertia
    assert(inertias.last < inertias.head * 0.9,
      s"k-means barely improved: $inertias")
    // cells are non-degenerate: every centroid owns some vectors
    val counts = vecs.withColumn("cell", KMeans.assignCell(col("v"), refined))
      .groupBy("cell").count().collect()
    assert(counts.length >= 6, s"degenerate cells: ${counts.mkString(",")}")
  }
}
