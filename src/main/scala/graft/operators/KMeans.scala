package graft.operators

import graft.functions.GraftFunctions._
import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over embedding columns — the coarse-quantizer trainer
  * for IVF ANN (SURVEY.md B43 scale path).
  *
  * Distribution shape per iteration: one broadcast pass assigns every
  * vector to its nearest centroid (k dot products per row, native
  * graft_dot), then one aggregation computes per-cell per-dimension sums
  * (posexplode -> groupBy(cell, dim)) and only the k x dims means are
  * collected — the driver never sees data rows, so the loop scales to
  * arbitrary corpus size with k*dims driver state.
  *
  * Deterministic: init picks the k lowest-id vectors, assignment breaks
  * distance ties on the lower cell id.
  */
object KMeans {

  /** Squared L2 distance of a vector column to a centroid literal. */
  private def sqDist(vec: Column, c: Array[Double]): Column = {
    val cCol = array(c.toIndexedSeq.map(lit): _*)
    // |v-c|^2 = |v|^2 - 2<v,c> + |c|^2; dot is the native expression
    call_function("graft_dot", vec, vec) -
      lit(2.0) * call_function("graft_dot", vec, cCol) +
      lit(c.map(x => x * x).sum)
  }

  /** Nearest-centroid struct (d, cell) — distance ties break on the
    * lower cell id via the struct ordering.
    */
  private def assignStruct(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(round(sqDist(vec, c), 9).as("d"), lit(i).as("cell"))
    }
    array_min(array(scored.toIndexedSeq: _*))
  }

  /** Cell assignment column for a fixed set of centroids. */
  def assignCell(vec: Column, centroids: Array[Array[Double]]): Column =
    assignStruct(vec, centroids).getField("cell")

  /** Init plan: the k lowest-id vectors via orderBy+limit — executes as
    * TakeOrderedAndProject (per-partition top-k, only k rows reach the
    * driver). A global row_number() window here would force the whole
    * corpus through one task; this shape survives a 100x scale-up.
    * Package-visible so the spec can assert the physical plan.
    */
  private[graft] def initPlan(v: DataFrame, k: Int): DataFrame =
    v.orderBy("__id").limit(k).select("__v")

  /** @param vectors (idCol, vecCol: array<double>)
    * @return (centroids, inertia per iteration)
    */
  def fit(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): (Array[Array[Double]], Seq[Double]) = {
    GraftExtensions.ensureRegistered(vectors.sparkSession)
    val v = vectors.select(col(idCol).as("__id"), col(vecCol).as("__v")).persist()
    val dims = v.select(size(col("__v"))).head().getInt(0)

    var centroids: Array[Array[Double]] = initPlan(v, k)
      .collect()
      .map(_.getSeq[Double](0).toArray)

    val inertias = (1 to iters).map { _ =>
      // ONE action per iteration: the nearest-centroid struct carries the
      // assigned distance alongside the cell, so the same (cell, dim)
      // aggregation yields both the new means and the inertia (each row
      // contributes its distance once per dim; reading the dim-0 groups
      // recovers the plain per-cell sum). k*dims rows reach the driver,
      // never data rows.
      val assigned = v
        .withColumn("__a", assignStruct(col("__v"), centroids))
        .select(
          col("__a").getField("cell").as("__cell"),
          col("__a").getField("d").as("__d"),
          col("__v"))
      val stats = assigned
        .select(col("__cell"), col("__d"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy(col("__cell"), col("__dim"))
        .agg(avg(col("__x")).as("__m"), sum(col("__d")).as("__di"))
        .collect()
      val inertia = stats.iterator
        .filter(_.getAs[Int]("__dim") == 0)
        .map(_.getAs[Double]("__di"))
        .sum
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        next(r.getAs[Int]("__cell"))(r.getAs[Int]("__dim")) = r.getAs[Double]("__m")
      }
      centroids = next
      inertia
    }
    v.unpersist()
    (centroids, inertias)
  }
}
