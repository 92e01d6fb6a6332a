package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hash60

/** Deterministic, coordinated sampling for corpus curation.
  *
  * Both operators derive randomness from the portable 60-bit md5 hash of a
  * seed + the row's id, never from an RNG: the sample is a pure function
  * of (seed, data), so it is reproducible across runs, engines, cluster
  * sizes and partitionings — the property that lets a 100 TB pipeline
  * re-derive exactly the same eval/holdout subset a year later, and lets
  * two independently-sampled tables be joined on their common ids
  * (bottom-k sketches compose: the k smallest hashes of A ∪ B are a
  * subset of the k smallest of A plus the k smallest of B).
  *
  * Restates the reference's implicit sampling needs (spot-check subsets of
  * the harvested corpus, `/root/reference/fetch_data.py:64-167`) as
  * explicit engine operators.
  */
object Sampling {

  /** Coordinated bottom-k sample: the k rows of each group whose
    * `hash(seed, id)` is smallest, ranked in hash order.
    *
    * Executed as ONE partial-aggregated shuffle via the native
    * `graft_bottom_k` TypedImperativeAggregate: each map task ships at
    * most k (hash, id) pairs per group, so shuffle volume is
    * O(groups x k) no matter how large the table — the row_number()
    * window formulation this replaces sorts EVERY row of every group.
    * Output: groupCols ++ (idCol, rk) with rk in 1..k by hash order.
    */
  def bottomK(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      seed: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(df.sparkSession)
    val h = hash60(seed, col(idCol))
    val picked = df
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_bottom_k", h, col(idCol), lit(k)).as("__bk"))
    picked
      .select(groupCols.map(col) :+ posexplode(col("__bk")).as(Seq("__pos", "__kv")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__kv.v").as(idCol),
        (col("__pos") + 1).cast("int").as("rk")): _*)
  }

  /** Deterministic weighted sample: global bottom-k over rows replicated
    * `weight` times (integer weights), hashing (seed, id, replica). A row
    * with weight w gets w lottery tickets, so inclusion probability is
    * ∝ w while staying a pure function of the seed. The explode is
    * scan-stage (no shuffle); the global top-k is a TakeOrdered — partial
    * top-k per partition, k rows to the driver — never a full sort.
    * Output: (idCol, replica, h) for the k winning tickets, ascending h.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int,
      seed: String): DataFrame = {
    val replicated = df
      .select(col(idCol), explode(sequence(lit(1), weightCol.cast("int"))).as("replica"))
    replicated
      .withColumn("h",
        hash60(concat(lit(seed + ":"), col(idCol).cast("string"),
          lit(":"), col("replica").cast("string"))))
      .orderBy("h", idCol, "replica")
      .limit(k)
  }
}
