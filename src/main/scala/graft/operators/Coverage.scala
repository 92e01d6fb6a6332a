package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy coverage-maximizing selection (the classic (1 − 1/e) greedy
  * set-cover heuristic) over an `(id, elem)` membership frame: `rounds`
  * times, pick the item whose element set covers the most STILL-UNCOVERED
  * elements (ties break to the smallest id — deterministic, replayable),
  * then mark its elements covered. This is the data-selection primitive
  * behind "pick the K documents that maximize n-gram/skill coverage" —
  * the subset-selection step a training-data pipeline runs after dedup:
  * near-dups are gone, but the corpus is still redundant, and marginal
  * COVERAGE (not raw quality score) is what a K-document budget should
  * buy. Facility-location greedy over a coverage function is the standard
  * published formulation (submodular maximization; Nemhauser et al. 1978
  * gives the (1 − 1/e) bound).
  *
  * Scale shape per round: one partial-agg'd count by id over the
  * remaining pairs, a top-1 TakeOrdered (never a global sort), and one
  * anti-join that removes the newly-covered elements — the frame
  * shrinks-or-holds monotonically, persistOnce keeps lineage flat
  * (the KCore.peel posture). The per-round driver touchpoint is a
  * SINGLE row (the argmax), same bounded-collect posture as
  * PageRank/BPE's driver tiers. Rounds are FIXED (caller-chosen K), so
  * run time never becomes data-dependent.
  *
  * Returns `(round, id, gain, covered_total)` — one row per pick, fewer
  * than `rounds` rows iff coverage is exhausted early.
  */
object Coverage {
  def greedySelect(pairs: DataFrame, idCol: String, elemCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"Coverage.greedySelect wants 1..64 rounds, got $rounds")
    val spark = pairs.sparkSession
    val idType = pairs.schema(idCol).dataType
    var uncovered = graft.Q.persistOnce(
      pairs.select(col(idCol).as("id"), col(elemCol).as("elem")).distinct())
    val picks = scala.collection.mutable.ArrayBuffer.empty[Row]
    var total = 0L
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      // top-1 argmax: plans as TakeOrderedAndProject over the aggregated
      // per-id counts — one bounded row crosses to the driver
      val top = uncovered.groupBy("id").agg(count(lit(1)).as("g"))
        .orderBy(col("g").desc, col("id")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val id = top.head.get(0)
        val g = top.head.getLong(1)
        total += g
        picks += Row(r.toLong, id, g, total)
        val covered = uncovered.filter(col("id") === lit(id)).select("elem")
        uncovered = graft.Q.persistOnce(
          uncovered.join(covered, Seq("elem"), "left_anti"))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(picks.toSeq, 1),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("id", idType),
        StructField("gain", LongType, nullable = false),
        StructField("covered_total", LongType, nullable = false))))
  }
}
