package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peel over an undirected edge list `(a, b)`:
  * symmetrize, then `rounds` times drop every node whose CURRENT degree
  * is below `k` together with its incident edges. The round count is
  * FIXED, not run-to-convergence: the output stays a deterministic,
  * replayable function of the input (the DuckDB oracle replays the same
  * rounds as nested CTEs), and run time never becomes data-dependent —
  * the same posture as PageRank/LabelProp's fixed iteration counts. On
  * most graphs a handful of rounds reaches the fixpoint; callers that
  * need certainty compare round r with r+1.
  *
  * Scale shape per round: one partial-agg'd degree count plus two
  * semi-joins on the node key — all key-equi, no windows; the edge frame
  * shrinks-or-holds monotonically. persistOnce between rounds keeps the
  * lineage flat and reuses the shrunken frame for both semi-join probes.
  *
  * Returns the surviving per-node degree `(node, deg)`.
  */
object KCore {
  def peel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"KCore.peel wants 1..16 rounds, got $rounds")
    require(k >= 1L, s"KCore.peel wants k >= 1, got $k")
    var sym = graft.Q.persistOnce(
      edges.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(edges.select(col("b").as("src"), col("a").as("dst"))))
    for (_ <- 1 to rounds) {
      val keep = graft.Q.persistOnce(
        sym.groupBy("src").agg(count(lit(1)).as("c"))
          .filter(col("c") >= k).select(col("src").as("node")))
      sym = graft.Q.persistOnce(
        sym.join(keep, sym("src") === keep("node"), "left_semi")
          .join(keep, sym("dst") === keep("node"), "left_semi"))
    }
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
