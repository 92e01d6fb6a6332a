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
  * most graphs a handful of rounds reaches the fixpoint; the output's
  * `converged` column says whether THIS run did: a peel round is a
  * no-op exactly when every surviving node already has degree >= k, so
  * converged = (min surviving degree >= k) — one extra aggregate over
  * the final degrees, no extra peel. converged=true means the result IS
  * the true k-core; false means re-run with more rounds.
  *
  * Scale shape per round: one partial-agg'd degree count plus two
  * semi-joins on the node key — all key-equi, no windows; the edge frame
  * shrinks-or-holds monotonically. Per-round state is cut with EAGER
  * localCheckpoint (the LabelProp/ConnectedComponents contract): the
  * round's frame has two consumers (the degree aggregate and the next
  * round's semi-joins), and unlike persistOnce nothing accumulates in
  * the shared-session CacheManager across rounds — superseded round
  * frames become unreachable and their blocks are GC-swept, instead of
  * pinning up to 16 cached frames for the session's lifetime.
  *
  * Returns the surviving per-node degree plus the fixpoint witness
  * `(node, deg, converged)` (empty graph => empty output).
  */
object KCore {
  def peel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"KCore.peel wants 1..16 rounds, got $rounds")
    require(k >= 1L, s"KCore.peel wants k >= 1, got $k")
    var sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy("src").agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select(col("src").as("node"))
        .localCheckpoint(true)
      sym = sym.join(keep, sym("src") === keep("node"), "left_semi")
        .join(keep, sym("dst") === keep("node"), "left_semi")
        .localCheckpoint(true)
    }
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val conv = deg.agg(coalesce(min("deg") >= k, lit(true)).as("converged"))
    deg.crossJoin(broadcast(conv))
  }
}
