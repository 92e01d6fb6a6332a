package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round frontier BFS: minimum hop counts from a source node
  * over a directed edge table — the reachability/distance primitive next
  * to [[PageRank]] (authority) and [[ConnectedComponents]] (clustering).
  *
  * Each round expands only the FRONTIER (nodes first reached last
  * round) through one keyed equi-join, then folds new reachings into
  * the distance table with a min-aggregate — the classic iterative BFS
  * a Pregel engine runs, expressed as two shuffles per round on the
  * node key. Rounds = O(graph diameter), each touching |frontier ⋈
  * edges| rows, never all pairs; the distance table is persisted and
  * swapped per round so lineage stays flat. Like q137's PageRank, hop
  * counts are exact integers, so a SQL oracle can unroll the identical
  * rounds as CTEs and match row-for-row.
  */
object Bfs {

  /** Min-hops from `src` within `rounds` rounds. `edges` must have
    * (src, dst) columns; returns (node, hops) for every node reached.
    * Unreached nodes are absent (hops would be +inf).
    *
    * Early exit: a round that adds no new node leaves every later
    * frontier empty (a node first reached in round i has hops = i, so
    * an unchanged distance table means no node carries hops = r and the
    * next frontier filter matches nothing) — the loop stops there
    * instead of running `rounds` empty joins. The materializing
    * `count()` each round already exists for the persist swap, so the
    * exit test is free; on graphs whose diameter from `src` is below
    * `rounds` the fixed-round and early-exit results are identical
    * (pinned in GraphSpec). */
  def hops(edges: DataFrame, src: Long, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    // persistOnce, not persist: the returned frame stays cached for its
    // consumer, so a re-run of the same deterministic query (Bench's
    // min-of-2, Verify after tests) rebuilds the identical final-round
    // plan — re-persisting it would WARN and waste the cached copy.
    var dist = graft.Q.persistOnce(spark.range(1)
      .select(lit(src).as("node"), lit(0).cast("int").as("hops")))
    var reachedCount = 1L
    var r = 1
    var drained = false
    while (r <= rounds && !drained) {
      val frontier = dist.filter(col("hops") === r - 1).select(col("node"))
      val reached = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), lit(r).cast("int").as("hops"))
      val next = graft.Q.persistOnce(dist.union(reached)
        .groupBy("node").agg(min(col("hops")).as("hops")))
      val n = next.count() // materialize before dropping the previous round
      dist.unpersist()
      dist = next
      drained = n == reachedCount
      reachedCount = n
      r += 1
    }
    dist
  }
}
