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
  /** Size-guarded routing bound (the PageRank.runLocal posture): an edge
    * list inside the bound walks on the driver at zero per-round job
    * cost. Without it each round's frontier join RE-COMPUTES the
    * caller's (possibly expensive — q162's is a 4-table join) edge
    * derivation; the persistOnce below fixes that for the distributed
    * tier too. Local ≡ distributed pinned in LocalTierSpec. */
  private val LocalEdgeLimit = 4L << 20

  def hops(edges: DataFrame, src: Long, rounds: Int): DataFrame =
    hops(edges, src, rounds, LocalEdgeLimit)

  private[graft] def hops(edges: DataFrame, src: Long, rounds: Int,
      localEdgeLimit: Long): DataFrame = {
    val spark = edges.sparkSession
    // persistOnce BEFORE the rounds: each round's frontier join otherwise
    // recomputes the caller's edge derivation from scratch
    val e = graft.Q.persistOnce(edges.select(col("src"), col("dst")))
    val integral = Seq(edges.schema("src").dataType, edges.schema("dst").dataType)
      .forall(t => t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType ||
        t == org.apache.spark.sql.types.ShortType)
    if (integral && e.count() <= math.min(localEdgeLimit, LocalEdgeLimit)) {
      val arr = e.collect()
      if (!arr.exists(r => r.isNullAt(0) || r.isNullAt(1)))
        return runLocal(spark,
          arr.map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)),
          src, rounds)
    }
    var dist = graft.Q.persistOnce(spark.range(1)
      .select(lit(src).as("node"), lit(0).cast("int").as("hops")))
    var reachedCount = 1L
    var r = 1
    var drained = false
    while (r <= rounds && !drained) {
      val frontier = dist.filter(col("hops") === r - 1).select(col("node"))
      val reached = frontier.join(e, col("node") === col("src"))
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

  /** Driver tier: identical bounded-round min-hops on the collected edge
    * list (endpoints widened to long exactly like the union coercion). */
  private def runLocal(spark: org.apache.spark.sql.SparkSession,
      e: Array[(Long, Long)], src: Long, rounds: Int): DataFrame = {
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    e.foreach { case (s, d) => adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d }
    val hops = mutable.LinkedHashMap[Long, Int](src -> 0)
    var frontier = Array(src)
    var r = 1
    while (r <= rounds && frontier.nonEmpty) {
      val next = mutable.ArrayBuffer.empty[Long]
      frontier.foreach { v =>
        adj.get(v).foreach(_.foreach { d =>
          if (!hops.contains(d)) { hops(d) = r; next += d }
        })
      }
      frontier = next.toArray
      r += 1
    }
    spark.createDataFrame(
      hops.iterator.map { case (n, h) => org.apache.spark.sql.Row(n, h) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("hops",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
  }
}
