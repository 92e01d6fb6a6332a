package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous Louvain-style community DETECTION (Blondel,
  * Guillaume, Lambiotte & Lefebvre 2008's local-move phase, in the
  * deterministic synchronous form distributed implementations use) —
  * the producer the graph wing's modularity SCORER (B124, q230) was
  * missing: q230 can grade any partition, but the repo could only
  * produce one by connected components or seeded label propagation.
  * This closes the detect-then-score arc: communities(...) emits a
  * partition, q230's algebra grades it.
  *
  * Semantics per round r (1-based), all reads against the PREVIOUS
  * round's assignment (synchronous — what makes a SQL oracle replay
  * the rounds as CTEs):
  *
  *  - every node i scores each CANDIDATE community C ∈ {communities of
  *    i's neighbors} ∪ {i's own community} with the exact
  *    integer-scaled Louvain gain
  *
  *      gain(C) = 2m·w(i→C) − k_i·(Σtot(C) − k_i·1[C = com(i)])
  *
  *    where w(i→C) = #edges from i into C's members, k_i = deg(i),
  *    Σtot(C) = Σ degrees of C's members, m = |edges| — this is
  *    2m²·(ΔQ of joining C after leaving com(i)), so the argmax over C
  *    (own community included, with i's own degree removed from its
  *    Σtot — the standard remove-then-rejoin bookkeeping) is exactly
  *    the best local move, compared in pure int64;
  *  - ties break to the SMALLEST community id (argmax via one
  *    max(struct(gain, -com)) hash aggregate — the LabelProp idiom, no
  *    window sort);
  *  - the move APPLIES only if it is "progressive" for the round: odd
  *    rounds may only LOWER the community id (picked < own), even
  *    rounds only RAISE it; otherwise the node keeps its assignment.
  *    Synchronous local-move is known to limit-cycle when two nodes
  *    swap into each other's communities simultaneously (a fixed
  *    movable-half gate was measured doing exactly that on the
  *    two-clique spec graph — a period-2 cycle between same-parity
  *    nodes); a swap needs one id-lowering and one id-raising move, so
  *    alternating the permitted direction makes within-round swap
  *    cycles impossible by construction. This is the deterministic
  *    "progressive minimum/maximum label" damping of published
  *    distributed Louvain implementations, replayable where "process
  *    nodes in random order" is not.
  *
  * Scale shape: per round ONE (node, com) vote count off the
  * symmetrized edge list (partial-agg'd, bounded by the distinct
  * neighbor-community count per node), one |communities|-row Σtot
  * aggregate, one argmax aggregate and one state join — the
  * LabelProp/KCore posture. State is one row per node, lineage cut per
  * round via eager localCheckpoint; m rides a 1-row broadcast. No
  * driver-side state, no all-pairs anything.
  *
  * Integer domain, guarded in-plan (the q230 bounds): m ≤ 2^30 keeps
  * 2m·w ≤ 2^62 (w ≤ k_i ≤ 2m) and k_i·Σtot ≤ 2^62 (both factors ≤ 2m ≤
  * 2^31). Beyond that the gain refuses loudly — rescale by sharding
  * the graph, never a silent wrap.
  *
  * Input contract: `edges` are distinct undirected pairs (a, b) with
  * a ≠ b (canonical a < b welcome but not required); weights are 1.
  * Output: (node, com) for every endpoint, com = the community id
  * (always some node's id). rounds = 0 returns the singleton
  * initialization.
  */
object Louvain {

  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 16,
      s"Louvain wants a fixed round count in [0, 16], got $rounds")
    val e = graft.Q.persistOnce(
      edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b")))
    val m = e.agg(
      Guards(count(lit(1)) <= lit(1L << 30), count(lit(1)),
        "[louvain] edge count exceeds 2^30: the 2m-scaled gain would " +
          "overflow int64 - shard the graph").as("m"))
    val sym = graft.Q.persistOnce(e.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst")))
    val deg = graft.Q.persistOnce(
      sym.groupBy(col("dst").as("node")).agg(count(lit(1)).as("k")))

    var state = deg.select(col("node"), col("node").as("com"))
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      // neighbor-community vote weights w(i -> C), from the PREVIOUS state
      val votes = sym
        .join(state.select(col("node").as("src"), col("com")), "src")
        .groupBy(col("dst").as("node"), col("com"))
        .agg(count(lit(1)).as("w"))
      // the own community is always a candidate, at its true w (or 0)
      val cands = votes
        .unionByName(state.select(col("node"), col("com"), lit(0L).as("w")))
        .groupBy("node", "com").agg(max("w").as("w"))
      val sigma = state.join(deg, "node")
        .groupBy("com").agg(sum("k").as("s_tot"))
      val gains = cands
        .join(deg, "node")
        .join(state.select(col("node"), col("com").as("own")), "node")
        .join(sigma, "com")
        .crossJoin(broadcast(m))
        .select(col("node"), col("com"), col("own"),
          Guards(
            col("w") <= expr("9223372036854775807L div (2 * m)") &&
              col("s_tot") <= expr("9223372036854775807L div k"),
            lit(2L) * col("m") * col("w") -
              col("k") * (col("s_tot") -
                when(col("com") === col("own"), col("k")).otherwise(lit(0L))),
            Guards.msg("louvain",
              lit("gain term 2m*w / k*s_tot would overflow int64 (m="),
              col("m").cast("string"), lit(", w="), col("w").cast("string"),
              lit(", k="), col("k").cast("string"), lit(", s_tot="),
              col("s_tot").cast("string"),
              lit(") - shard the graph"))).as("gain"))
      // argmax by (gain desc, com asc) — one hash aggregate, no window
      val pick = gains
        .groupBy("node")
        .agg(max(struct(col("gain"), (-col("com")).as("neg"))).as("mx"),
          first(col("own"), ignoreNulls = true).as("own"))
        .select(col("node"), (-col("mx.neg")).as("picked"), col("own"))
      val progressive =
        if (r % 2 == 1) col("picked") < col("own") else col("picked") > col("own")
      state = pick
        .select(col("node"),
          when(progressive, col("picked")).otherwise(col("own")).as("com"))
        .localCheckpoint(true)
    }
    state.select(col("node"), col("com"))
  }
}
