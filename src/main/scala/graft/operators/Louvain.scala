package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Louvain community detection (Blondel, Guillaume, Lambiotte &
  * Lefebvre 2008) in the deterministic synchronous form distributed
  * implementations use — the producer the graph wing's modularity
  * SCORER (B124, q230) was missing. r14 shipped the local-move phase
  * only; r15 completes the algorithm: a converged witness, early exit
  * on a settled state, and the phase-2 COMMUNITY CONTRACTION that makes
  * it Louvain rather than one local-move sweep.
  *
  * == Local-move semantics (one level) ==
  *
  * Per round r (1-based), all reads against the PREVIOUS round's
  * assignment (synchronous — what makes a SQL oracle replay the rounds
  * as CTEs), on a WEIGHTED graph (w ≥ 1; self-loops allowed — they
  * arise from contraction and enter degrees at weight 2w, never votes):
  *
  *  - every node i scores each CANDIDATE community C ∈ {communities of
  *    i's neighbors} ∪ {i's own community} with the exact
  *    integer-scaled Louvain gain
  *
  *      gain(C) = 2m·w(i→C) − k_i·(Σtot(C) − k_i·1[C = com(i)])
  *
  *    where w(i→C) = Σ weight of edges from i into C's members,
  *    k_i = weighted degree (self-loops counting twice), Σtot(C) = Σ
  *    degrees of C's members, m = total edge weight — this is
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
  * == Convergence & early exit (r15) ==
  *
  * A round is MOVELESS when no node changed assignment. One moveless
  * round is NOT a fixed point (the round only permitted one move
  * direction; the next round permits the other), so the level declares
  * convergence — and exits early — after TWO CONSECUTIVE moveless
  * rounds: that state is a fixed point for both directions, every
  * further round is the identity, and a fixed-round CTE oracle of any
  * longer unroll reproduces the early-exited state verbatim. The
  * moveless test is one cheap job over the round's already-checkpointed
  * state (the SSSP drained-frontier posture); dead rounds cost nothing.
  *
  * == Phase 2: contraction ([[communitiesMultiLevel]]) ==
  *
  * After a level's local moves settle, communities collapse onto
  * super-nodes (id = the community id): for each edge (a, b, w) the
  * contracted edge is (com(a), com(b), w) canonicalized least/greatest
  * and weight-summed — intra-community weight becomes a SELF-LOOP,
  * which the next level's degrees count twice (the standard A'_{CD} =
  * Σ_{i∈C,j∈D} A_ij bookkeeping), so modularity on the contracted graph
  * equals modularity of the induced partition on the original graph and
  * total weight m is invariant across levels. Local moves then re-run
  * on the contracted graph: the step that merges whole communities a
  * single node move could never justify.
  *
  * Scale shape: per round ONE (node, com) vote sum off the symmetrized
  * edge list (partial-agg'd, bounded by the distinct neighbor-community
  * count per node), one |communities|-row Σtot aggregate, one argmax
  * aggregate, one state join and one moveless probe — the
  * LabelProp/KCore posture. State is one row per node, lineage cut per
  * round via eager localCheckpoint; m rides a 1-row broadcast.
  * Contraction is one join + one grouped sum; each level's graph is no
  * larger than the last. No driver-side state, no all-pairs anything.
  *
  * Integer domain, guarded in-plan (the q230 bounds): m ≤ 2^30 keeps
  * 2m·w ≤ 2^62 (w ≤ k_i ≤ 2m) and k_i·Σtot ≤ 2^62 (both factors ≤ 2m ≤
  * 2^31), at every level (m is contraction-invariant). Beyond that the
  * gain refuses loudly — rescale by sharding the graph, never a silent
  * wrap.
  *
  * Input contract (ENFORCED in-plan, r15): `edges` are distinct
  * undirected pairs (a, b) with a ≠ b — a self-loop refuses on the
  * consumed edge column, a duplicate pair refuses through the
  * distinctness audit riding the weight column (one countDistinct
  * aggregate against the raw count; a duplicate would silently skew m,
  * every degree and every gain). Weights are 1 at level 1.
  * Output: (node, com) for every endpoint ([[communities]]) or
  * (node, com, converged) ([[communitiesMultiLevel]]); com is always
  * some node's id. rounds = 0 returns the singleton initialization.
  */
object Louvain {

  /** Phase-1 local moves only, at most `rounds` of them (exits early on
    * a settled state — observationally identical to the full unroll). */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 16,
      s"Louvain wants a fixed round count in [0, 16], got $rounds")
    localMoves(intake(edges), rounds)._1
  }

  /** Full Louvain: up to `levels` rounds of (local moves to
    * convergence-or-budget, then community contraction). Returns one
    * row per ORIGINAL node: (node, com, converged) where com is the
    * final super-community and converged says every level's local
    * moves reached a two-direction fixed point within its budget. */
  def communitiesMultiLevel(
      edges: DataFrame, maxRoundsPerLevel: Int, levels: Int = 2): DataFrame = {
    require(maxRoundsPerLevel >= 1 && maxRoundsPerLevel <= 16,
      s"Louvain wants maxRoundsPerLevel in [1, 16], got $maxRoundsPerLevel")
    require(levels >= 1 && levels <= 4,
      s"Louvain wants levels in [1, 4], got $levels")
    var ew = intake(edges)
    var mapping: DataFrame = null
    var allConverged = true
    for (lvl <- 1 to levels) {
      val (st, conv) = localMoves(ew, maxRoundsPerLevel)
      allConverged = allConverged && conv
      mapping =
        if (lvl == 1) st.localCheckpoint(true)
        else mapping.select(col("node"), col("com").as("__prev"))
          .join(st.select(col("node").as("__prev"), col("com")), "__prev")
          .select(col("node"), col("com"))
          .localCheckpoint(true)
      if (lvl < levels) {
        val stA = st.select(col("node").as("a"), col("com").as("__ca"))
        val stB = st.select(col("node").as("b"), col("com").as("__cb"))
        ew = ew.join(stA, "a").join(stB, "b")
          .select(least(col("__ca"), col("__cb")).as("a"),
            greatest(col("__ca"), col("__cb")).as("b"), col("w"))
          .groupBy("a", "b").agg(sum("w").as("w"))
      }
    }
    mapping.select(col("node"), col("com"), lit(allConverged).as("converged"))
  }

  /** Level-1 intake: cast, refuse self-loops on the consumed b column,
    * refuse duplicates through the weight column (w = 1 guarded by one
    * raw-vs-distinct-canonical-pair count audit on a 1-row broadcast). */
  private[graft] def intake(edges: DataFrame): DataFrame = {
    val e = graft.Q.persistOnce(edges.select(
      col("a").cast("long").as("a"),
      Guards(col("b").cast("long") =!= col("a").cast("long"),
        col("b").cast("long"),
        Guards.msg("louvain",
          lit("self-loop edge ("), col("a").cast("string"), lit(", "),
          col("b").cast("string"),
          lit(") - input must be distinct undirected pairs with a != b")))
        .as("b")))
    val audit = e.agg(count(lit(1)).as("__c"),
      countDistinct(least(col("a"), col("b")),
        greatest(col("a"), col("b"))).as("__d"))
    e.crossJoin(broadcast(audit))
      .select(col("a"), col("b"),
        Guards(col("__c") === col("__d"), lit(1L),
          Guards.msg("louvain",
            lit("duplicate undirected edges ("), col("__c").cast("string"),
            lit(" rows, "), col("__d").cast("string"),
            lit(" distinct pairs) - duplicates silently skew m, degrees "),
            lit("and every gain; distinct the edge list first"))).as("w"))
  }

  /** Size-guarded routing bound (the PageRank.runLocal posture): a
    * level whose EDGE LIST fits comfortably on the driver iterates in
    * memory at zero per-round job cost — each distributed round is ~3
    * fixed-cost jobs (votes/sigma/argmax + checkpoint + moveless
    * probe) whatever the data volume, which made an 8-round two-level
    * run the most expensive bench entry on a graph of a few thousand
    * edges. Contracted levels are ≤ the previous level by construction,
    * so level 2+ of any graph that contracts well lands here even when
    * level 1 ran distributed. Both tiers compute the identical integer
    * recurrence (GraphSpec pins local ≡ distributed on random weighted
    * graphs, the PageRank contract). */
  private val LocalEdgeLimit = 4L << 20

  /** Synchronous weighted local moves. `ew`: (a, b, w) distinct
    * canonical pairs, self-loops allowed. Returns (state, converged):
    * one (node, com) row per endpoint, and whether two consecutive
    * moveless rounds were observed within the budget. */
  private[graft] def localMoves(
      ew: DataFrame, maxRounds: Int,
      localEdgeLimit: Long = LocalEdgeLimit): (DataFrame, Boolean) = {
    val e = graft.Q.persistOnce(ew)
    if (e.count() <= localEdgeLimit) return localMovesDriver(e, maxRounds)
    val m = e.agg(
      Guards(sum("w") <= lit(1L << 30), sum("w"),
        "[louvain] total edge weight exceeds 2^30: the 2m-scaled gain " +
          "would overflow int64 - shard the graph").as("m"))
    val nonSelf = e.filter(col("a") =!= col("b"))
    val sym = graft.Q.persistOnce(nonSelf.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst"), col("w")),
        struct(col("b").as("src"), col("a").as("dst"), col("w")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"), col("p.w").as("w")))
    // weighted degree: non-self edges once per endpoint, self-loops twice
    val deg = graft.Q.persistOnce(
      sym.select(col("dst").as("node"), col("w"))
        .unionByName(e.filter(col("a") === col("b"))
          .select(col("a").as("node"), (col("w") * 2).as("w")))
        .groupBy("node").agg(sum("w").as("k")))

    var state = deg.select(col("node"), col("node").as("com"))
      .localCheckpoint(true)
    var converged = false
    var prevMoveless = false
    var r = 1
    while (r <= maxRounds && !converged) {
      // neighbor-community vote weights w(i -> C), from the PREVIOUS state
      val votes = sym
        .join(state.select(col("node").as("src"), col("com")), "src")
        .groupBy(col("dst").as("node"), col("com"))
        .agg(sum("w").as("wv"))
      // the own community is always a candidate, at its true w (or 0)
      val cands = votes
        .unionByName(state.select(col("node"), col("com"), lit(0L).as("wv")))
        .groupBy("node", "com").agg(max("wv").as("wv"))
      val sigma = state.join(deg, "node")
        .groupBy("com").agg(sum("k").as("s_tot"))
      val gains = cands
        .join(deg, "node")
        .join(state.select(col("node"), col("com").as("own")), "node")
        .join(sigma, "com")
        .crossJoin(broadcast(m))
        .select(col("node"), col("com"), col("own"),
          Guards(
            col("wv") <= expr("9223372036854775807L div (2 * m)") &&
              col("s_tot") <= expr("9223372036854775807L div k"),
            lit(2L) * col("m") * col("wv") -
              col("k") * (col("s_tot") -
                when(col("com") === col("own"), col("k")).otherwise(lit(0L))),
            Guards.msg("louvain",
              lit("gain term 2m*w / k*s_tot would overflow int64 (m="),
              col("m").cast("string"), lit(", w="), col("wv").cast("string"),
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
      val applied: Column =
        when(progressive, col("picked")).otherwise(col("own"))
      val next = pick
        .select(col("node"), applied.as("com"),
          (applied =!= col("own")).as("__moved"))
        .localCheckpoint(true)
      // moveless probe: one bounded job over the checkpointed round state
      val moveless = next.filter(col("__moved")).isEmpty
      state = next.drop("__moved")
      if (moveless && prevMoveless) converged = true
      prevMoveless = moveless
      r += 1
    }
    (state.select(col("node"), col("com")), converged)
  }

  /** Driver tier: the same recurrence on collected (a, b, w) rows —
    * collecting evaluates the intake guard columns, so self-loop /
    * duplicate refusals fire identically. Pure Long arithmetic, no
    * division anywhere, so the two tiers are bit-identical. */
  private def localMovesDriver(e: DataFrame, maxRounds: Int): (DataFrame, Boolean) = {
    val spark = e.sparkSession
    val rows = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = rows.map(_._3).sum
    require(m <= (1L << 30),
      "[louvain] total edge weight exceeds 2^30: the 2m-scaled gain " +
        "would overflow int64 - shard the graph")
    val nonSelf = rows.filter(r => r._1 != r._2)
    // incoming (dst <- src, w) both directions; self-loops twice in deg
    val in = nonSelf.flatMap { case (a, b, w) => Seq((b, a, w), (a, b, w)) }
    val deg = scala.collection.mutable.LongMap.empty[Long].withDefaultValue(0L)
    in.foreach { case (dst, _, w) => deg(dst) += w }
    rows.filter(r => r._1 == r._2).foreach { case (a, _, w) => deg(a) += 2 * w }
    val nodes = deg.keys.toArray.sorted
    val inByDst = in.groupBy(_._1)
    var com = nodes.map(v => v -> v).toMap
    var converged = false
    var prevMoveless = false
    var r = 1
    while (r <= maxRounds && !converged) {
      val sigma = scala.collection.mutable.LongMap.empty[Long].withDefaultValue(0L)
      nodes.foreach(v => sigma(com(v)) += deg(v))
      var moveless = true
      val next = nodes.map { v =>
        val own = com(v)
        val votes = scala.collection.mutable.LongMap.empty[Long].withDefaultValue(0L)
        inByDst.getOrElse(v, Array.empty).foreach { case (_, src, w) =>
          votes(com(src)) += w
        }
        if (!votes.contains(own)) votes(own) = 0L
        val k = deg(v)
        var bestGain = Long.MinValue
        var best = Long.MaxValue
        votes.foreach { case (c, wv) =>
          val gain = 2L * m * wv - k * (sigma(c) - (if (c == own) k else 0L))
          if (gain > bestGain || (gain == bestGain && c < best)) {
            bestGain = gain; best = c
          }
        }
        val progressive = if (r % 2 == 1) best < own else best > own
        val applied = if (progressive) best else own
        if (applied != own) moveless = false
        v -> applied
      }.toMap
      com = next
      if (moveless && prevMoveless) converged = true
      prevMoveless = moveless
      r += 1
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(nodes.map(v => Row(v, com(v))).toSeq, 1),
      StructType(Seq(StructField("node", LongType, nullable = false),
        StructField("com", LongType, nullable = false))))
    (out, converged)
  }
}
