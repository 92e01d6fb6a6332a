package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components over a pair table — the step that
  * turns near-duplicate PAIRS (minhash/simhash/cosine candidates) into
  * duplicate CLUSTERS, so a pipeline can keep one representative per
  * cluster (reference behavior: single-table dedup, fetch_data.py:131;
  * the cluster generalization is the LLM-corpus standard).
  *
  * Algorithm: iterative min-label propagation with a pointer-jump
  * (path-halving) step per round, the DataFrame rendering of the
  * map-reduce CC family (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14). Each round is two key-partitioned
  * shuffles (neighbor-min aggregation + label lookup join); pointer
  * jumping makes convergence O(log diameter) rounds rather than
  * O(diameter). Dedup graphs are near-clique bundles (diameter 2-3), so
  * in practice 2-3 rounds close.
  *
  * Scale contract: state is one (id, comp) row per node — never
  * collected; each round materializes via localCheckpoint to cut lineage
  * (without it, round k's plan embeds all k-1 predecessors and the
  * optimizer re-plans a growing tree). Labels only ever decrease
  * (everything is a `least`), so convergence is detected by comparing
  * the label sum across rounds — one scan-stage aggregate over the
  * checkpointed state, no join against the previous round. The sum is
  * accumulated as DECIMAL(38,0) so billions of 64-bit ids can't wrap.
  */
object ConnectedComponents {

  /** Components of the undirected graph `edges` (columns a, b) over the
    * node set `nodes` (column `idCol`; includes isolated nodes).
    * Returns (idCol, comp) where comp = the minimum node id reachable.
    */
  def components(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      maxIter: Int = 20): DataFrame = {
    val spark = nodes.sparkSession
    // symmetrize in ONE pass over the pair plan: a union of two selects
    // would evaluate the (possibly expensive — q133's edges are an exact
    // cosine self-join) edge derivation twice while filling the cache;
    // the explode fans each pair out to both directions scan-stage.
    val sym = edges.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast(DecimalType(38, 0)))).head().getDecimal(0)
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // (1) neighbor min: each node adopts the smallest label among its
      //     own and its neighbors' — one partial-agg'd shuffle on src.
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("dst_comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("dst_comp").as("nbr_comp"))
      // persisted: it feeds BOTH sides of the pointer-jump self-join, and
      // without the cache each side would recompute the nbrMin shuffle.
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .persist()
      // (2) pointer jump: comp := comp(comp) — halves label-chain depth,
      //     turning O(diameter) rounds into O(log diameter).
      val next = stepped.as("l")
        .join(stepped.select(col("id").as("comp"), col("comp").as("jump")).as("r"), Seq("comp"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
        .localCheckpoint()
      stepped.unpersist()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("id", idCol)
  }
}
