package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg, JACM 1999) over a DIRECTED
  * edge list `(src, dst)` — the directed complement of the repo's
  * PageRank/label-prop/k-core graph tier: PageRank scores global
  * reachability, HITS separates "points at good things" (hub) from "is
  * pointed at by good hubs" (authority) — on a bipartite src→dst graph
  * (supplier→part, user→resource) the two sides get their own rankings.
  *
  * Determinism contract (what makes a nested-CTE SQL oracle replay
  * bit-for-bit): FIXED synchronous rounds (the PageRank/KCore posture);
  * all arithmetic in scaled integers — scores live on a 10^6 grid, each
  * half-round is an integer edge-sum followed by max-normalization with
  * FLOORED division `(10^6 · s) div max(s)` (the L∞ norm instead of the
  * conventional L2: same fixpoint direction, and exactly replayable
  * where a sqrt is not). Overflow domain: a half-round's edge sum `raw`
  * is at most 10^6 · degree (every incoming score is ≤ 10^6 after
  * normalization), and the normalization itself multiplies `raw` by
  * another 10^6 — so the product stays inside int64 only while
  * max degree ≤ (2^63−1) / 10^12 ≈ 9.2·10^6. A 100 TB web/link graph
  * can exceed that (tens of millions of in-edges on a hub node), so the
  * bound is ENFORCED in-plan: normalization refuses loudly
  * ([[Guards]]), naming the offending node and its raw sum, the moment
  * any `raw` exceeds (2^63−1) div 10^6 — never a silent wrap.
  *
  * Scale shape per half-round: one equi-join of the edge frame against
  * the bounded per-node score frame and one partial-agg'd sum by node,
  * plus a one-row max attach (broadcast) — never a window, never a
  * cartesian. Per-round state is cut with EAGER localCheckpoint (the
  * LabelProp contract: each state frame has two consumers in the next
  * round's DAG).
  *
  * Returns `(node, hub_em, auth_em)` — scores on the 10^6 grid; nodes
  * with no outgoing edges have hub 0, no incoming edges auth 0 (they
  * appear iff they touch any edge).
  */
object Hits {
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"Hits wants 1..8 iterations, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var hub = nodes.select(col("node"), lit(1000000L).as("s"))
      .localCheckpoint(true)
    var auth = hub
    for (_ <- 1 to iters) {
      // authority update: sum incoming hub scores, L∞-normalize floored
      val aRaw = e.join(hub.select(col("node").as("src"), col("s")), "src")
        .groupBy(col("dst").as("node")).agg(sum("s").as("raw"))
      auth = normalize(aRaw).localCheckpoint(true)
      // hub update from the NEW authorities (the standard half-step order)
      val hRaw = e.join(auth.select(col("node").as("dst"), col("s")), "dst")
        .groupBy(col("src").as("node")).agg(sum("s").as("raw"))
      hub = normalize(hRaw).localCheckpoint(true)
    }
    nodes
      .join(hub.select(col("node"), col("s").as("hub_em")), Seq("node"), "left")
      .join(auth.select(col("node"), col("s").as("auth_em")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub_em"), lit(0L)).as("hub_em"),
        coalesce(col("auth_em"), lit(0L)).as("auth_em"))
  }

  /** `(node, raw)` → `(node, s)` with s = (10^6 · raw) div max(raw) —
    * the floored L∞ normalization both engines replay identically. The
    * ×10^6 multiply wraps int64 once raw > (2^63−1) div 10^6 (i.e. max
    * in-degree beyond ~9.2·10^6 at the 10^6 score grid), so the bound
    * rides the consumed `s` column and refuses loudly past it. */
  private def normalize(raw: DataFrame): DataFrame = {
    val mx = raw.agg(max("raw").as("mx"))
    raw.crossJoin(broadcast(mx))
      .select(col("node"),
        Guards(col("raw") <= lit(Long.MaxValue / 1000000L),
          expr("(1000000 * raw) div mx"),
          Guards.msg("hits",
            lit("node "), col("node").cast("string"),
            lit(" has raw score sum "), col("raw").cast("string"),
            lit(" > (2^63-1) div 10^6 - its in-degree exceeds ~9.2e6 and the "),
            lit("10^6-grid normalization would wrap; coarsen the grid or "),
            lit("pre-aggregate parallel edges"))).as("s"))
  }
}
