package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer arithmetic.
  *
  * The corpus-curation use: rank domains/sources by link authority to
  * prioritize crawl + filter decisions (the CommonCrawl-style domain-rank
  * signal attached to each document before quality filtering). The engine
  * view: an iterative join-aggregate fixpoint — the one relational shape
  * (besides connected components, `ConnectedComponents.scala`) that needs
  * a driver loop, each round being pure DataFrame ops.
  *
  * All arithmetic is scaled-integer (`score` out of `scale`, integral
  * division truncating toward zero on non-negative operands), so results
  * are bit-identical across engines and run-to-run — no float drift, and
  * a DuckDB oracle can replay the same iterations exactly (q137).
  *
  * Scale shape per iteration: scores ⋈ out-degrees (broadcast if small) ⋈
  * edges shuffled on src, one partial-agg'd shuffle on dst, left-join back
  * to the node set. Edge partitioning on src is reused across rounds when
  * the input is pre-partitioned; each round's result is cached and the
  * previous unpersisted so the plan does not grow with iterations.
  * Dangling mass (nodes with no out-edges) is dropped, the standard
  * simplification; rounding mass lost to integral division is bounded by
  * one unit per edge per round.
  */
object PageRank {

  /** Run `iters` rounds over `edges(srcCol, dstCol)` (self-loops and
    * duplicate edges should be pre-removed by the caller). Returns
    * (node, score) with score out of `scale`. */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen,
      "need iters >= 0 and 0 <= dampNum <= dampDen")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // One bounded driver scalar (like the k-means means): N is needed
    // inside integer literals of the next plan, not as a column.
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val base = (scale * (dampDen - dampNum) / dampDen) / n
    var scores = nodes.withColumn("score", lit(scale / n))
    var previous: Option[DataFrame] = None
    for (_ <- 0 until iters) {
      val contrib = e
        .join(scores.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        // (score * d) div dampDen div outdeg — truncating integral div,
        // all operands non-negative: exact and portable.
        .select(col("dst"),
          expr(s"(score * $dampNum) div $dampDen div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("score"))
        .cache()
      next.count() // materialize before unpersisting the parent
      previous.foreach(_.unpersist())
      previous = Some(next)
      scores = next
    }
    scores
  }
}
