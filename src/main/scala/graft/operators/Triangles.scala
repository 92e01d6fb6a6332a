package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting (Cohen 2009 / the MapReduce classic)
  * — the graph-quality statistic for curation graphs (near-dup clusters,
  * co-occurrence graphs): triangle-dense neighborhoods mean template or
  * boilerplate families, and the local clustering coefficient
  * 2*tri(v) / (deg(v)*(deg(v)-1)) is the standard screen for them.
  *
  * Scale story: wedges are generated only from each edge's LOWER-degree
  * endpoint (ties by id), which bounds the out-degree of every node by
  * O(sqrt(m)) and total wedge volume by O(m^1.5) regardless of skew — a
  * hub of degree d contributes ZERO wedges from its own fan-out because
  * its edges orient toward it. Closing edges are matched with a plain
  * equi-join on the canonical (lo, hi) pair, so the whole operator is
  * three shuffles (degree agg, wedge self-join, closing join), no
  * cartesian, no driver state.
  */
object Triangles {

  /** Per-node triangle counts over an undirected simple graph given as
    * distinct edges with `a` < `b`. Returns (node, deg, tri); nodes with
    * no triangle report tri = 0. Counts each triangle exactly once per
    * member node (the wedge apex is the unique (deg,id)-minimal vertex,
    * so the global triangle count is sum(tri)/3).
    */
  def perNode(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val wedges = oriented.select(col("src"), col("dst").as("v"))
      .join(oriented.select(col("src"), col("dst").as("w")), Seq("src"))
      .filter(col("v") < col("w"))
    val tris = wedges.join(
      edges.select(col("a").as("lo"), col("b").as("hi")),
      least(col("v"), col("w")) === col("lo") &&
        greatest(col("v"), col("w")) === col("hi"))
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
    val perNodeTri = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("tri"))
    deg.join(perNodeTri, Seq("n"), "left")
      .select(col("n").as("node"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
  }
}
