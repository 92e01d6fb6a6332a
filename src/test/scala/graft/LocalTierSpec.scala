package graft

import org.apache.spark.sql.DataFrame

import scala.util.Random

/** r15 optimization pins: the driver-local tiers added to the
  * fixed-round iterative operators (PrefixSpan, Apriori, Hits,
  * LabelProp, KCore — the PageRank.runLocal / Louvain.localMoves
  * posture) must be BIT-IDENTICAL to the distributed join plans they
  * route around. Each test runs the same randomized input through both
  * tiers (the local route via the public entry point, the distributed
  * route forced past the routing bound with localEdgeLimit = 0) and
  * compares the full result sets exactly — values AND schema dtypes,
  * since the driver's oracle hash is type-sensitive.
  */
class LocalTierSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(1715)

  private def sortedRows(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString(""))

  private def assertSame(local: DataFrame, dist: DataFrame, what: String): Unit = {
    assert(local.schema.map(f => (f.name, f.dataType)) ===
      dist.schema.map(f => (f.name, f.dataType)), s"$what: schema diverged")
    assert(sortedRows(local) === sortedRows(dist), s"$what: rows diverged")
  }

  test("PrefixSpan local tier == distributed tier (free-gap and bounded-gap)") {
    val items = Array("a", "b", "c", "d", "e")
    val ev = (1 to 120).flatMap { sid =>
      val len = 3 + rng.nextInt(12)
      (1 to len).map(p => (s"s$sid", items(rng.nextInt(items.length)), p.toLong))
    }.toDF("sid", "e", "pos")
    val local = operators.PrefixSpan.frequentPatterns(ev, 40, 4)
    val dist = operators.PrefixSpan.frequentPatterns(ev, 40, 4, localRowLimit = 0L)
    assertSame(local, dist, "PrefixSpan free-gap")
    val localG = operators.PrefixSpan.frequentPatternsMaxGap(ev, 25, 4, 2)
    val distG = operators.PrefixSpan.frequentPatternsMaxGap(ev, 25, 4, 2, localRowLimit = 0L)
    assertSame(localG, distG, "PrefixSpan bounded-gap")
  }

  test("Apriori local tier == distributed tier") {
    val items = Array("w", "x", "y", "z", "v", "u")
    val rows = (1 to 150).flatMap { bid =>
      (1 to 2 + rng.nextInt(5)).map(_ => (s"b$bid", items(rng.nextInt(items.length))))
    }.toDF("bid", "item")
    val local = operators.Apriori.frequentItemsets(rows, 10, 4)
    val dist = operators.Apriori.frequentItemsets(rows, 10, 4, localRowLimit = 0L)
    assertSame(local, dist, "Apriori")
  }

  test("Hits local tier == distributed tier") {
    val edges = (1 to 300)
      .map(_ => (rng.nextInt(15).toLong, 100L + rng.nextInt(20)))
      .toDF("src", "dst")
    val local = operators.Hits.run(edges, 3)
    val dist = operators.Hits.run(edges, 3, localEdgeLimit = 0L)
    assertSame(local, dist, "Hits")
  }

  test("LabelProp local tier == distributed tier (long labels, clamped seeds)") {
    val edges = (1 to 250)
      .map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong)).toDF("a", "b")
    val nodes = edges.select($"a".as("node"))
      .unionAll(edges.select($"b".as("node"))).distinct()
    val seeds = nodes.filter($"node" % 7 === 0)
      .select($"node", ($"node" % 3).as("lbl"))
    val local = operators.LabelProp.propagate(nodes, edges, seeds, iters = 3)
    val dist = operators.LabelProp.propagate(nodes, edges, seeds, iters = 3,
      localEdgeLimit = 0L)
    assertSame(local, dist, "LabelProp")
  }

  test("Louvain full-local multilevel == distributed multilevel") {
    val pairs = (1 to 220)
      .map(_ => (rng.nextInt(35).toLong, rng.nextInt(35).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val edges = pairs.toDF("a", "b")
    val local = operators.Louvain.communitiesMultiLevel(edges, 4, 2)
    val dist = operators.Louvain.communitiesMultiLevel(edges, 4, 2, localEdgeLimit = 0L)
    assertSame(local, dist, "Louvain multilevel")
  }

  test("ConnectedComponents local tier == distributed tier") {
    val edges = (1 to 180)
      .map(_ => (rng.nextInt(120).toLong, rng.nextInt(120).toLong)).toDF("a", "b")
    val nodes = spark.range(120).selectExpr("id as doc_id")
    val local = operators.ConnectedComponents.components(nodes, edges, "doc_id")
    val dist = operators.ConnectedComponents.components(nodes, edges, "doc_id",
      maxIter = 20, localEdgeLimit = 0L)
    assertSame(local, dist, "ConnectedComponents")
    // truncated, NOT-converged state must also match: a 40-path at
    // maxIter 2 stops mid-propagation in both tiers
    val path = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val pn = spark.range(40).selectExpr("id as doc_id")
    val localT = operators.ConnectedComponents.components(pn, path, "doc_id", maxIter = 2)
    val distT = operators.ConnectedComponents.components(pn, path, "doc_id",
      maxIter = 2, localEdgeLimit = 0L)
    assertSame(localT, distT, "ConnectedComponents truncated")
  }

  test("Coverage local tier == distributed tier (exact and stochastic)") {
    val pairs = (1 to 400)
      .map(_ => (rng.nextInt(25).toLong, s"e${rng.nextInt(120)}")).toDF("doc_id", "sh")
    for (ppm <- Seq(None, Some(600000L))) {
      val local = operators.Coverage.greedySelectForced(
        pairs, "doc_id", "sh", 5, ppm, localRowLimit = Long.MaxValue)
      val dist = operators.Coverage.greedySelectForced(
        pairs, "doc_id", "sh", 5, ppm, localRowLimit = 0L)
      assertSame(local, dist, s"Coverage ppm=$ppm")
    }
  }

  test("Bfs and Sssp local tiers == distributed tiers (incl. K-bounded truncation)") {
    val edges = (1 to 200)
      .map(_ => (rng.nextInt(50).toLong, rng.nextInt(50).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    for (rounds <- Seq(2, 6)) {
      val local = operators.Bfs.hops(edges, 0L, rounds)
      val dist = operators.Bfs.hops(edges, 0L, rounds, localEdgeLimit = 0L)
      assertSame(local, dist, s"Bfs rounds=$rounds")
    }
    val wedges = (1 to 200)
      .map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong, 1L + rng.nextInt(9)))
      .filter { case (a, b, _) => a != b }.distinct.toDF("src", "dst", "w")
    for (rounds <- Seq(2, 5)) {
      val local = operators.Sssp.distances(wedges, 0L, rounds)
      val dist = operators.Sssp.distances(wedges, 0L, rounds, localEdgeLimit = 0L)
      assertSame(local, dist, s"Sssp rounds=$rounds")
    }
  }

  test("hash60Local == the hash60 Column form") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val inputs = (1 to 50).map(i => s"rw:$i:${rng.nextInt(1000)}:${rng.nextLong()}")
    val viaColumn = inputs.toDF("s")
      .select(functions.GraftFunctions.hash60(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getLong(0)).toSeq
    val viaLocal = inputs.map(s => functions.GraftFunctions.hash60Local(md, s))
    assert(viaColumn === viaLocal, "hash60Local diverged from the Column twin")
  }

  test("KCore local tier == distributed tier (parallel edges and self-loops kept)") {
    val base = (1 to 260)
      .map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    // a few deliberate duplicates: the degree multiset must match too
    val edges = (base ++ base.take(15)).toDF("a", "b")
    val local = operators.KCore.peel(edges, 3L, 4)
    val dist = operators.KCore.peel(edges, 3L, 4, localEdgeLimit = 0L)
    assertSame(local, dist, "KCore")
  }
}
