package graft

import org.apache.spark.sql.functions._

/** Pins for the invariants the scale probe's honesty rests on: the
  * ScaleGen document mutation must make each replica a structural twin
  * of the original corpus (so candidate-join OUTPUT is linear in the
  * factor by construction) while keeping replicas mutually dissimilar
  * (so no cross-replica pairs manufacture factor-squared output — the
  * r9 artifact that hid q111/q130/q59's real exponents).
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"),
    (3L, "completely different words appear in this one", "en"),
    (4L, "short doc", "en"))

  private def replicas(factor: Int) = {
    val base = corpus.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
    graft.tools.ScaleGen.mutateDocuments(
      base.crossJoin(spark.range(factor.toLong)
        .select(col("id").cast("int").as("__rep"))))
  }

  private def toks(t: String): Seq[String] =
    t.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  test("replica 0 is verbatim") {
    val got = replicas(3).filter(col("__rep") === 0)
      .select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val want = corpus.map { case (id, t, _) => (id, t, t.length.toLong) }
    assert(got.toSeq == want)
  }

  test("intra-replica token identity is preserved (structure replicates exactly)") {
    // Two tokens equal in the original must be equal in every replica
    // and vice versa — corpus-wide, not just within a doc: that is what
    // makes shingle sets, minhash signatures, shared-n-gram counts and
    // equal prefixes replicate the original pair structure per replica.
    val byRep = replicas(3).select("__rep", "doc_id", "text")
      .as[(Int, Long, String)].collect().groupBy(_._1)
    val orig = corpus.flatMap { case (id, t, _) => toks(t).map((id, _)) }
    for (rep <- 1 to 2) {
      val ren = byRep(rep).sortBy(_._2).flatMap { case (_, id, t) => toks(t).map((id, _)) }
      assert(ren.length == orig.length, s"rep $rep changed token count")
      // positionwise: original tokens equal <=> renamed tokens equal
      val mapping = orig.map(_._2).zip(ren.map(_._2))
      val fwd = mapping.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).distinct }
      assert(fwd.values.forall(_.size == 1), s"rep $rep renamed one token inconsistently")
      // injectivity over this corpus (no accidental merges in the test vocab)
      val bwd = mapping.groupBy(_._2).map { case (k, g) => k -> g.map(_._1).distinct }
      assert(bwd.values.forall(_.size == 1), s"rep $rep merged distinct tokens")
    }
  }

  test("cross-replica vocabularies are disjoint and alphabetic") {
    val byRep = replicas(4).select("__rep", "text")
      .as[(Int, String)].collect().groupBy(_._1)
      .view.mapValues(_.flatMap(r => toks(r._2)).toSet).toMap
    for (i <- 1 to 3; j <- i + 1 to 3)
      assert((byRep(i) intersect byRep(j)).isEmpty, s"reps $i/$j share tokens")
    for (i <- 1 to 3) {
      assert((byRep(0) intersect byRep(i)).isEmpty, s"rep $i collides with the original vocab")
      // q130's prefix key strips [^a-z ] — substitutes must survive it
      assert(byRep(i).forall(_.matches("[a-j]+")), s"rep $i has non-alphabetic substitutes")
    }
  }

  test("substitute space is 2^24 slots (the r11 collision-bias fix), decimal-letter injective") {
    // decode each substitute back through the inverse letter->digit map:
    // values must span past the old 2^16 ceiling (the 16-bit space merged
    // ~19k token pairs per 50k-token replica and biased probe exponents)
    // and stay under 2^24
    val subs = replicas(2).filter(col("__rep") === 1)
      .select("text").as[String].collect().flatMap(toks).distinct
    val vals = subs.map(t => t.map(c => ('0' + (c - 'a')).toChar).mkString.toLong)
    assert(vals.forall(v => v >= 0L && v < 16777216L), s"substitute out of 2^24: ${vals.max}")
    assert(vals.exists(_ >= 65536L),
      "no substitute past 2^16 - the widened hash space is not in effect")
  }

  test("n_chars matches the mutated text") {
    val bad = replicas(3).filter(col("n_chars") =!= length(col("text")).cast("long")).count()
    assert(bad == 0L)
  }

  test("mutation is deterministic across evaluations") {
    val a = replicas(3).select("__rep", "doc_id", "text").as[(Int, Long, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val b = replicas(3).select("__rep", "doc_id", "text").as[(Int, Long, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
  }

  // ---- the r14 embedding mutation (per-replica coordinate permutation) ----

  private def embReplicas(factor: Int) = {
    val rng = new scala.util.Random(11)
    val base = (0L until 6L).map(id =>
      (id, Array.fill(16)((rng.nextDouble() - 0.5).toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .crossJoin(spark.range(factor.toLong).select(col("id").cast("int").as("__rep")))
      .withColumn("vec_id", col("vec_id") + col("__rep").cast("long") * 100000000L)
    graft.tools.ScaleGen.mutateEmbeddings(base)
      .select(col("__rep"), col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Int, Long, Seq[Double])].collect()
      .groupBy(_._1).map { case (r, rows) =>
        r -> rows.map(t => (t._2 % 100000000L) -> t._3.toVector).toMap
      }
  }

  private def dot(a: Vector[Double], b: Vector[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("embeddings: rep 0 keeps coordinate order; intra-replica dots are preserved up to jitter") {
    val reps = embReplicas(3)
    // the jitter touches only component 0 by ±0.0005: dots move by at
    // most |x0·5e-4| + |y0·5e-4| + 2.5e-7 — bound everything by 1e-3
    for (r <- 1 to 2; i <- 0L to 4L; j <- (i + 1) to 5L) {
      val d0 = dot(reps(0)(i), reps(0)(j))
      val dr = dot(reps(r)(i), reps(r)(j))
      assert(math.abs(d0 - dr) < 1e-3,
        s"rep $r pair ($i,$j): intra-replica dot $dr drifted from $d0")
    }
    // rep 0 order: the sorted multiset equals the per-coordinate values
    // (jitter only on component 0) — check components 1..15 verbatim
    val rng = new scala.util.Random(11)
    val orig = (0L until 6L).map(id =>
      id -> Array.fill(16)((rng.nextDouble() - 0.5).toFloat).toVector).toMap
    for (i <- 0L to 5L; c <- 1 until 16)
      assert(reps(0)(i)(c) == orig(i)(c).toDouble, s"rep0 vec $i comp $c reordered")
  }

  test("embeddings: permutation is a real reorder and cross-replica cosines are not near-dup") {
    val reps = embReplicas(3)
    for (r <- 1 to 2; i <- 0L to 5L) {
      val a = reps(0)(i); val b = reps(r)(i)
      // same multiset of components (up to the component-0 jitter both
      // sides carry): sorted tails must agree in all but <= 2 slots
      assert(a.sorted.zip(b.sorted).count { case (x, y) => math.abs(x - y) > 1e-3 } <= 2,
        s"rep $r vec $i is not a permutation of rep 0")
      // ...but NOT the identity order
      assert(a.zip(b).count { case (x, y) => math.abs(x - y) > 1e-3 } >= 8,
        s"rep $r vec $i kept rep 0's coordinate order")
      // and the same-original cross-replica cosine sits at the random
      // level, not the near-dup level the jitter-only replicas had
      val cos = dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
      assert(math.abs(cos) < 0.8, s"rep $r vec $i cross-replica cos $cos still near-dup")
    }
  }
}
