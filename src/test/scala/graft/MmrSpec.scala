package graft

/** operators.Mmr — MMR greedy re-ranking pins: the degeneracy to pure
  * relevance top-k at wDiv=0, the diversity effect (a duplicate of the
  * top pick loses to a diverse candidate once wDiv outweighs wRel),
  * round-1 semantics (empty-set max-sim = 0), determinism, exhaustion,
  * and the loud intake refusals. The q271 oracle replays the same
  * algebra over the real embeddings; these pins prove the algebra.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._
  import operators.Mmr

  // Vectors already ON the integer grid (values ≤ 1000): grid() floors
  // v*1000 of the double view, so supply doubles v/1000 exactly
  // representable... simpler: feed the RAW doubles and state expected
  // grid coords alongside. 0.5 -> 500 etc. Exact binary fractions only,
  // so the floor is unambiguous.
  private def df(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("id", "vec")

  private val q = Array(1000L, 0L) // query on the grid: [1.0, 0.0]

  test("wDiv=0 degenerates to relevance top-k with smallest-id ties") {
    val d = df(
      (1L, Seq(0.5, 0.0)),   // rel 500·1000 = 500000
      (2L, Seq(0.25, 0.5)),  // rel 250000
      (3L, Seq(0.5, 0.25)),  // rel 500000 — ties id 1, loses on id
      (4L, Seq(-0.5, 0.0)))  // rel −500000
    val out = Mmr.rerank(d, "id", "vec", q, k = 3, wRel = 1, wDiv = 0)
      .select("round", "id", "rel").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 500000L), (2L, 3L, 500000L), (3L, 2L, 250000L)))
  }

  test("diversity: the duplicate of pick 1 loses to a diverse candidate") {
    // A and A' identical and most relevant; B diverse with lower rel.
    // wRel=1, wDiv=2: round 2 scores A' = rel − 2·dot(A',A) =
    // 10^6 − 2·10^6 < 10^5 − 2·10^5 = B's score, so B is picked second
    // even though A' out-relevances it — the point of MMR.
    val d = df(
      (1L, Seq(1.0, 0.0)),   // A   rel 10^6
      (2L, Seq(1.0, 0.0)),   // A'  rel 10^6, dot(A',A) = 10^6
      (3L, Seq(0.1, 0.8)))   // B   rel 10^5, dot(B,A)  = 10^5
    val out = Mmr.rerank(d, "id", "vec", q, k = 3, wRel = 1, wDiv = 2)
      .select("round", "id", "max_sim", "score").as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
    // round-1 empty-set max-sim is 0 and score is pure weighted rel
    assert(out.head._3 == 0L && out.head._4 == 1000000L)
    // round-2 (B) carries its sim to A, not to anything else
    assert(out(1)._3 == 100000L && out(1)._4 == 100000L - 2L * 100000L)
  }

  test("max_sim is the MAX over all selected, not the latest pick") {
    // C is orthogonal to A but identical to B: when C is scored in
    // round 3, its max_sim must be dot(C,B), not dot(C,A).
    val d = df(
      (1L, Seq(1.0, 0.0)),    // A
      (2L, Seq(0.0, 0.9)),    // B: rel 0, picked 2nd at wDiv=0? no —
                              // use weights making B 2nd: rel(B)=0 …
      (3L, Seq(0.0, 0.9)))    // C = B
    // wRel=1, wDiv=1: r1 A (rel 10^6); r2 both B,C score 0 − 0 = 0 →
    // smaller id B; r3 C: max(dot(C,A)=0, dot(C,B)=810000) = 810000.
    val out = Mmr.rerank(d, "id", "vec", q, k = 3, wRel = 1, wDiv = 1)
      .select("round", "id", "max_sim").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 810000L)))
  }

  test("deterministic across runs; exhaustion stops early") {
    val d = df((1L, Seq(0.3, 0.2)), (2L, Seq(0.1, 0.4)))
    val a = Mmr.rerank(d, "id", "vec", q, 5, 3, 2).collect().toSeq
    val b = Mmr.rerank(d, "id", "vec", q, 5, 3, 2).collect().toSeq
    assert(a == b)
    assert(a.size == 2) // k=5 but only 2 candidates
  }

  test("intake refusals: dim mismatch and duplicate ids are loud") {
    val bad = df((1L, Seq(0.5, 0.0)), (2L, Seq(0.5)))
    val e1 = intercept[Exception] {
      Mmr.rerank(bad, "id", "vec", q, 2, 1, 1).collect()
    }
    assert(e1.getMessage.contains("[mmr]"))
    val dup = df((1L, Seq(0.5, 0.0)), (1L, Seq(0.25, 0.0)))
    val e2 = intercept[Exception] {
      Mmr.rerank(dup, "id", "vec", q, 2, 1, 1).collect()
    }
    assert(e2.getMessage.contains("duplicate candidate ids"))
  }

  test("caller-contract requires: k, weights, query domain") {
    val d = df((1L, Seq(0.5, 0.0)))
    intercept[IllegalArgumentException](Mmr.rerank(d, "id", "vec", q, 0, 1, 1))
    intercept[IllegalArgumentException](Mmr.rerank(d, "id", "vec", q, 65, 1, 1))
    intercept[IllegalArgumentException](Mmr.rerank(d, "id", "vec", q, 2, 0, 0))
    intercept[IllegalArgumentException](Mmr.rerank(d, "id", "vec", q, 2, 2000, 1))
    intercept[IllegalArgumentException](
      Mmr.rerank(d, "id", "vec", Array(1L << 21, 0L), 2, 1, 1))
  }

  test("gridOf matches the in-plan grid on exact binary fractions") {
    assert(Mmr.gridOf(Seq(0.5, -0.25, 0.0)).toSeq == Seq(500L, -250L, 0L))
  }
}
