package graft

import org.apache.spark.sql.functions._

/** Markov absorption contracts (operators/Markov): hand-replayable grid
  * arithmetic, absorbing semantics, dangling states, guard refusals. */
class MarkovSpec extends SparkSpec {

  import spark.implicits._

  private val G = 1000000L

  private def run(pairs: Seq[(String, String, Long)], target: String, steps: Int) =
    operators.Markov.absorbWithin(
      pairs.toDF("from_state", "to_state", "n"), target, steps)
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("markov: two-state chain replays the truncating grid by hand") {
    // a →(3/4)→ t, a →(1/4)→ a; t →(1)→ t implied by absorption
    val p = run(Seq(("a", "t", 3L), ("a", "a", 1L)), "t", 3)
    val t1 = 3L * G / 4 // t(a→t) = 750000, t(a→a) = 250000
    assert(p(("t", 1)) == G && p(("t", 2)) == G && p(("t", 3)) == G)
    assert(p(("a", 1)) == t1)
    // p2(a) = (t_at·G + t_aa·p1(a)) div G
    val p2 = (750000L * G + 250000L * t1) / G
    assert(p(("a", 2)) == p2)
    val p3 = (750000L * G + 250000L * p2) / G
    assert(p(("a", 3)) == p3)
    // monotone toward 1 and never exceeding the grid
    assert(t1 < p2 && p2 < p3 && p3 <= G)
  }

  test("markov: the target is absorbing even when it has outgoing data") {
    // data says t→a happens, but the absorbing read pins p_k(t) = 1
    val p = run(Seq(("t", "a", 5L), ("a", "t", 1L)), "t", 2)
    assert(p(("t", 1)) == G && p(("t", 2)) == G)
    assert(p(("a", 1)) == G) // a always hands off to t
  }

  test("markov: dangling and disconnected states stay at zero") {
    // c only RECEIVES (no outgoing row): p_k(c) = 0; d never reaches t
    val p = run(Seq(("a", "t", 1L), ("a", "c", 1L), ("d", "d", 2L)), "t", 3)
    assert(p(("c", 1)) == 0L && p(("c", 3)) == 0L)
    assert(p(("d", 1)) == 0L && p(("d", 3)) == 0L)
    assert(p(("a", 1)) == G / 2)
  }

  test("markov: a target absent from the chain yields all-zero probabilities") {
    val p = run(Seq(("a", "b", 1L)), "zz", 2)
    assert(p.values.forall(_ == 0L))
  }

  test("markov: grid-wrap count refuses loudly in-plan") {
    val big = Long.MaxValue / 1000000L + 1
    val e = intercept[Exception] {
      operators.Markov.absorbWithin(
        Seq(("a", "t", big)).toDF("from_state", "to_state", "n"), "t", 1).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(msgs.contains("[markov]"))
  }

  test("markov: degenerate parameters refuse at the door") {
    val df = Seq(("a", "t", 1L)).toDF("from_state", "to_state", "n")
    intercept[IllegalArgumentException] {
      operators.Markov.absorbWithin(df, "t", 0)
    }
    intercept[IllegalArgumentException] {
      operators.Markov.absorbWithin(df, "t", 2, grid = 10L)
    }
  }
}
