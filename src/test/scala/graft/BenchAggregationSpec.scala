package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's pass-folding against the r7 failure mode: 21 queries
  * that crashed at analysis were booked as ~0.05 s "successes" inside
  * the bench total. The contract now: a query contributes min-of-passes
  * iff at least one timed pass succeeded; a query with zero successful
  * passes surfaces as an error (and main exits 1), never as a time.
  */
class BenchAggregationSpec extends AnyFunSuite {

  private def pass(entries: (String, Either[String, Double])*): Map[String, Either[String, Double]] =
    entries.toMap

  test("all-pass queries contribute their minimum across passes") {
    val (results, errors) = Bench.aggregate(Seq(
      pass("q1" -> Right(2.0), "q2" -> Right(5.0)),
      pass("q1" -> Right(1.5), "q2" -> Right(6.0))))
    assert(results === Seq("q1" -> 1.5, "q2" -> 5.0))
    assert(errors.isEmpty)
  }

  test("a query that crashes in EVERY pass is an error, not a time") {
    val (results, errors) = Bench.aggregate(Seq(
      pass("q1" -> Right(2.0), "q2" -> Left("AnalysisException: ts div 1000")),
      pass("q1" -> Right(1.0), "q2" -> Left("AnalysisException: ts div 1000"))))
    assert(results === Seq("q1" -> 1.0))
    assert(errors === Seq("q2" -> "AnalysisException: ts div 1000"))
  }

  test("a transient single-pass crash does not error the query") {
    // One flaky pass (e.g. the agri temp-dir race) must not mark a
    // working query broken — min over the successful passes stands.
    val (results, errors) = Bench.aggregate(Seq(
      pass("q1" -> Left("IOException: listing race")),
      pass("q1" -> Right(3.0))))
    assert(results === Seq("q1" -> 3.0))
    assert(errors.isEmpty)
  }

  test("an all-failed query reports its most common (tie: latest) error") {
    // Pass 1's transient must not mask the root cause seen in later
    // passes; with all messages distinct, the latest wins.
    val (_, errors) = Bench.aggregate(Seq(
      pass("q1" -> Left("IOException: listing race")),
      pass("q1" -> Left("AnalysisException: missing column")),
      pass("q1" -> Left("AnalysisException: missing column"))))
    assert(errors === Seq("q1" -> "AnalysisException: missing column"))
    val (_, errors2) = Bench.aggregate(Seq(
      pass("q1" -> Left("first")),
      pass("q1" -> Left("second"))))
    assert(errors2 === Seq("q1" -> "second"))
  }

  test("errored queries never contribute to the total") {
    val (results, errors) = Bench.aggregate(Seq(
      pass("q1" -> Right(1.0), "q2" -> Left("boom"), "q3" -> Right(0.1)),
      pass("q1" -> Right(2.0), "q2" -> Left("boom"), "q3" -> Right(0.2))))
    assert(results.map(_._2).sum === 1.1)
    assert(errors.map(_._1) === Seq("q2"))
  }
}
