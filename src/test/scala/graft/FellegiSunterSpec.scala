package graft

import org.apache.spark.sql.functions._

/** Fellegi–Sunter weight and scoring contracts (operators/FellegiSunter):
  * the exact u algebra, the identifier refusal, and the agree/disagree
  * weight routing on scored pairs. */
class FellegiSunterSpec extends SparkSpec {

  import spark.implicits._

  // 4 records: color repeats (u > 0), shape repeats, id is unique
  private def recs = Seq(
    (1L, "red", "box"), (2L, "red", "box"), (3L, "blue", "box"), (4L, "red", "tin"))
    .toDF("id", "color", "shape")

  test("fs: weights replay the exact u rational through the micronat floor") {
    val w = operators.FellegiSunter.fieldWeights(recs, Seq("color", "shape"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // color: counts {red:3, blue:1} → scc = 6, nn = 12, m = 19/20
    //   wa = floor(−ln((6·20)/(12·19))·1e6), wd = floor(−ln(((12−6)·20)/12)·1e6)
    def f(num: Long, den: Long): Long =
      math.floor(-math.log(num.toDouble / den.toDouble) * 1e6).toLong
    assert(w("color") == ((f(120, 228), f(120, 12))))
    // shape: counts {box:3, tin:1} → identical algebra
    assert(w("shape") == ((f(120, 228), f(120, 12))))
    // agreement on a repeating value is positive evidence, disagreement negative
    assert(w("color")._1 > 0 && w("color")._2 < 0)
  }

  test("fs: a never-repeating field refuses as an identifier") {
    val e = intercept[Exception] {
      operators.FellegiSunter.fieldWeights(recs, Seq("id")).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(msgs.contains("[fs]") && msgs.contains("identifier"))
  }

  test("fs: scorePairs routes each field through wa on agree, wd on disagree") {
    val w = operators.FellegiSunter.fieldWeights(recs, Seq("color", "shape"))
    val wm = w.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val pairs = Seq(
      (1L, 2L, "red", "red", "box", "box"),   // agree both
      (1L, 3L, "red", "blue", "box", "box"),  // disagree color
      (1L, 4L, "red", "red", "box", "tin"))   // disagree shape
      .toDF("a_id", "b_id", "a_color", "b_color", "a_shape", "b_shape")
    val scored = operators.FellegiSunter.scorePairs(pairs, Seq("color", "shape"), w)
      .select("a_id", "b_id", "n_agree", "score_micro")
      .as[(Long, Long, Int, Long)].collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val (ca, cd) = wm("color"); val (sa, sd) = wm("shape")
    assert(scored((1L, 2L)) == ((2, ca + sa)))
    assert(scored((1L, 3L)) == ((1, cd + sa)))
    assert(scored((1L, 4L)) == ((1, ca + sd)))
  }

  test("fs: null-safe agreement — null matches null, not a value") {
    val w = operators.FellegiSunter.fieldWeights(recs, Seq("color"))
    val pairs = Seq(
      (1L, 2L, None: Option[String], None: Option[String]),
      (1L, 3L, Some("red"), None: Option[String]))
      .toDF("a_id", "b_id", "a_color", "b_color")
    val n = operators.FellegiSunter.scorePairs(pairs, Seq("color"), w)
      .select("a_id", "b_id", "n_agree")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(n((1L, 2L)) == 1 && n((1L, 3L)) == 0)
  }

  test("fs: degenerate m priors refuse at the door") {
    intercept[IllegalArgumentException] {
      operators.FellegiSunter.fieldWeights(recs, Seq("color"), mNum = 20L, mDen = 20L)
    }
    intercept[IllegalArgumentException] {
      operators.FellegiSunter.fieldWeights(recs, Nil)
    }
  }
}
