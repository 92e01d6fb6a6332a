package graft

import org.apache.spark.sql.functions._

/** Pins the Catalyst behavior the repo-wide Guards idiom depends on:
  * a guard only fires if it rides a column the query CONSUMES — a
  * standalone guard column is pruned by the optimizer and never
  * evaluates. If a Spark upgrade ever changes column pruning around
  * conditional raise_error, this suite flags it before a silently
  * dead guard ships.
  */
class GuardsSpec extends SparkSpec {
  import graft.operators.Guards

  test("a guard riding a consumed column fires on violation, passes values through otherwise") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("x")
    // all-pass: values flow through unchanged
    val ok = df.select(Guards(col("x") > 0L, col("x") * 10L,
      Guards.msg("guards-spec", lit("x="), col("x").cast("string"))).as("y"))
      .as[Long].collect().sorted
    assert(ok.toSeq == Seq(10L, 20L, 30L))
    // one violating row: the job fails loudly with the tagged message
    val err = intercept[Exception] {
      df.select(Guards(col("x") > 1L, col("x"),
        Guards.msg("guards-spec", lit("x="), col("x").cast("string"))).as("y"))
        .collect()
    }
    def chain(t: Throwable): String = if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(err).contains("[guards-spec] x=1"), chain(err).take(300))
  }

  test("a standalone guard column is PRUNED and never evaluates (why guards must ride consumed columns)") {
    import spark.implicits._
    // a scan-backed frame and a data-dependent condition: with a local
    // relation + constant condition the optimizer constant-folds and
    // eagerly evaluates the projection instead (ConvertToLocalRelation),
    // which is not the production shape the rule is about
    val df = Tables.region(spark, "/root/testdata/sf0.001")
    // the guard column "g" violates on every row of this data, but
    // nothing consumes it — Catalyst prunes it and the query succeeds.
    // This is the failure mode the Guards scaladoc forbids; pinning it
    // keeps the rule honest rather than folklore.
    val out = df
      .withColumn("g", Guards(col("r_regionkey") < -1L, col("r_regionkey"),
        "[guards-spec] must never evaluate"))
      .select(col("r_regionkey"))
      .as[Long].collect()
    assert(out.length == 5, s"region rows: ${out.length}")
  }

  test("lnMicronatFloor: boundary-adjacent values refuse loudly; num=den is exact 0; passed floors match the raw formula") {
    import spark.implicits._
    def chain(t: Throwable): String = if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    // widened eps (absEps = 0.6 > the max possible 0.5 distance to the
    // grid): EVERY off-grid value is "boundary-adjacent" and must refuse
    // with the tagged message — constructing a genuine sub-4e-15 case
    // would need a 10^14-point search, so the spec pins the refusal path
    // through the injectable threshold instead
    val off = Seq((3L, 7L)).toDF("num", "den")
    val err = intercept[Exception] {
      off.select(Guards.lnMicronatFloor(col("num"), col("den"), "ln-spec",
        relEps = 0.0, absEps = 0.6).as("v")).collect()
    }
    assert(chain(err).contains("[ln-spec]"), chain(err).take(300))
    assert(chain(err).contains("floor boundary"), chain(err).take(300))
    // num = den is whitelisted even under the widened eps: ln(1) = 0 is
    // EXACT in every IEEE libm, so s = 0 is boundary-exact, not adjacent
    val one = Seq((7L, 7L)).toDF("num", "den")
      .select(Guards.lnMicronatFloor(col("num"), col("den"), "ln-spec",
        relEps = 0.0, absEps = 0.6).as("v"))
      .as[Long].collect()
    assert(one.toSeq == Seq(0L))
    // default eps: the guard is pure insurance on ordinary ratios — the
    // passed floors equal the raw formula replayed driver-side
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(200)((rnd.nextLong(1000000L) + 1L, rnd.nextLong(1000000L) + 1L))
    val got = pairs.toDF("num", "den")
      .select(col("num"), col("den"),
        Guards.lnMicronatFloor(col("num"), col("den"), "ln-spec").as("v"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    for ((n, d) <- pairs) {
      val want = math.floor(-math.log(n.toDouble / d.toDouble) * 1e6).toLong
      assert(got((n, d)) == want, s"floor($n/$d): ${got((n, d))} != $want")
    }
  }
}
