package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-step absorption probabilities of an empirical Markov chain on the
  * truncating integer grid — the PREDICTIVE completion of the q198
  * transition matrix: not "how often does A hand off to B" but "starting
  * from state s, what is the probability the chain REACHES the target
  * within K steps" (conversion within K clicks, escalation within K
  * hops). The absorbing read: once in the target, stay.
  *
  * Arithmetic (the PageRank/B52 posture — truncating integer division on
  * a fixed grid, replayable as SQL CTEs): transition mass t(s,s') =
  * (n(s,s')·grid) div n(s); p_0 = grid at the target, 0 elsewhere;
  * p_k(s) = grid if s is the target else (Σ_s' t(s,s')·p_{k-1}(s')) div
  * grid. Every division truncates toward zero on non-negative operands
  * in BOTH engines (Spark `div` / DuckDB `//`), so scores match to the
  * unit. Truncation slightly UNDER-estimates — the conservative side for
  * a conversion forecast.
  *
  * Scale shape: ONE corpus-scale partial-agg'd pair count feeds the
  * chain; everything after runs on the |states|²-bounded transition
  * frame (event vocabularies are small — this is the "count once,
  * iterate on the tiny model" shape, like B134's model tables). In-plan
  * Guards enforce the two int64 domains: n(s,s')·grid at the t build,
  * and out-degree ≤ 2^63/grid² at the relaxation sum (each term is ≤
  * grid², summed over ≤ deg terms).
  *
  * Input `pairs` needs (from_state, to_state, n). Returns (state, k,
  * p_grid) for k = 1..steps, all states that appear on either side.
  */
object Markov {

  def absorbWithin(pairs: DataFrame, target: String, steps: Int,
      grid: Long = 1000000L): DataFrame = {
    require(steps >= 1 && steps <= 8,
      s"Markov wants steps in [1, 8] (each step is one model-frame join), got $steps")
    require(grid >= 1000L && grid <= 1000000000L,
      s"Markov wants grid in [10^3, 10^9], got $grid")
    val kGrid = Long.MaxValue / grid
    val kDeg = Long.MaxValue / grid / grid
    val p = graft.Q.persistOnce(
      pairs.select(col("from_state"), col("to_state"), col("n").cast("long").as("n")))
    val marg = p.groupBy("from_state")
      .agg(sum("n").as("n_from"), count(lit(1)).as("deg"))
    val t = graft.Q.persistOnce(p.join(marg, "from_state")
      .withColumn("num",
        Guards(col("n") <= lit(kGrid), col("n") * lit(grid),
          Guards.msg("markov",
            lit("transition count "), col("n").cast("string"),
            lit(" wraps the x"), lit(grid.toString),
            lit(" grid past 2^63; coarsen the grid"))))
      // the degree guard rides the CONSUMED transition mass itself
      .select(col("from_state"), col("to_state"),
        Guards(col("deg") <= lit(kDeg), expr("num div n_from"),
          Guards.msg("markov",
            lit("state "), col("from_state"),
            lit(" has out-degree "), col("deg").cast("string"),
            lit(" - the relaxation sum can wrap 2^63 at this grid; "),
            lit("coarsen the grid or merge rare successors"))).as("t")))
    val states = graft.Q.persistOnce(
      t.select(col("from_state").as("state"))
        .union(t.select(col("to_state").as("state"))).distinct())
    var pk = graft.Q.persistOnce(states.withColumn("p",
      when(col("state") === target, lit(grid)).otherwise(lit(0L))))
    var out: DataFrame = null
    for (k <- 1 to steps) {
      val relax = t.join(pk.withColumnRenamed("state", "to_state"), "to_state")
        .groupBy(col("from_state").as("state"))
        .agg(expr(s"sum(t * p) div ${grid}L").as("v"))
      val next = graft.Q.persistOnce(states.join(relax, Seq("state"), "left")
        .withColumn("p",
          when(col("state") === target, lit(grid))
            .otherwise(coalesce(col("v"), lit(0L))))
        .select("state", "p"))
      val tagged = next.select(col("state"), lit(k).as("k"), col("p").as("p_grid"))
      out = if (out == null) tagged else out.unionAll(tagged)
      pk = next
    }
    out
  }
}
