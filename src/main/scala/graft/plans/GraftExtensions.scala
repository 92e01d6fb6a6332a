package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering the graft native expressions so they are
  * callable from SQL and via `call_function` (the (c) tier:
  * SparkSessionExtensions). Install with
  * `.withExtensions(new GraftExtensions)` at session build time, or call
  * [[GraftExtensions.ensureRegistered]] on an existing session (operators
  * do this on entry so they work under any driver-created session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.dotI8Function)
    ext.injectFunction(GraftExtensions.topKFunction)
    ext.injectFunction(GraftExtensions.hllFunction)
    ext.injectFunction(GraftExtensions.cappedCollectFunction)
    ext.injectFunction(GraftExtensions.simhashFunction)
    ext.injectFunction(GraftExtensions.tdigestFunction)
    ext.injectFunction(GraftExtensions.bottomKFunction)
    ext.injectFunction(GraftExtensions.bloomFunction)
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewriteIntersectOverlap)
    ext.injectOptimizerRule(_ => PushAggThroughJoin)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** graft_dot_i8(a, b) — int8 dot product (quantized ANN kernel). */
  val dotI8Function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot_i8"),
    new ExpressionInfo(classOf[IntDotProduct].getName, "graft_dot_i8"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot_i8 takes exactly 2 arguments")
      IntDotProduct(children.head, children(1))
    })

  /** graft_top_k(col, k[, capacity]) — Space-Saving heavy hitters. */
  val topKFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_top_k"),
    new ExpressionInfo(classOf[SpaceSavingTopK].getName, "graft_top_k"),
    (children: Seq[Expression]) => {
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"graft_top_k $what must be an int literal, got $other")
      }
      children match {
        case Seq(c, k) =>
          val kk = intLit(k, "k"); SpaceSavingTopK(c, kk, math.max(kk * 4, 64)).toAggregateExpression()
        case Seq(c, k, cap) =>
          SpaceSavingTopK(c, intLit(k, "k"), intLit(cap, "capacity")).toAggregateExpression()
        case _ => throw new IllegalArgumentException("graft_top_k takes (col, k[, capacity])")
      }
    })

  /** graft_capped_collect(idCol, capPlus1) — bounded-buffer id collector. */
  val cappedCollectFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_capped_collect"),
    new ExpressionInfo(classOf[CappedCollect].getName, "graft_capped_collect"),
    (children: Seq[Expression]) => children match {
      case Seq(c, Literal(cap: Int, _)) => CappedCollect(c, cap).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_capped_collect takes (col, capPlus1: int literal)")
    })

  /** graft_simhash(hvCol, bits) — single-buffer SimHash fold. */
  val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash"),
    (children: Seq[Expression]) => children match {
      case Seq(c, Literal(bits: Int, _)) => SimhashAgg(c, bits).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_simhash takes (hvCol, bits: int literal)")
    })

  /** graft_tdigest(col, p...) — t-digest quantile estimates. */
  val tdigestFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_tdigest"),
    new ExpressionInfo(classOf[TDigestAgg].getName, "graft_tdigest"),
    (children: Seq[Expression]) => {
      require(children.size >= 2, "graft_tdigest takes (col, p1[, p2, ...])")
      // SQL-text percentiles parse as DecimalType literals carrying
      // o.a.s.sql.types.Decimal (graft_tdigest(x, 0.5)); integer literals
      // (graft_tdigest(x, 1)) are also valid quantile spellings.
      val ps = children.tail.map {
        case Literal(p: Double, _) => p
        case Literal(p: Float, _) => p.toDouble
        case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
        case Literal(i: Int, _) => i.toDouble
        case Literal(l: Long, _) => l.toDouble
        case other => throw new IllegalArgumentException(
          s"graft_tdigest percentiles must be numeric literals, got $other")
      }
      TDigestAgg(children.head, ps).toAggregateExpression()
    })

  /** graft_bottom_k(keyCol, payloadCol, k[, desc]) — k smallest (or, with
    * desc = true, largest) (key, payload) pairs per group over any
    * orderable key/payload types: the one-shuffle coordinated-sampling
    * and grouped-top-k kernel. */
  val bottomKFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bottom_k"),
    new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottom_k"),
    (children: Seq[Expression]) => children match {
      case Seq(key, payload, Literal(k: Int, _)) =>
        BottomKAgg(key, payload, k).toAggregateExpression()
      case Seq(key, payload, Literal(k: Int, _), Literal(desc: Boolean, _)) =>
        BottomKAgg(key, payload, k, desc).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_bottom_k takes (keyCol, payloadCol, k: int literal[, desc: boolean literal])")
    })

  /** graft_bloom(hash60Col, bits, k) — deterministic Bloom filter word
    * array (bits/64 longs, elementwise-OR mergeable). */
  val bloomFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom"),
    new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom"),
    (children: Seq[Expression]) => children match {
      case Seq(c, Literal(bits: Int, _), Literal(k: Int, _)) =>
        BloomAgg(c, bits, k).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "graft_bloom takes (hash60Col, bits: int literal, k: int literal)")
    })

  /** graft_hll(hash60Col) — HyperLogLog register array (64 ints). */
  val hllFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hll"),
    new ExpressionInfo(classOf[HllRegisters].getName, "graft_hll"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_hll takes exactly 1 argument (a 60-bit hash column)")
      HllRegisters(children.head).toAggregateExpression()
    })

  /** Idempotent late registration into an already-built session: the
    * graft_dot function plus the HOF-dot rewrite rule (via the public
    * `experimental.extraOptimizations` hook, since extensions can only be
    * installed at session build time). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("graft_dot"))) {
      registry.registerFunction(dotFunction._1, dotFunction._2, dotFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_dot_i8"))) {
      registry.registerFunction(dotI8Function._1, dotI8Function._2, dotI8Function._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_top_k"))) {
      registry.registerFunction(topKFunction._1, topKFunction._2, topKFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_hll"))) {
      registry.registerFunction(hllFunction._1, hllFunction._2, hllFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_capped_collect"))) {
      registry.registerFunction(
        cappedCollectFunction._1, cappedCollectFunction._2, cappedCollectFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_simhash"))) {
      registry.registerFunction(simhashFunction._1, simhashFunction._2, simhashFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_tdigest"))) {
      registry.registerFunction(tdigestFunction._1, tdigestFunction._2, tdigestFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_bottom_k"))) {
      registry.registerFunction(bottomKFunction._1, bottomKFunction._2, bottomKFunction._3)
    }
    if (!registry.functionExists(FunctionIdentifier("graft_bloom"))) {
      registry.registerFunction(bloomFunction._1, bloomFunction._2, bloomFunction._3)
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteIntersectOverlap)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteIntersectOverlap
    }
    if (!spark.experimental.extraOptimizations.contains(PushAggThroughJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushAggThroughJoin
    }
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }
}
