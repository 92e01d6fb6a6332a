package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md B13): for every left row, attach the latest right
  * row with `rightTime <= leftTime` within the same key group — plus the
  * pandas-merge_asof direction/tolerance surface ("forward" = earliest
  * `rightTime >= leftTime`, "nearest" = smaller |Δt| with backward ties,
  * optional max-|Δt| tolerance).
  *
  * Implementation is the union+window formulation, not a pair join:
  * both sides are tagged and unioned, then a single
  * `last(<right cols>, ignoreNulls) OVER (PARTITION BY keys ORDER BY t,
  * side ROWS UNBOUNDED PRECEDING)` carries the most recent right values
  * forward onto left rows. Right rows sort before left rows at equal
  * timestamps, giving inclusive (<=) semantics.
  *
  * Scale: one shuffle per side on the join keys, then a linear scan per
  * key partition — no candidate-pair blowup, no range self-join. Skewed
  * keys can be salted upstream; state per key is O(1).
  */
object AsOfJoin {

  /** Native path: plans through [[graft.plans.AsOfJoinNode]] into the
    * custom sort-merge [[graft.plans.AsOfJoinExec]] (one shuffle + sort
    * per side, O(1) merge state — vs the union+window formulation below,
    * which pays a wider union shuffle and window buffering). Output is
    * left.* ++ right.* (rename clashing right columns beforehand);
    * unmatched left rows null-fill the right side.
    */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime))
    org.apache.spark.sql.classic.GraftBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }

  /** @param left       rows to enrich; all its columns are preserved
    * @param right      lookup stream
    * @param keys       equality key columns present on both sides
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param rightVals  columns of `right` to carry onto matches (renamed as-is)
    * @param direction  "backward" (latest right with rt <= lt — the
    *                   default, pandas merge_asof parity), "forward"
    *                   (earliest right with rt >= lt), or "nearest"
    *                   (smaller |rt - lt|; ties go backward)
    * @param tolerance  max |rt - lt| for a match to count, in the time
    *                   column's numeric units (seconds for timestamps —
    *                   distances compare via a double cast, so numeric
    *                   and timestamp time columns are both supported)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")

    // All carried right columns travel as ONE struct: the struct is
    // non-null exactly on right rows, so last/first(ignoreNulls) carries
    // the nearest *row* even when its member values are NULL — a
    // per-column carry would skip a null-valued match and leak an older
    // row's value, and couldn't distinguish "no match" from "matched row
    // with null value". The matched right time rides along as "__rt" so
    // tolerance and nearest-distance apply post-carry. One window
    // expression per direction instead of N is also cheaper to evaluate.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(rightTime).dataType))

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select((keys.map(col) :+ col("__t") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select((keys.map(col) :+ col("__t") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(rightVals.map(c => col(c).as(c)) :+ col(rightTime).as("__rt"): _*).as("__r"): _*)

    // Backward scans the preceding frame with right rows (side 0) sorting
    // BEFORE equal-time left rows, so rt == lt is included; forward scans
    // the following frame with the side order flipped (desc), so equal-
    // time right rows land at-or-after the left row there too.
    //
    // Total order: two RIGHT rows sharing (key, t) would otherwise sort in
    // partition-layout order, making the carried struct flip run-to-run.
    // The carried struct itself is the final sort key (left rows are all
    // null there and mutually interchangeable — they contribute nothing
    // to the ignoreNulls carry), so duplicate right timestamps resolve
    // deterministically: greatest struct for backward/nearest-ties
    // (`last` of the frame), least for forward (`first`). Structs with
    // unorderable members (e.g. maps) keep the old contract: callers
    // must ensure (key, rightTime) uniqueness there.
    val tieKey: Seq[Column] =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rStructType))
        Seq(col("__r").asc)
      else Seq.empty
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__side").asc +: tieKey: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__side").desc +: tieKey: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def dist(s: Column): Column =
      abs(col("__t").cast("double") - s.getField("__rt").cast("double"))
    def withinTol(s: Column): Column = tolerance match {
      case Some(tol) => when(s.isNotNull && dist(s) <= tol, s)
      case None => s
    }

    val unioned = l.unionByName(r)
    val carried = direction match {
      case "backward" => unioned
        .withColumn("__asof", withinTol(last(col("__r"), ignoreNulls = true).over(wB)))
      case "forward" => unioned
        .withColumn("__asof", withinTol(first(col("__r"), ignoreNulls = true).over(wF)))
      case "nearest" => unioned
        .withColumn("__b", withinTol(last(col("__r"), ignoreNulls = true).over(wB)))
        .withColumn("__f", withinTol(first(col("__r"), ignoreNulls = true).over(wF)))
        .withColumn("__asof",
          when(col("__b").isNull, col("__f"))
            .when(col("__f").isNull, col("__b"))
            .when(dist(col("__f")) < dist(col("__b")), col("__f"))
            .otherwise(col("__b"))) // tie -> backward
    }
    carried
      .filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        rightVals.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
