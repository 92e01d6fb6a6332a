package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exact prefix (running) sums under a total order — the
  * cumulative-count engine behind the KS drift test and the exact
  * ROC-AUC in [[EvalMetrics]].
  *
  * A naive `Window.orderBy(v)` cumulative sum funnels the WHOLE frame
  * through one partition — the single-partition-window scale-killer this
  * codebase bans. Instead: range-repartition on the order key, run a
  * partition-local accumulator, and shift partition i by the totals of
  * partitions 0..i-1. The per-partition totals are one bounded collect
  * (one row per shuffle partition) — the same repartitionByRange +
  * broadcast-offset idiom as [[Blocking.globalRank]], and like it the one
  * place an RDD drop-down is legitimate: a sequential running state under
  * a distributed total order has no columnar equivalent.
  *
  * Skew contract: the range partitioner cannot split EQUAL order-key
  * values across partitions, so a single dominant duplicate key (say 40%
  * of all rows) funnels its whole run into one partition. Results stay
  * correct, but that partition becomes the straggler. The fix belongs to
  * the caller — group to per-distinct-key counts first (exactly what
  * [[EvalMetrics]] does, making its inputs duplicate-free) or extend the
  * order with a unique tiebreaker column. Pass 1 measures per-partition
  * row counts anyway, so the operator detects the condition for free and
  * warns loudly ([[skewWarning]]) instead of silently straggling.
  */
object PrefixSum {

  /** Driver-side skew check over pass-1 partition row counts: warn when
    * one partition holds >4x its fair share AND enough rows to matter
    * (`minRows`; partitions below it finish fast regardless). Pure
    * function so the threshold logic is unit-testable. */
  private[graft] def skewWarning(
      counts: Seq[Long], minRows: Long = 4L * 1024 * 1024): Option[String] = {
    val n = counts.sum
    val mx = if (counts.isEmpty) 0L else counts.max
    if (counts.length > 1 && mx >= minRows && mx * counts.length > 4L * n)
      Some(s"[prefix-sum] skewed order key: one partition holds $mx of $n rows " +
        s"across ${counts.length} partitions — equal order-key values cannot be " +
        "split by the range exchange; group to distinct keys first (the " +
        "EvalMetrics pattern) or extend the order with a unique tiebreaker")
    else None
  }

  /** Append running-total columns `c_<name>` (inclusive of the current
    * row) for each non-null LongType column in `sumCols`, ordered by the
    * total order `order`. Rows pass through otherwise unchanged. The
    * sorted frame is persisted (via [[graft.Q.persistOnce]]) because the
    * totals pass and the output pass both read it.
    */
  def runningSums(df: DataFrame, order: Seq[Column], sumCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = graft.Q.persistOnce(
      df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*))
    val idxs = sumCols.map(sorted.schema.fieldIndex).toArray
    val names = sumCols.toArray
    sumCols.foreach { c =>
      require(sorted.schema(c).dataType == LongType, s"runningSums needs LongType, got ${sorted.schema(c).dataType} for $c")
    }
    val rdd = sorted.rdd
    // Pass 1: per-partition totals (emits exactly one row per partition,
    // including empty ones — the collect is bounded by the partition
    // count) plus row counts for the skew check. The non-null half of the
    // contract is enforced HERE, per cell: Row.getLong would silently
    // unbox a null to 0L and corrupt every downstream cumulative count.
    val perPart: Map[Int, (Long, Array[Long])] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Long](idxs.length)
      var nRows = 0L
      it.foreach { r =>
        var k = 0
        while (k < idxs.length) {
          if (r.isNullAt(idxs(k)))
            throw new IllegalArgumentException(
              s"[prefix-sum] null in sum column '${names(k)}' — runningSums needs " +
                "non-null LongType (a null would silently accumulate as 0)")
          acc(k) += r.getLong(idxs(k)); k += 1
        }
        nRows += 1
      }
      Iterator((pid, (nRows, acc)))
    }.collect().toMap
    skewWarning(perPart.toSeq.sortBy(_._1).map(_._2._1)).foreach(System.err.println)
    // Exclusive prefix over partition ids = each partition's starting offset.
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Array[Long]](nParts)
    val run = new Array[Long](idxs.length)
    var p = 0
    while (p < nParts) {
      offsets(p) = run.clone()
      val t = perPart(p)._2
      var k = 0
      while (k < idxs.length) { run(k) += t(k); k += 1 }
      p += 1
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields ++
      sumCols.map(c => StructField(s"c_$c", LongType, nullable = false)))
    // Pass 2: partition-local running sums shifted by the broadcast offset.
    spark.createDataFrame(
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = bc.value(pid).clone()
        it.map { r =>
          var k = 0
          while (k < idxs.length) { acc(k) += r.getLong(idxs(k)); k += 1 }
          Row.fromSeq(r.toSeq ++ acc.toSeq)
        }
      }, outSchema)
  }
}
