package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Sorting a table by one column gives perfect file-level min/max
  * pruning on that column and none on any other; interleaving the bits
  * of several range-bucketed columns gives useful pruning on ALL of them
  * at once — rows close in z-value are close in every dimension, so each
  * written file covers a small hyper-rectangle and a predicate on any
  * clustered column skips most files on footer stats alone (the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` layout, as plain Spark).
  *
  * Everything is scan-stage column arithmetic: bucket each dimension to
  * `bits` bits (fixed-width over a [min, max] frame, or quantile
  * boundaries for skew robustness — boundaries are 2^bits scalars per
  * column, k-means-style bounded driver metadata), interleave with
  * shift/or, then `repartitionByRange` on the z-value and sort within
  * partitions. One range shuffle total — the same cost as the
  * single-column sort it replaces.
  */
object Layout {

  /** Fixed-width bucket of `c` into [0, 2^bits) over [lo, hi] (clamped;
    * integer arithmetic, so cross-engine exact for integer frames). */
  def widthBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val n = 1L << bits
    val span = hi - lo + 1
    least(lit(n - 1), greatest(lit(0L),
      ((c.cast("long") - lo) * n / span).cast("long")))
  }

  /** Morton interleave of pre-bucketed dims (each already in
    * [0, 2^bits)): bit i of dim d lands at position i*dims.length + d.
    * Pure shift/or column expression — codegen-resident, no UDF. */
  def zvalue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.size <= 62,
      s"need 1+ dims and bits*dims <= 62, got ${dims.size} dims x $bits bits")
    val terms = for {
      i <- 0 until bits
      (d, di) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * dims.size + di)
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Cluster `df` into `numFiles` z-ordered output partitions over the
    * given (column, frame lo, frame hi) dimensions. Write the result
    * with any parquet sink; each file then covers a tight range of every
    * clustered column. */
  def zorder(
      df: DataFrame,
      dims: Seq[(String, Long, Long)],
      numFiles: Int,
      bits: Int = 8): DataFrame = {
    val z = zvalue(dims.map { case (c, lo, hi) => widthBucket(col(c), lo, hi, bits) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
