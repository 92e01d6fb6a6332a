package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the data-quality sweep every training-data
  * pipeline runs before anything else: per-column null counts, exact
  * distinct cardinalities, numeric ranges.
  *
  * Single aggregation over the table (4 expressions per column, all in
  * one HashAggregate — one scan however wide the table), then a local
  * unpivot of the 1-row result into (column, metric) form. At 100 TB the
  * exact distincts are the expensive part; swap in
  * approx_count_distinct via `exact = false` for the sketch version.
  */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val numeric: Set[DataType] = Set(IntegerType, LongType, DoubleType, FloatType, ShortType)
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        (if (exact) countDistinct(c) else approx_count_distinct(c)).as(s"${f.name}__distinct"),
        (if (numeric.contains(f.dataType)) min(c).cast(DoubleType) else lit(null).cast(DoubleType))
          .as(s"${f.name}__min"),
        (if (numeric.contains(f.dataType)) max(c).cast(DoubleType) else lit(null).cast(DoubleType))
          .as(s"${f.name}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    // stack() takes a flat value list: n rows x 6 values
    val arms = df.schema.fields.map { f =>
      s"'${f.name}', ${f.name}__rows, ${f.name}__nulls, ${f.name}__distinct, ${f.name}__min, ${f.name}__max"
    }
    wide.selectExpr(
      s"stack(${df.schema.fields.length}, ${arms.mkString(", ")}) " +
        "AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
  }
}
