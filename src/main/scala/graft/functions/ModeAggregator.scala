package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact mode UDAF (SURVEY.md B40): most frequent string value, ties
  * broken by lexicographic minimum so the result is deterministic.
  *
  * Buffer is a value->count map; merge is additive, so partial aggregation
  * (map-side combine) applies — the shuffle carries one map per group per
  * partition, not raw rows. For bounded-cardinality columns (grades,
  * priorities, commodities) the buffer stays tiny at any scale.
  */
class ModeAggregator extends Aggregator[String, Map[String, Long], String] {
  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) buf else buf.updated(v, buf.getOrElse(v, 0L) + 1L)

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n) }

  def finish(buf: Map[String, Long]): String =
    if (buf.isEmpty) null
    else buf.minBy { case (v, n) => (-n, v) }._1

  def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[String] = Encoders.STRING
}
