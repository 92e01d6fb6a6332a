package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent table content digest — the anti-entropy primitive
  * for "are these two replicas/snapshots byte-identical, and if not how
  * big is the diff": every row is canonically rendered, hashed with the
  * engine-portable [[graft.functions.GraftFunctions.hash60]] (md5-based,
  * so ANY engine that has md5 — DuckDB, Trino, Postgres — reproduces the
  * digest bit-for-bit), and reduced with ORDER-FREE aggregates, so two
  * tables with the same multiset of rows digest equal regardless of
  * partitioning, sort order, or engine.
  *
  * Two complementary reducers (both needed, both overflow-free at any
  * row count):
  *  - `xor_digest` = bit_xor of the 60-bit row hashes — detects any
  *    odd-multiplicity row difference; the standard XOR-fold caveat is
  *    that an EVEN number of copies of the same row cancels,
  *  - `modsum_digest` = Σ (h mod 1000003) — catches exactly those
  *    even-multiplicity changes (duplicating a row twice, dropping two
  *    copies); partial sums stay < n·10^6, inside a long to ~9·10^12
  *    rows (≫ the 100 TB design point's row count per digested slice).
  *
  * Scale shape: one scan, one partial-agg'd reduction to a single row —
  * no shuffle wider than the 3-column totals, trivially correct under
  * any partitioning.
  *
  * Column-type contract (refuse-loudly): only types whose string
  * rendering is engine-portable are allowed — integrals, strings,
  * booleans, dates. Floats/doubles (shortest-roundtrip formatting
  * differs by engine), timestamps (timezone rendering), and
  * decimals/binary/nested types must be cast caller-side to an exact
  * portable form first (e.g. `floor(price*100)::BIGINT`,
  * `to_date(ts)`). NULL renders as the U+0001 sentinel (distinct from the empty
  * string); columns join with the U+0002 separator so ("ab","c") ≠ ("a","bc").
  */
object TableDigest {

  private val portable: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, StringType, BooleanType, DateType)

  /** The canonical per-row hash column `h` (the digest's map side,
    * exposed separately so a STREAMING job can compute the identical
    * digest — the reducers below are associative and commutative, so a
    * Complete-mode streamed aggregate over these hashes is bit-identical
    * to the batch digest). Keeps any extra columns of `df` (replay-split
    * keys etc.). */
  def rowHashes(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "[table-digest] no columns given")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(portable.contains(dt),
        s"[table-digest] column $c has non-portable type ${dt.simpleString}: " +
          "cast to an exact engine-portable type first (floored integer grid " +
          "for floats/decimals, to_date for timestamps)")
    }
    val canon = concat_ws("\u0002",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*)
    df.withColumn("h", graft.functions.GraftFunctions.hash60(canon))
  }

  /** The digest's reduce side over a [[rowHashes]] frame. */
  def digestOfHashes(hashes: DataFrame, label: String): DataFrame =
    hashes
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_digest"),
        coalesce(sum(col("h") % 1000003L), lit(0L)).as("modsum_digest"))
      .select(lit(label).as("label"), col("n_rows"), col("xor_digest"),
        col("modsum_digest"))

  /** One digest row `(label, n_rows, xor_digest, modsum_digest)` over
    * `cols` of `df`. */
  def digest(df: DataFrame, cols: Seq[String], label: String): DataFrame =
    digestOfHashes(rowHashes(df, cols).select("h"), label)

  /** Per-slice digests `(label, g, n_rows, xor_digest, modsum_digest)` —
    * the DRILLDOWN half of the anti-entropy check: once [[digest]] says
    * two replicas differ, digesting each `groupCol` slice localizes
    * WHICH slices moved without shipping any rows (compare the two
    * bounded digest frames on g), then only the mismatched slices need a
    * row-level diff — the standard divide-and-sync narrowing, one level
    * deep. Same portability/reducer contract as [[digest]]; `groupCol`
    * must itself be portable-typed (it keys the cross-engine compare).
    * One scan, one partial-agg'd shuffle on the group key. */
  def digestBy(df: DataFrame, cols: Seq[String], groupCol: String, label: String): DataFrame = {
    val gt = df.schema(groupCol).dataType
    require(portable.contains(gt),
      s"[table-digest] group column $groupCol has non-portable type ${gt.simpleString}")
    rowHashes(df, cols)
      .groupBy(col(groupCol).as("g"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_digest"),
        coalesce(sum(col("h") % 1000003L), lit(0L)).as("modsum_digest"))
      .select(lit(label).as("label"), col("g"), col("n_rows"),
        col("xor_digest"), col("modsum_digest"))
  }
}
