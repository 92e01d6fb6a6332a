package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events`' schema-adaptive `ts` decode against BOTH parquet
  * encodings the driver has shipped across rounds:
  *
  *  - nanos-since-epoch `LongType` (parquet TIMESTAMP(NANOS) surfaced
  *    under `spark.sql.legacy.parquet.nanosAsLong=true`), and
  *  - `timestamp[us]` / TIMESTAMP_NTZ (the current testdata).
  *
  * The r7 regression: the loader hardcoded the nanos decode and every
  * events query died at analysis when the driver regenerated the data as
  * micros. This spec writes the SAME instants in both encodings and
  * asserts the loader yields identical TimestampType values, identical
  * `date_format` strings, and identical `window()` bucketing — i.e. the
  * downstream oracle-visible semantics (q34/q39/q42-q44) are
  * encoding-invariant. Session TZ is pinned UTC, so the NTZ branch is
  * value-preserving by construction.
  */
class TimestampCodecSpec extends SparkSpec {

  // Instants chosen to exercise window/date boundaries: midnight, an
  // hour boundary minus 1us, mid-hour, and a sub-millisecond value.
  private val micros = Seq(
    1704067200000000L, // 2024-01-01 00:00:00
    1704070799999999L, // 2024-01-01 00:59:59.999999
    1704072630500000L, // 2024-01-01 01:30:30.5
    1710000000123456L) // 2024-03-09 16:00:00.123456

  private def writeBoth(): (String, String) = {
    val s = spark
    import s.implicits._
    val base = graft.Q.scratchDir("ts_codec")
    val nanosDir = s"$base/nanos"
    val microsDir = s"$base/micros"
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, "view", 1.0, "{}")
    }
    // Encoding 1: ts as raw nanos long (what nanosAsLong mode surfaces).
    // The +789ns tail gives every value a non-zero sub-microsecond
    // remainder, so the decode-equality asserts below really exercise
    // truncation (not rounding) on the nanos path.
    rows.map { case (id, us, uid, et, v, p) => (id, us * 1000L + 789L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // Encoding 2: ts as TIMESTAMP_NTZ micros (the current testdata shape).
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    (nanosDir, microsDir)
  }

  test("events loader decodes nanos-long and timestamp[us] to identical instants") {
    val (nanosDir, microsDir) = writeBoth()
    // Pre-condition: the two dirs really carry the two distinct encodings.
    assert(spark.read.parquet(s"$nanosDir/events.parquet").schema("ts").dataType === LongType)
    assert(spark.read.parquet(s"$microsDir/events.parquet").schema("ts").dataType
      .isInstanceOf[TimestampNTZType.type])

    def decoded(dir: String): Seq[(Long, Long, String)] =
      Tables.events(spark, dir)
        .select(col("event_id"),
          unix_micros(col("ts")).as("us"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("fmt"))
        .orderBy("event_id")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val a = decoded(nanosDir)
    val b = decoded(microsDir)
    assert(a === b, "nanos-long vs timestamp[us] decode diverged")
    assert(a.map(_._2) === micros, "decoded micros differ from the written instants")
    // Both branches must yield session-TZ TimestampType (oracle parity for
    // date_format / window / casts).
    Seq(nanosDir, microsDir).foreach { d =>
      assert(Tables.events(spark, d).schema("ts").dataType === TimestampType)
    }
  }

  test("long ts columns decide their epoch unit once per load, by magnitude") {
    val s = spark
    import s.implicits._
    val base = graft.Q.scratchDir("ts_unit")
    def write(name: String, f: Long => Long): String = {
      val dir = s"$base/$name"
      micros.zipWithIndex.map { case (us, i) =>
        (i.toLong, f(us), i.toLong % 2, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val nanosDir = write("nanos", _ * 1000L)
    val microsDir = write("micros", identity)
    val millisDir = write("millis", _ / 1000L)
    val secondsDir = write("seconds", _ / 1000000L)
    def fmt(dir: String): Seq[String] =
      Tables.events(spark, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy("event_id").collect().map(_.getString(0)).toSeq
    // Sub-second precision is lost by coarser source units; second-level
    // rendering must agree across all four (truncation toward the epoch).
    val expected = fmt(microsDir)
    assert(fmt(nanosDir) === expected)
    assert(fmt(millisDir) === expected)
    assert(fmt(secondsDir) === expected)
  }

  test("window() and date arithmetic agree across encodings") {
    val (nanosDir, microsDir) = writeBoth()
    def buckets(dir: String): Seq[(String, Long)] =
      Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"), col("cnt"))
        .orderBy("ws")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val a = buckets(nanosDir)
    val b = buckets(microsDir)
    assert(a === b)
    // The 00:59:59.999999 event must land in the 00:00 bucket with the
    // midnight event — truncation semantics, not rounding.
    assert(a.head === ("2024-01-01 00:00:00", 2L))
  }

  private def writeLongTs(name: String, values: Seq[Long]): String = {
    val s = spark
    import s.implicits._
    val dir = graft.Q.scratchDir(s"ts_$name")
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong, v, i.toLong % 2, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("mixed-unit long ts columns fail loudly instead of decoding per row") {
    // One value that reads as micros (2024) next to one that reads as
    // nanos (2024): a per-row decode would silently mix units within one
    // load; the per-load decision must refuse with a named error.
    val dir = writeLongTs("mixed", Seq(1704067200000000L, 1704067200000000000L))
    val e = intercept[IllegalStateException] {
      Tables.events(spark, dir).collect()
    }
    assert(e.getMessage.contains("straddle"), e.getMessage)
  }

  test("long ts outside the unambiguous [1973, 2281) band fails loudly") {
    // 1971-01-01 as micros (~3.15e13) sits in the blind band: its
    // magnitude says "micros" but a 1971 micros value is also a
    // plausible 2970-era millis value. The documented contract is to
    // refuse loudly, never silently mis-decode.
    val dir = writeLongTs("oob", Seq(31536000000000L))
    val e = intercept[IllegalStateException] {
      Tables.events(spark, dir).collect()
    }
    assert(e.getMessage.contains("1973"), e.getMessage)
  }

  test("nanos values with a sub-microsecond remainder truncate, not round") {
    // ...456999 ns must decode to ...456 us even though .999 would round up.
    val dir = writeLongTs("trunc", Seq(1710000000123456999L))
    val got = Tables.events(spark, dir)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === 1710000000123456L)
  }

  test("live testdata events load analyzes and carries TimestampType ts") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
