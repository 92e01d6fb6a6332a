package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the full drift matrix of [[Tables]] — not just `events.ts`.
  *
  * The only thing that has ever broken a round is the driver
  * regenerating `/root/testdata` with different parquet encodings (r7:
  * TIMESTAMP(NANOS) → timestamp[us]). This spec REWRITES the live
  * sf0.001 testdata under the alternate encodings each loader claims to
  * accept and asserts representative oracle-checked queries return
  * IDENTICAL results — so the next regeneration either decodes
  * transparently or fails this suite by name, never a silent divergence:
  *
  *  - variant "containers": documents string columns as utf8 `binary`,
  *    `embeddings.embedding` as `array<double>`, `events.props` as a
  *    parquet `map<string,int>`.
  *  - variant "serialized": `embeddings.embedding` as a JSON string,
  *    `events.ts` as nanos-since-epoch long, `events.props` as utf8
  *    `binary`.
  *
  * The JSON embedding variant serializes the DOUBLE view of the floats
  * (same logical values, different physical encoding) so arithmetic
  * results are bit-comparable across variants.
  */
class DriftSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"
  private val tableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Clone the whole sf0.001 dir, rewriting each table through `rewrite`. */
  private def cloneDir(variant: String)(rewrite: (String, DataFrame) => DataFrame): String = {
    val dir = graft.Q.scratchDir(s"drift_$variant")
    tableNames.foreach { t =>
      val df = spark.read.parquet(s"$base/$t.parquet")
      rewrite(t, df).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** One probe per drifted column family: props extraction (q40/q41),
    * event-time windowing (q42), document text (q50), vector arithmetic
    * (q60). All oracle-checked, hence deterministic by contract. */
  private val probes = Seq("q40_json_extract", "q41_map_funcs",
    "q42_tumbling_window", "q50_token_stats", "q60_vector_norms")

  private def results(dir: String): Map[String, Seq[String]] =
    probes.map { n =>
      n -> QueryRegistry.byName(n).run(spark, dir).collect().map(_.toString).sorted.toSeq
    }.toMap

  private lazy val expected: Map[String, Seq[String]] = results(base)

  test("container-typed encodings (binary strings, double arrays, map props) decode identically") {
    val dir = cloneDir("containers") {
      case ("documents", df) =>
        df.withColumn("text", col("text").cast(BinaryType))
          .withColumn("lang", col("lang").cast(BinaryType))
          .withColumn("source", col("source").cast(BinaryType))
      case ("embeddings", df) =>
        df.withColumn("embedding", transform(col("embedding"), _.cast(DoubleType)))
      case ("events", df) =>
        df.withColumn("props", from_json(col("props"), MapType(StringType, IntegerType)))
      case (_, df) => df
    }
    // The map re-encode must have parsed every row — a null map would be
    // a broken VARIANT, not a loader bug.
    assert(spark.read.parquet(s"$dir/events.parquet")
      .filter(col("props").isNull).count() === 0L)
    assert(results(dir) === expected)
  }

  test("serialized encodings (json embeddings, nanos-long ts, binary props) decode identically") {
    val dir = cloneDir("serialized") {
      case ("embeddings", df) =>
        df.withColumn("embedding", to_json(transform(col("embedding"), _.cast(DoubleType))))
      case ("events", df) =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
          .withColumn("props", col("props").cast(BinaryType))
      case (_, df) => df
    }
    assert(results(dir) === expected)
  }

  test("an undecodable embedding encoding fails loudly, by name") {
    val dir = cloneDir("broken") {
      case ("embeddings", df) => df.withColumn("embedding", lit(42L))
      case (_, df) => df
    }
    val e = intercept[IllegalStateException] { Tables.embeddings(spark, dir) }
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage)
  }
}
