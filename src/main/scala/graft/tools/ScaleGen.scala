package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up of the driver testdata: `factor` key-disjoint
  * replicas of each table, with every join key offset per replica so the
  * relational structure (order→lineitem, order→customer, lineitem→
  * supplier) replicates consistently — replica i of lineitem joins
  * replica i of orders and nobody else, exactly how a dbgen-style
  * generator grows TPC-H. Row counts scale ×factor, join fan-outs and
  * group cardinalities scale the way real growth scales them.
  *
  * Embeddings get a deterministic per-replica jitter on one component
  * (hash-derived, ±0.0005) so vector replicas are near but not bitwise
  * duplicates — an ANN probe over exact duplicates would understate
  * distance-computation cost. Documents replicate verbatim with fresh
  * doc_ids: corpus tokens scale ×factor while the vocabulary stays
  * fixed, which is precisely the Heaps-law regime the BPE scale claim is
  * about. nation/region (fixed dimension tables) copy unchanged.
  *
  * Usage: `runMain graft.tools.ScaleGen <srcSfDir> <outDir> <factor>`
  */
object ScaleGen {

  def replicate(df: DataFrame, factor: Int): DataFrame = {
    val spark = df.sparkSession
    val reps = spark.range(factor).select(col("id").cast("int").as("__rep"))
    df.crossJoin(reps)
  }

  /** Offset `keyCols` by `__rep * stride` (stride = a power of ten above
    * the key domain, so replica key ranges never collide). */
  def offsetKeys(df: DataFrame, keyCols: Seq[String], stride: Long): DataFrame =
    keyCols.foldLeft(df)((d, k) =>
      d.withColumn(k, col(k) + col("__rep").cast("long") * stride))

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Stride = 100000000L // above every key domain in the sf0.1 tables

    def write(df: DataFrame, name: String): Unit =
      df.drop("__rep").write.mode("overwrite").parquet(s"$out/$name.parquet")

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")

    // Fact tables: replicate with consistent key offsets.
    write(offsetKeys(replicate(t("lineitem"), factor),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), Stride), "lineitem")
    write(offsetKeys(replicate(t("orders"), factor),
      Seq("o_orderkey", "o_custkey"), Stride), "orders")
    write(offsetKeys(replicate(t("customer"), factor),
      Seq("c_custkey"), Stride), "customer")
    write(offsetKeys(replicate(t("supplier"), factor),
      Seq("s_suppkey"), Stride), "supplier")
    write(offsetKeys(replicate(t("part"), factor),
      Seq("p_partkey"), Stride), "part")
    write(offsetKeys(replicate(t("events"), factor),
      Seq("event_id", "user_id"), Stride), "events")
    write(offsetKeys(replicate(t("documents"), factor),
      Seq("doc_id"), Stride), "documents")

    // Embeddings: fresh ids + deterministic jitter on the first vector
    // component so replicas are near-duplicates, not duplicates.
    val emb = offsetKeys(replicate(t("embeddings"), factor), Seq("vec_id"), Stride)
      .withColumn("embedding", transform(col("embedding"), (x, i) =>
        when(i === 0,
          x + (pmod(xxhash64(col("vec_id")), lit(1000L)).cast("float") - 500f) / 1000000f)
          .otherwise(x)))
    write(emb, "embeddings")

    // Fixed dimensions: copy unchanged.
    write(t("nation").withColumn("__rep", lit(0)), "nation")
    write(t("region").withColumn("__rep", lit(0)), "region")

    println(s"SCALEGEN wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
