package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev measurement for the q96 rising-exponent question (r13 verdict
  * #3): the LSH candidate-pair count vs replica factor, DECOMPOSED into
  * cross-original pairs (what the plan's scaling is responsible for)
  * and same-original pairs (replicas of one source vector — ScaleGen
  * jitters embedding replicas by ±0.0005 on one component, so all f
  * replicas of a vector keep identical hyperplane signs, share a
  * bucket, and contribute C(f,2) candidate pairs per original BY
  * GENERATOR CONSTRUCTION; they are also genuine cos≈0.9999 near-dup
  * OUTPUT rows, the vector-tier analog of the verbatim-text artifact
  * the r9 document mutation removed). The original id of a replica is
  * vec_id % 10^8 (ScaleGen's key stride).
  *
  * Prints one JSON line per dir: n, adaptive plane count, candidate
  * pairs total / same-original / cross-original.
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/tmp/sf1x", "/tmp/sf3x", "/tmp/sf10x")
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val v0 = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          graft.functions.GraftFunctions.asDouble(col("embedding")).as("vec"))
      val n = v0.count()
      val np = Similarity.adaptivePlanes(n)
      val planes = Similarity.hyperplanes(np, 64)
      // the exact candidate frame of Similarity.cosinePairsLsh
      val v = v0.select(col("vec_id").as("__id"),
        Similarity.lshBucket(col("vec"), planes).as("__bucket"))
      val masks = 0 +: planes.indices.map(1 << _)
      val probes = v.select(col("__id").as("a"),
        explode(array(masks.map(m => col("__bucket").bitwiseXOR(lit(m))): _*)).as("__bucket"))
      val others = v.select(col("__id").as("b"), col("__bucket"))
      val cand = probes.join(others, "__bucket")
        .filter(col("a") < col("b"))
        .select("a", "b")
        .distinct()
      val agg = cand.agg(
        count(lit(1)).as("total"),
        sum(when(col("a") % 100000000L === col("b") % 100000000L, 1L)
          .otherwise(0L)).as("same_orig")).head
      val total = agg.getLong(0)
      val same = agg.getLong(1)
      println(s"""{"dir":"$dir","n":$n,"planes":$np,"cand_total":$total,""" +
        s""""cand_same_original":$same,"cand_cross_original":${total - same}}""")
    }
    spark.stop()
  }
}
