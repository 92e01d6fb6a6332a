package graft

import org.apache.spark.sql.functions._

import graft.examples.CurationDemo
import graft.functions.GraftFunctions.tokens
import graft.operators.Dedup

/** End-to-end invariants of the composed curation pipeline — the stages
  * are individually oracle-checked; this pins their composition. */
class CurationDemoSpec extends SparkSpec {

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001").cache()

  test("curation output is bounded, non-empty, and shard/rank-valid") {
    val out = CurationDemo.curate(docs).cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    val stats = out.agg(
      min("shard").as("smin"), max("shard").as("smax"),
      max("rk").as("rkmax"), countDistinct("doc_id").as("ids")).head()
    assert(stats.getAs[Int]("smin") >= 0 && stats.getAs[Int]("smax") < 8)
    assert(stats.getAs[Int]("rkmax") <= 50)
    assert(stats.getAs[Long]("ids") === n, "doc_ids must be unique")
    out.unpersist()
  }

  test("no two surviving docs share a fingerprint or an LSH candidate pair") {
    val out = CurationDemo.curate(docs).cache()
    val fps = out.select(
      md5(concat_ws(" ", tokens(lower(col("text"))))).as("fp"))
    assert(fps.count() === fps.distinct().count(), "exact dup survived")
    // recompute the candidate pairs the pipeline deduped on; no pair may
    // have BOTH endpoints in the curated output
    val index = Dedup.shingleIndex(docs, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignatures(index, "doc_id", numHashes = 32)
    val bands = Dedup.lshBands(sig, "doc_id", bands = 8, rows = 4)
    val pairs = Dedup.lshCandidates(bands, "doc_id")
    val ids = out.select(col("doc_id")).cache()
    val surviving = pairs
      .join(ids.withColumnRenamed("doc_id", "a"), "a")
      .join(ids.withColumnRenamed("doc_id", "b"), "b")
      .count()
    assert(surviving === 0, s"$surviving near-dup pairs survived curation")
    ids.unpersist(); out.unpersist()
  }

  test("curation is deterministic run-to-run and seed-sensitive") {
    val a = CurationDemo.curate(docs).select("doc_id", "shard").collect().toSet
    val b = CurationDemo.curate(docs).select("doc_id", "shard").collect().toSet
    assert(a === b)
    val c = CurationDemo.curate(docs, seed = "curation-v2")
      .select("doc_id", "shard").collect().toSet
    assert(a !== c, "a different seed must pick a different sample/sharding")
  }
}
