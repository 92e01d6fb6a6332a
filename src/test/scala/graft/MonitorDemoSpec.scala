package graft

import graft.examples.MonitorDemo
import org.apache.spark.sql.functions._

/** Composition pins for the corpus-health report: the five statistics
  * are individually oracle-checked (q173-q175, q177, q179); here the
  * one-row composition must be deterministic, in-range, and consistent
  * with what the underlying operators report directly.
  */
class MonitorDemoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir)
  private lazy val emb = Tables.embeddings(spark, dir)

  test("report is a single row with every figure in its legal range") {
    val r = MonitorDemo.report(docs, emb).collect()
    assert(r.length === 1)
    val row = r.head
    val ks = row.getAs[Long]("ks_ppm")
    val auc = row.getAs[Long]("auc_ppm")
    val kap = row.getAs[Long]("kappa_ppm")
    val boiler = row.getAs[Long]("n_boilerplate")
    val reach = row.getAs[Long]("n_review_reach")
    assert(ks >= 0 && ks <= 1000000, s"ks_ppm out of range: $ks")
    assert(auc >= 0 && auc <= 1000000, s"auc_ppm out of range: $auc")
    assert(kap >= -1000000 && kap <= 1000000, s"kappa_ppm out of range: $kap")
    val nDocs = docs.count()
    assert(boiler >= 0 && boiler <= nDocs)
    assert(reach >= 0 && reach <= nDocs)
  }

  test("report is deterministic and seed-sensitive on the drift split") {
    val a = MonitorDemo.report(docs, emb).collect().head
    val b = MonitorDemo.report(docs, emb).collect().head
    assert(a === b)
    // a different seed re-splits the snapshot halves; everything except
    // the split-dependent KS must be unchanged
    val c = MonitorDemo.report(docs, emb, seed = "monitor-v2").collect().head
    assert(a.getAs[Long]("auc_ppm") === c.getAs[Long]("auc_ppm"))
    assert(a.getAs[Long]("kappa_ppm") === c.getAs[Long]("kappa_ppm"))
    assert(a.getAs[Long]("n_boilerplate") === c.getAs[Long]("n_boilerplate"))
  }

  test("auc_ppm matches EvalMetrics.rocAuc applied directly") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val pos = emb
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i0", "v")))
      .select(col("vec_id"), col("label"), (col("i0") + 1).as("i"),
        floor(col("v").cast(DoubleType) * 1000).cast(LongType).as("qv"))
    val w = when(col("i") % 3 === 0, 2L).when(col("i") % 3 === 1, -1L).otherwise(1L)
    val scored = pos.groupBy("vec_id", "label").agg(sum(col("qv") * w).as("s"))
    val direct = graft.operators.EvalMetrics.rocAuc(scored, col("label") >= 5, col("s"))
      .select(expr("(auc_num * 1000000) div auc_den").as("auc_ppm"))
      .collect().head.getAs[Long]("auc_ppm")
    val reported = MonitorDemo.report(docs, emb).collect().head.getAs[Long]("auc_ppm")
    assert(direct === reported)
  }
}
