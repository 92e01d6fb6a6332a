package graft

import java.nio.file.Files

import graft.sinks.Compact
import org.apache.spark.sql.functions._

/** Small-files compaction: file count collapses, content is unchanged,
  * partition layout survives. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compacts a fragmented flat dir without changing content") {
    val dir = graft.Q.scratchDir("compact_flat") + "/t"
    spark.range(0, 10000).toDF("id")
      .repartition(40) // 40 tiny files
      .write.parquet(dir)
    val (before, after) = Compact.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(before === 40L)
    assert(after < 5L, s"still $after files")
    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(back.agg(sum("id")).head().getLong(0) === 49995000L)
  }

  test("partitioned compaction keeps the dir-per-key layout") {
    val dir = graft.Q.scratchDir("compact_part") + "/t"
    spark.range(0, 3000)
      .select((col("id") % 3).cast("string").as("k"), col("id"))
      .repartition(20)
      .write.partitionBy("k").parquet(dir) // up to 20 files per key dir
    val (before, after) = Compact.compact(spark, dir, partitionBy = Seq("k"))
    assert(before > after)
    assert(after === 3L, s"expected one file per key dir, got $after")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("k=0", "k=1", "k=2"))
    assert(spark.read.parquet(dir).count() === 3000)
  }
}
