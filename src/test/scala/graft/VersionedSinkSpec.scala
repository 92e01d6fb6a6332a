package graft

import java.nio.file.Files

import graft.sinks.VersionedSink

/** A14: versioned-table sink — snapshot commit, history, restore
  * (the Spark restatement of the reference's git-commit-of-data,
  * `run.yml:29-35`).
  */
class VersionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("commit publishes snapshots; rollback restores the previous one") {
    val dir = Files.createTempDirectory("vtable").toString

    val v0 = VersionedSink.commit(Seq((1, "a"), (2, "b")).toDF("id", "s"), dir)
    assert(v0 === 0L)
    assert(VersionedSink.latestVersion(spark, dir) === Some(0L))
    assert(VersionedSink.read(spark, dir).count() === 2)

    // overwrite with a new snapshot
    val v1 = VersionedSink.commit(Seq((3, "c")).toDF("id", "s"), dir)
    assert(v1 === 1L)
    assert(VersionedSink.read(spark, dir).count() === 1)
    assert(VersionedSink.versions(spark, dir) === Seq(0L, 1L))

    // restore the previous snapshot — pointer flip, no data movement
    VersionedSink.rollback(spark, dir, 0L)
    assert(VersionedSink.latestVersion(spark, dir) === Some(0L))
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "b")))
    // the rolled-back-from version remains browsable
    assert(VersionedSink.read(spark, dir, Some(1L)).count() === 1)

    // a new commit after rollback continues the version sequence
    val v2 = VersionedSink.commit(Seq((4, "d")).toDF("id", "s"), dir)
    assert(v2 === 2L)
    assert(VersionedSink.versions(spark, dir) === Seq(0L, 1L, 2L))
  }

  test("rollback to a nonexistent version is refused") {
    val dir = Files.createTempDirectory("vtable2").toString
    VersionedSink.commit(Seq((1, "a")).toDF("id", "s"), dir)
    intercept[IllegalArgumentException] {
      VersionedSink.rollback(spark, dir, 7L)
    }
  }

  test("batch markers make replayed commits detectable (exactly-once ingest)") {
    val dir = Files.createTempDirectory("vtable3").toString
    VersionedSink.commit(Seq((1, "a")).toDF("id", "s"), dir, marker = Some("batch-0"))
    assert(VersionedSink.hasMarker(spark, dir, "batch-0"))
    assert(!VersionedSink.hasMarker(spark, dir, "batch-1"))
    // the replay discipline: a writer that sees its batch already
    // committed skips the union+commit, so no row duplicates
    if (!VersionedSink.hasMarker(spark, dir, "batch-0")) {
      VersionedSink.commit(
        VersionedSink.read(spark, dir).unionByName(Seq((1, "a")).toDF("id", "s")), dir,
        marker = Some("batch-0"))
    }
    assert(VersionedSink.versions(spark, dir) === Seq(0L))
    assert(VersionedSink.read(spark, dir).count() === 1)
    // the marker file does not disturb the parquet read
    assert(VersionedSink.read(spark, dir, Some(0L)).as[(Int, String)].collect() === Array((1, "a")))
  }

  test("reader survives a lost _LATEST pointer (falls back to newest snapshot)") {
    val dir = Files.createTempDirectory("vtable4").toString
    VersionedSink.commit(Seq((1, "a")).toDF("id", "s"), dir)
    VersionedSink.commit(Seq((2, "b")).toDF("id", "s"), dir)
    // simulate the crash window: pointer file gone, snapshots intact
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "_LATEST"), false))
    assert(VersionedSink.latestVersion(spark, dir) === Some(1L))
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect() === Array((2, "b")))
  }
}
