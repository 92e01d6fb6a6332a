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
    val dir = graft.Q.scratchDir("vtable")

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
    val dir = graft.Q.scratchDir("vtable2")
    VersionedSink.commit(Seq((1, "a")).toDF("id", "s"), dir)
    intercept[IllegalArgumentException] {
      VersionedSink.rollback(spark, dir, 7L)
    }
  }

  test("batch markers make replayed commits detectable (exactly-once ingest)") {
    val dir = graft.Q.scratchDir("vtable3")
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

  test("readAsOf time-travels to any committed version; refuses uncommitted ones") {
    val dir = graft.Q.scratchDir("vtable5")
    VersionedSink.commit(Seq((1, "a"), (2, "b")).toDF("id", "s"), dir)
    VersionedSink.commit(Seq((3, "c")).toDF("id", "s"), dir)
    // v=n is live; v=n-1 is still readable as-of
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect() === Array((3, "c")))
    assert(VersionedSink.readAsOf(spark, dir, 0L).as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "b")))
    assert(VersionedSink.readAsOf(spark, dir, 1L).as[(Int, String)].collect() === Array((3, "c")))
    intercept[IllegalArgumentException] { VersionedSink.readAsOf(spark, dir, 9L) }
  }

  test("a half-written snapshot (no completion marker) is invisible to readers") {
    val dir = graft.Q.scratchDir("vtable6")
    VersionedSink.commit(Seq((1, "a")).toDF("id", "s"), dir)
    // simulate a commit that crashed mid-parquet-write: a v=1 dir with
    // data debris but no _COMMITTED/_SUCCESS, and (worst case) a lost
    // pointer too
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "v=1"))
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "v=1/part-00000.parquet"), true)
    out.write("partial".getBytes("UTF-8")); out.close()
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_LATEST"), false)

    assert(VersionedSink.versions(spark, dir) === Seq(0L, 1L)) // debris browsable...
    assert(VersionedSink.committedVersions(spark, dir) === Seq(0L)) // ...but not committed
    assert(VersionedSink.latestVersion(spark, dir) === Some(0L)) // fallback skips debris
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect() === Array((1, "a")))
    intercept[IllegalArgumentException] { VersionedSink.readAsOf(spark, dir, 1L) }
    intercept[IllegalArgumentException] { VersionedSink.rollback(spark, dir, 1L) }
    // the next commit skips past the debris version — never overwrites it
    assert(VersionedSink.commit(Seq((2, "b")).toDF("id", "s"), dir) === 2L)
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect() === Array((2, "b")))
  }

  test("crash between marker write and pointer flip: replay republishes, not skips") {
    val dir = graft.Q.scratchDir("vtable7")
    // batch 0 committed and published normally
    graft.streaming.StreamingJobs.commitVersionedBatch(dir)(
      Seq((1, "a")).toDF("id", "s"), 0L)
    // batch 1's commit durably wrote snapshot v=1 + its marker but
    // "crashed" before the _LATEST flip — simulate by committing fully
    // and then forcing the pointer back to v=0 (bit-identical on-disk
    // state to the real crash window)
    graft.streaming.StreamingJobs.commitVersionedBatch(dir)(
      Seq((2, "b")).toDF("id", "s"), 1L)
    VersionedSink.rollback(spark, dir, 0L)
    assert(VersionedSink.read(spark, dir).count() === 1) // the lost-rows state

    // replayed batch 1: marker hit must NOT silently skip — it must
    // re-issue the pointer flip so v=1's rows are published again
    graft.streaming.StreamingJobs.commitVersionedBatch(dir)(
      Seq((2, "b")).toDF("id", "s"), 1L)
    assert(VersionedSink.versions(spark, dir) === Seq(0L, 1L)) // no re-commit
    assert(VersionedSink.latestVersion(spark, dir) === Some(1L))
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "b")))
    // ...and batch 2 unions on top of the repaired latest, losing nothing
    graft.streaming.StreamingJobs.commitVersionedBatch(dir)(
      Seq((3, "c")).toDF("id", "s"), 2L)
    assert(VersionedSink.read(spark, dir).as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "b"), (3, "c")))
    // post-commit replay (the common case) stays a pure no-op
    graft.streaming.StreamingJobs.commitVersionedBatch(dir)(
      Seq((3, "c")).toDF("id", "s"), 2L)
    assert(VersionedSink.versions(spark, dir) === Seq(0L, 1L, 2L))
  }

  test("concurrent committers get distinct versions; pointer converges to the max") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val dir = graft.Q.scratchDir("vtable8")
    val commits = (1 to 4).map { i =>
      Future(VersionedSink.commit(Seq((i, s"w$i")).toDF("id", "s"), dir))
    }
    val got = Await.result(Future.sequence(commits), 120.seconds)
    // atomic reservation: four distinct version numbers, no interleaved dirs
    assert(got.toSet.size === 4)
    assert(VersionedSink.committedVersions(spark, dir).toSet === got.toSet)
    // advance-only flip: the pointer lands on the highest version no
    // matter the flip order, and that snapshot is intact
    assert(VersionedSink.latestVersion(spark, dir) === Some(got.max))
    assert(VersionedSink.read(spark, dir).count() === 1)
  }

  test("reader survives a lost _LATEST pointer (falls back to newest snapshot)") {
    val dir = graft.Q.scratchDir("vtable4")
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
