package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table (SURVEY.md A14): the reference workflow
  * git-commits its `data/` directory after every harvest
  * (`/root/reference/run.yml:29-35`) — a poor-man's versioned table whose
  * value is "every run's output is a retained, restorable snapshot".
  *
  * Spark-first restatement: each commit writes a full snapshot under
  * `table/v=<n>/` and then atomically repoints a tiny `_LATEST` pointer
  * file (write-temp + rename — atomic on HDFS and local FS). Readers
  * resolve the pointer first, so a crash mid-write never exposes a
  * half-written snapshot, and `rollback` is a pointer flip, not a data
  * copy. History is browsable (`versions`) and any snapshot is readable
  * (`read(version = Some(n))`) — the same affordances as the reference's
  * git log over `data/`.
  *
  * Scale notes: snapshots are written by the cluster (plain parquet
  * write, any partitioning the caller put on `df`), and only the pointer
  * update is driver-side. On rename-less object stores the pointer
  * rename degrades to copy+delete; production there would use a
  * log-based table format — the semantics demonstrated here are exactly
  * the subset of such formats the reference workflow relies on.
  */
object VersionedSink {

  private val Pointer = "_LATEST"
  private val Committed = "_COMMITTED"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(tableDir: String, v: Long) = new Path(tableDir, s"v=$v")

  /** All committed versions, ascending (directories present on disk,
    * whether or not `_LATEST` points at them). */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val f = fs(spark, tableDir)
    val root = new Path(tableDir)
    if (!f.exists(root)) Seq.empty
    else
      f.listStatus(root).toIndexedSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("v=") => s.drop(2).toLong }
        .sorted
  }

  /** Versions whose snapshot write finished: the dir carries the
    * `_COMMITTED` marker this sink stamps after the parquet write (or
    * Spark's own `_SUCCESS`, for snapshot dirs produced by an external
    * writer). A `v=N` directory without either is the debris of a commit
    * that crashed mid-write — present on disk, never published. */
  def committedVersions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val f = fs(spark, tableDir)
    versions(spark, tableDir).filter { v =>
      f.exists(new Path(versionDir(tableDir, v), Committed)) ||
        f.exists(new Path(versionDir(tableDir, v), "_SUCCESS"))
    }
  }

  private def isLocal(f: org.apache.hadoop.fs.FileSystem): Boolean =
    f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]

  private def localPath(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  /** Raw `_LATEST` pointer contents, without the lost-pointer fallback.
    * On the LOCAL filesystem the pointer is read via java.nio, bypassing
    * Hadoop's ChecksumFileSystem: its `.crc` shadow file makes every
    * pointer swap two non-atomic renames, and two racing swaps can pair
    * one writer's data with the other's checksum — a permanently
    * unreadable pointer. HDFS has no side files and an atomic rename, so
    * it keeps the Hadoop path. */
  private def pointerValue(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir, Pointer)
    if (isLocal(f)) {
      val lp = localPath(p)
      if (!java.nio.file.Files.exists(lp)) None
      else Some(new String(java.nio.file.Files.readAllBytes(lp), "UTF-8").trim.toLong)
    } else if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** The version `_LATEST` points at. When the pointer file is absent but
    * snapshots exist (the crash window of a pointer swap on a filesystem
    * whose rename cannot overwrite), falls back to the newest *completed*
    * snapshot on disk — a reader never throws while any committed version
    * is intact, and never loads a half-written one (a commit that crashed
    * mid-parquet-write leaves a `v=N` dir with no completion marker).
    * The fallback can only disagree with a lost pointer after a rollback
    * interrupted mid-swap, where re-issuing the rollback is the repair.
    */
  def latestVersion(spark: SparkSession, tableDir: String): Option[Long] =
    pointerValue(spark, tableDir)
      .orElse(committedVersions(spark, tableDir).lastOption)

  /** Atomically repoint `_LATEST` at `v`: write temp, then an
    * overwriting rename (`FileContext.rename(OVERWRITE)`), so the pointer
    * file never disappears mid-swap. On filesystems without an atomic
    * overwrite the [[latestVersion]] fallback still covers the window. */
  private def writePointer(spark: SparkSession, tableDir: String, v: Long): Unit = {
    val dst = new Path(tableDir, Pointer)
    val f = fs(spark, tableDir)
    if (isLocal(f)) {
      // java.nio, not Hadoop's LocalFileSystem: the checksum shadow file
      // breaks racing swaps (see pointerValue doc). One POSIX rename is
      // atomic and last-wins; readers see the old or new value, never a
      // torn one. A stale .crc from an older Hadoop-written pointer is
      // removed so nothing ever pairs it with nio-written data.
      val dir = localPath(new Path(tableDir))
      java.nio.file.Files.createDirectories(dir)
      val tmp = java.nio.file.Files.createTempFile(dir, s"$Pointer.tmp-", "")
      java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(dir.resolve(s".$Pointer.crc"))
      java.nio.file.Files.move(tmp, localPath(dst),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      // Unique temp per attempt: concurrent flips sharing one temp path
      // race each other's rename (the winner consumes the loser's file).
      val tmp = new Path(tableDir, s"$Pointer.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8"))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Marker file recording which ingest batch produced a snapshot. */
  private def markerPath(tableDir: String, v: Long) =
    new Path(versionDir(tableDir, v), "_BATCH_MARKER")

  /** The version whose snapshot carries `marker`, if any. Markers are
    * stamped only after the snapshot's completion marker, so a hit
    * implies the snapshot's data is fully durable — but NOT that the
    * `_LATEST` flip happened (see [[publishIfBehind]] for that crash
    * window). Reads one tiny metadata file per version (metadata-scale,
    * not data-scale). */
  def markerVersion(spark: SparkSession, tableDir: String, marker: String): Option[Long] = {
    val f = fs(spark, tableDir)
    versions(spark, tableDir).find { v =>
      val p = markerPath(tableDir, v)
      f.exists(p) && {
        val in = f.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim == marker
        finally in.close()
      }
    }
  }

  /** True iff some committed snapshot already carries `marker` — the
    * replay-detection probe for exactly-once foreachBatch ingest. A
    * replaying writer must pair this with [[publishIfBehind]] on the
    * marker's version: the marker becomes durable BEFORE the pointer
    * flip, so "marker present" alone admits a crash that left the batch
    * committed but unpublished — skipping the batch without re-issuing
    * the flip would lose its rows from every later union. */
  def hasMarker(spark: SparkSession, tableDir: String, marker: String): Boolean =
    markerVersion(spark, tableDir, marker).nonEmpty

  /** Close the commit crash window: a commit that durably wrote its
    * snapshot + markers but crashed before the `_LATEST` flip leaves a
    * committed-but-unpublished version. Re-issues the flip iff the
    * current pointer sits strictly below `v`; no-op when the pointer
    * already covers `v`, and when the pointer is absent it is restored
    * (the [[latestVersion]] fallback would resolve to the newest
    * committed snapshot — which includes `v` — so this only makes the
    * implicit state explicit).
    *
    * Racing publishers write-then-re-check: a lower-version flip that
    * lands after a higher one would regress the pointer, and the loser
    * cannot detect that from the pointer alone (it reads back its own
    * value), so each re-check re-targets the newest *committed* version
    * on disk — by the time the loser re-checks, the winner's completion
    * marker is durable, so the loser repairs its own regression and the
    * pointer converges upward. Bounded attempts; a pathological
    * scheduler leaves a stale-but-consistent pointer that the next
    * commit's flip repairs. */
  def publishIfBehind(spark: SparkSession, tableDir: String, v: Long): Unit = {
    @annotation.tailrec
    def loop(attempts: Int): Unit = {
      val target = (committedVersions(spark, tableDir).lastOption.toSeq :+ v).max
      pointerValue(spark, tableDir) match {
        case Some(cur) if cur >= target => ()
        case _ if attempts <= 0 => ()
        case _ =>
          // A racing flip can make this attempt's rename lose (e.g. the
          // checksum shadow file on LocalFS); the re-check retries it.
          try writePointer(spark, tableDir, target)
          catch { case _: java.io.IOException => () }
          loop(attempts - 1)
      }
    }
    loop(5)
  }

  /** Version-number reservation: an exclusive create so two concurrent
    * committers can never interleave parquet files into the same `v=N`
    * directory. On HDFS `create(overwrite=false)` is atomic (namenode
    * lease); Hadoop's LOCAL filesystem implements it as check-then-create,
    * which two threads can both win — there the reservation goes through
    * POSIX `O_CREAT|O_EXCL` (`Files.createFile`) instead. The reservation
    * outlives a crash — the number is then skipped forever, which is
    * harmless (versions need not be contiguous) — and is deleted after
    * the snapshot dir itself exists to take over collision duty. */
  private def reservePath(tableDir: String, v: Long) = new Path(tableDir, s"_RESERVE_v$v")

  private def tryReserve(f: org.apache.hadoop.fs.FileSystem, p: Path): Boolean = f match {
    case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
      try {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    case _ =>
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Write `df` as the next snapshot and publish it. Returns the new
    * version number. The snapshot write happens entirely before the
    * pointer flip, so concurrent readers see either the old or the new
    * version, never a partial one. An optional `marker` (e.g. a streaming
    * batch id) is stamped into the snapshot directory before the pointer
    * flip, letting a replayed writer detect an already-committed batch via
    * [[hasMarker]] (which that writer must pair with [[publishIfBehind]]).
    *
    * Concurrency contract: version numbers are allocated by atomic
    * reservation, so concurrent committers get distinct `v=N` dirs and
    * never corrupt each other's snapshots, and the pointer flip is
    * advance-only, so it converges to the highest committed version
    * regardless of flip order. What concurrent commits do NOT get is
    * serialized read-modify-write: two writers that each `read()` the
    * old latest and union their own batch will both publish, and the
    * content of the loser's union is simply superseded (last-version
    * -wins, like two git commits racing a push). Accumulating ingest
    * therefore needs a single logical writer — exactly the discipline
    * Structured Streaming's one-query-per-checkpoint already enforces
    * for the A14 pipeline. */
  def commit(df: DataFrame, tableDir: String, marker: Option[String] = None): Long = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    var next = versions(spark, tableDir).lastOption.map(_ + 1).getOrElse(0L)
    while (!tryReserve(f, reservePath(tableDir, next))) next += 1
    df.write.mode("errorifexists").parquet(versionDir(tableDir, next).toString)
    // Completion marker BEFORE the pointer flip: readers (and the
    // lost-pointer fallback) treat marker-less dirs as uncommitted debris.
    locally {
      val out = fs(spark, tableDir).create(new Path(versionDir(tableDir, next), Committed), true)
      try out.write(next.toString.getBytes("UTF-8"))
      finally out.close()
    }
    marker.foreach { m =>
      val out = fs(spark, tableDir).create(markerPath(tableDir, next), true)
      try out.write(m.getBytes("UTF-8"))
      finally out.close()
    }
    // Advance-only flip: a concurrent committer of a higher version may
    // have already published past us; going backwards would un-publish
    // its rows. (Deliberate backwards moves go through rollback.)
    publishIfBehind(spark, tableDir, next)
    f.delete(reservePath(tableDir, next), false)
    next
  }

  /** Read a specific version, or the published latest. */
  def read(spark: SparkSession, tableDir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, tableDir)).getOrElse(
      throw new IllegalStateException(s"no committed version in $tableDir"))
    spark.read.parquet(versionDir(tableDir, v).toString)
  }

  /** Time-travel read: the table exactly as it stood at `version` — the
    * single documented entry point for the "read any retained snapshot"
    * affordance (the Delta-style `versionAsOf`, or `git checkout <old> --
    * data/` on the reference repo, `run.yml:29-35`). Fails fast on a
    * version that was never committed (absent, or mid-write debris),
    * rather than letting the parquet reader surface a confusing partial
    * scan. */
  def readAsOf(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    require(committedVersions(spark, tableDir).contains(version),
      s"version $version was never committed in $tableDir " +
        s"(committed: ${committedVersions(spark, tableDir).mkString(", ")})")
    spark.read.parquet(versionDir(tableDir, version).toString)
  }

  /** Restore: repoint `_LATEST` at an existing earlier snapshot. Data is
    * untouched (the overwritten-by-pointer version remains browsable),
    * exactly like `git checkout <old>` on the reference's data repo. */
  def rollback(spark: SparkSession, tableDir: String, version: Long): Unit = {
    require(committedVersions(spark, tableDir).contains(version),
      s"version $version does not exist (or was never committed) in $tableDir")
    writePointer(spark, tableDir, version)
  }
}
