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

  /** The version `_LATEST` points at. When the pointer file is absent but
    * snapshots exist (the crash window of a pointer swap on a filesystem
    * whose rename cannot overwrite), falls back to the newest *completed*
    * snapshot on disk — a reader never throws while any committed version
    * is intact, and never loads a half-written one (a commit that crashed
    * mid-parquet-write leaves a `v=N` dir with no completion marker).
    * The fallback can only disagree with a lost pointer after a rollback
    * interrupted mid-swap, where re-issuing the rollback is the repair.
    */
  def latestVersion(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir, Pointer)
    if (!f.exists(p)) committedVersions(spark, tableDir).lastOption
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Atomically repoint `_LATEST` at `v`: write temp, then an
    * overwriting rename (`FileContext.rename(OVERWRITE)`), so the pointer
    * file never disappears mid-swap. On filesystems without an atomic
    * overwrite the [[latestVersion]] fallback still covers the window. */
  private def writePointer(spark: SparkSession, tableDir: String, v: Long): Unit = {
    val tmp = new Path(tableDir, s"$Pointer.tmp")
    val dst = new Path(tableDir, Pointer)
    val f = fs(spark, tableDir)
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Marker file recording which ingest batch produced a snapshot. */
  private def markerPath(tableDir: String, v: Long) =
    new Path(versionDir(tableDir, v), "_BATCH_MARKER")

  /** True iff some committed snapshot already carries `marker` — the
    * replay-detection probe for exactly-once foreachBatch ingest. Reads
    * one tiny metadata file per version (metadata-scale, not data-scale).
    */
  def hasMarker(spark: SparkSession, tableDir: String, marker: String): Boolean = {
    val f = fs(spark, tableDir)
    versions(spark, tableDir).exists { v =>
      val p = markerPath(tableDir, v)
      f.exists(p) && {
        val in = f.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim == marker
        finally in.close()
      }
    }
  }

  /** Write `df` as the next snapshot and publish it. Returns the new
    * version number. The snapshot write happens entirely before the
    * pointer flip, so concurrent readers see either the old or the new
    * version, never a partial one. An optional `marker` (e.g. a streaming
    * batch id) is stamped into the snapshot directory before the pointer
    * flip, letting a replayed writer detect an already-committed batch via
    * [[hasMarker]]. Underscore-prefixed, so parquet readers ignore it. */
  def commit(df: DataFrame, tableDir: String, marker: Option[String] = None): Long = {
    val spark = df.sparkSession
    val next = versions(spark, tableDir).lastOption.map(_ + 1).getOrElse(0L)
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
    writePointer(spark, tableDir, next)
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
