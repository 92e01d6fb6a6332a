package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table maintenance: MERGE-style upsert application and snapshot
  * diffing (CDC) — the two halves of the accumulate-and-version loop the
  * reference workflow runs as "fetch page, overwrite CSV, git-commit the
  * data dir" (`/root/reference/fetch_data.py:120-167`, `run.yml:29-35`).
  * [[mergeUpsert]] generalizes the overwrite into keyed
  * update/insert/delete semantics; [[diffSnapshots]] recovers the change
  * set BETWEEN two retained versions (what `git diff` gives the
  * reference for free on its data directory, restated over
  * [[graft.sinks.VersionedSink]] snapshots).
  *
  * Scale notes: both operators are pure keyed joins — one shuffle per
  * side on the merge key, sort-merge past the broadcast threshold, AQE
  * handles skewed keys. No collects, no windows, no wide full-outer row
  * in the upsert (anti-join + union beats full-outer + per-column
  * coalesce: the kept target rows stream through untouched instead of
  * being rebuilt column-by-column).
  */
object Merge {

  /** Apply a keyed change set to a target table (Delta/Iceberg
    * `MERGE INTO` semantics, expressed as composition of built-ins):
    *
    *  - target row whose key appears in `source`: replaced by the source
    *    row (or dropped, when the source row's `deleteFlag` is true);
    *  - source row with an unseen key: inserted (unless delete-flagged,
    *    which is then a no-op);
    *  - all other target rows pass through untouched.
    *
    * `source` must carry the target's schema (plus the optional boolean
    * `deleteFlag` column) and must be key-unique — like SQL MERGE, a
    * source with duplicate keys has no well-defined "the matching row"
    * (SQL engines raise; here the duplicate source rows would all
    * survive). Key columns must be non-null on both sides (the anti-join
    * would pass a null-keyed target row even when source has one).
    */
  def mergeUpsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      deleteFlag: Option[String] = None): DataFrame = {
    val extra = source.columns.toSet -- target.columns.toSet -- deleteFlag.toSet
    require(extra.isEmpty, s"source carries columns absent from target: ${extra.mkString(", ")}")
    require(keys.nonEmpty, "mergeUpsert needs at least one key column")
    // Touched keys are a two-column-ish projection of the change set —
    // at real scale the change set is tiny next to the target, so the
    // anti join broadcasts it; either way only keys travel.
    val touched = source.select(keys.map(col): _*).distinct()
    val kept = target.join(touched, keys, "left_anti")
    val applied = deleteFlag match {
      case Some(f) => source.filter(!col(f)).drop(f)
      case None => source
    }
    kept.unionByName(applied)
  }

  /** Incremental view maintenance for a SUM/COUNT aggregate: refresh a
    * materialized `base GROUP BY dims → count(*), sum(measures)` from a
    * [[diffSnapshots]] change set alone, never rescanning the base table.
    *
    * Each diff row explodes into at most two signed contributions — the
    * old row retracts (−measures, −1 count) from its old group, the new
    * row asserts (+measures, +1) into its new group — so updates that
    * MOVE a row between groups (a changed dim value) are handled by the
    * same algebra, and groups whose count reaches zero vanish, exactly
    * as a full recompute would drop them. Contributions + the old
    * aggregate re-aggregate in one pass; sums must be over exact types
    * (integral/decimal — a double sum would drift from the recompute by
    * re-association).
    *
    * At scale this is THE reason to keep CDC diffs around: refreshing a
    * 100 TB fact table's rollup costs |changed rows| + |aggregate|, not
    * a full scan. Refresh ≡ recompute is oracle-checked (q131 must
    * hash-match recomputing over the merged table) and property-tested.
    *
    * @param aggView  the materialized aggregate: `dims ++ (cnt, sums…)`
    * @param diff     output of [[diffSnapshots]] over the base table
    * @param dims     grouping columns (fields inside diff's old/new
    *                 structs; also column names in `aggView`)
    * @param cnt      name of the count(*) column in `aggView`
    * @param sums     measure name → aggView sum-column name
    */
  def incrementalRefresh(
      aggView: DataFrame,
      diff: DataFrame,
      dims: Seq[String],
      cnt: String,
      sums: Map[String, String]): DataFrame = {
    def contrib(side: String, sign: Int) = diff
      .filter(col(side).isNotNull)
      .select(dims.map(d => col(s"$side.$d").as(d)) ++
        Seq(lit(sign.toLong).as(cnt)) ++
        sums.map { case (m, a) => (col(s"$side.$m") * sign).as(a) }: _*)
    aggView.select(dims.map(col) ++ (cnt +: sums.values.toSeq).map(col): _*)
      .unionByName(contrib("old", -1))
      .unionByName(contrib("new", +1))
      .groupBy(dims.map(col): _*)
      .agg(sum(col(cnt)).as(cnt),
        sums.values.toSeq.map(a => sum(col(a)).as(a)): _*)
      .filter(col(cnt) > 0)
      // re-summing widens decimal precision one level; restore the
      // view's declared types so refresh output ≡ recompute output
      .select(dims.map(col) ++ (cnt +: sums.values.toSeq).map(c =>
        col(c).cast(aggView.schema(c).dataType).as(c)): _*)
  }

  /** Incremental view maintenance WITH non-retractable aggregates
    * (MIN/MAX): the touched-group recompute-and-splice path.
    *
    * SUM/COUNT are retractable — a delete subtracts — so
    * [[incrementalRefresh]] never needs the base table. MIN/MAX are not:
    * deleting the row holding a group's max says nothing about the new
    * max without looking at the group again. The standard fix: recompute
    * ONLY the groups the change set touches (a scan of `newBase`
    * semi-joined to the touched dim keys — prunable at the source when
    * the dims are partition/cluster columns) and splice the recomputed
    * rows over the old view, streaming every untouched view row through
    * unchanged. Groups whose last row was deleted vanish, exactly as a
    * full recompute would drop them.
    *
    * Cost at scale: |untouched view| + one keyed sub-scan of the base
    * for |touched groups| — still never a full-table re-aggregation, and
    * the touched key set is typically tiny and broadcast. Refresh ≡
    * recompute is oracle-checked (q148) and property-tested with deletes
    * that hit the group max (MaintenanceSpec).
    *
    * @param aggView the materialized aggregate:
    *                `dims ++ (cnt, sums…, mins…, maxs…)`
    * @param newBase the base table AFTER the change set was applied
    * @param diff    output of [[diffSnapshots]] over the base table
    * @param dims    grouping columns (names in `aggView`, fields inside
    *                diff's old/new structs, columns of `newBase`)
    * @param cnt     name of the count(*) column in `aggView`
    * @param sums    measure name → aggView sum-column name
    * @param mins    measure name → aggView min-column name
    * @param maxs    measure name → aggView max-column name
    */
  def incrementalRefreshWithExtrema(
      aggView: DataFrame,
      newBase: DataFrame,
      diff: DataFrame,
      dims: Seq[String],
      cnt: String,
      sums: Map[String, String],
      mins: Map[String, String],
      maxs: Map[String, String]): DataFrame = {
    val viewCols = dims ++ (cnt +: (sums.values.toSeq ++ mins.values.toSeq ++ maxs.values.toSeq))
    def sideDims(side: String) = diff
      .filter(col(side).isNotNull)
      .select(dims.map(d => col(s"$side.$d").as(d)): _*)
    // Touched-key joins must be NULL-safe: a group keyed by a NULL dim
    // value would never match a plain equi-join, leaving its view row
    // stale forever. Rename the touched side and join on <=> so NULL
    // grouping keys splice exactly like any other group.
    val touched = sideDims("old").unionByName(sideDims("new")).distinct()
      .select(dims.map(d => col(d).as(s"__touched_$d")): _*)
    val touchedCond = dims.map(d => col(d) <=> col(s"__touched_$d")).reduce(_ && _)
    val untouched = aggView
      .select(viewCols.map(col): _*)
      .join(touched, touchedCond, "left_anti")
    val recomputed = newBase
      .join(touched, touchedCond, "left_semi")
      .groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).cast(aggView.schema(cnt).dataType).as(cnt),
        (sums.toSeq.map { case (m, a) =>
          sum(col(m)).cast(aggView.schema(a).dataType).as(a)
        } ++ mins.toSeq.map { case (m, a) => min(col(m)).as(a) } ++
          maxs.toSeq.map { case (m, a) => max(col(m)).as(a) }): _*)
      .select(viewCols.map(col): _*)
    untouched.unionByName(recomputed)
  }

  /** Change-data capture between two snapshots of a keyed table: one row
    * per differing key with `op` ∈ insert | update | delete, the key
    * columns, and the full before/after rows as structs (`old`, `new`;
    * null on the missing side). Equal rows (null-safe, full-row
    * comparison) are dropped. One full-outer sort-merge join on the key;
    * both sides stream. */
  def diffSnapshots(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"snapshots must share a schema: ${oldSnap.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    val vals = oldSnap.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, as: String) = df.select(
      keys.map(col) :+ struct(vals.map(col): _*).as(as): _*)
    pack(oldSnap, "old").join(pack(newSnap, "new"), keys, "full_outer")
      .withColumn("op",
        when(col("old").isNull, "insert")
          .when(col("new").isNull, "delete")
          .when(!(col("old") <=> col("new")), "update"))
      .filter(col("op").isNotNull)
      .select(col("op") +: keys.map(col) :+ col("old") :+ col("new"): _*)
  }
}
