package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String-similarity join under an edit-distance bound, without the
  * all-pairs cross join: the segment-filter (PassJoin) family.
  *
  * Pigeonhole lemma: partition an indexed string `s` into `d+1`
  * contiguous segments; any `t` with `levenshtein(s, t) <= d` must
  * contain at least one segment VERBATIM, shifted by at most `d`
  * positions (at most `d` edits, so some segment is untouched, and the
  * edits before it change its offset by at most `d`). Candidates
  * therefore meet with one EQUI-shuffle on `(indexed-length, segment
  * index, segment text)`: the index side emits its `d+1` segments, the
  * probe side emits every substring that could BE such a segment (all
  * indexed lengths within `±d` of its own, all segment slots, and the
  * starts the MULTI-MATCH-AWARE window allows — see probeSegments).
  * Exact `levenshtein <= d` then filters the candidates — the segment
  * phase affects completeness never correctness, and the lemma makes it
  * complete.
  *
  * Scale: candidate volume is at most (2d+1)·(d+1)·(d+1) keys per probe
  * row (the multi-match-aware start window has width ≤ d+1, vs 2d+1 for
  * the naive ±d window) — constant fan-out, linear in corpus size, vs
  * the n² cross join the
  * exact predicate otherwise forces (Spark plans a non-equi string
  * condition as BroadcastNestedLoop). One shuffle to meet candidates,
  * one `distinct`, two id-equi joins to re-attach strings. Indexed
  * strings shorter than `d+1` cannot be partitioned into d+1 non-empty
  * segments; they pair off in a separate short-string bucket (their
  * partners have length <= 2d, so that bucket is a cross join of two
  * provably tiny sets for small d).
  */
object EditDistanceJoin {

  /** All (leftId, rightId, dist) pairs with
    * `levenshtein(leftStr, rightStr) <= maxDist`. The four named columns
    * must be distinct names; id columns must be non-null and unique per
    * side. */
  def editDistanceJoin(
      left: DataFrame,
      leftId: String,
      leftStr: String,
      right: DataFrame,
      rightId: String,
      rightStr: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(Seq(leftId, leftStr, rightId, rightStr).distinct.size == 4,
      "leftId/leftStr/rightId/rightStr must be four distinct column names")
    val d = maxDist
    val k = d + 1 // segments per indexed string

    val l = left.select(col(leftId), col(leftStr))
    val r = right.select(col(rightId), col(rightStr))

    // Index side: the d+1 segments of each string of length >= k.
    // Segment i of a length-L string: the first L%k segments get
    // ceil(L/k) chars, the rest floor(L/k) — start = i*(L div k) +
    // least(i, L%k). (substring is 1-based.)
    val idxSegs = r.filter(length(col(rightStr)) >= k)
      .withColumn("__seg", explode(expr(
        s"""transform(sequence(0, $d), i -> named_struct(
           |  'tl', length($rightStr),
           |  'i', i,
           |  'sub', substring($rightStr,
           |            i * (length($rightStr) div $k) + least(i, length($rightStr) % $k) + 1,
           |            (length($rightStr) div $k) + IF(i < length($rightStr) % $k, 1, 0))))""".stripMargin)))
      .select(col(rightId), col("__seg"))

    // Probe side: for every indexed length tl within ±d (and >= k) and
    // every segment slot i, the substrings at the starts the
    // MULTI-MATCH-AWARE selection allows (Li, Deng & Feng, PassJoin):
    // with home = slot i's start in the indexed string and
    // delta = probe length − tl, a start p = home + Δ is viable only if
    //   |Δ| <= i                  (the shift is indels before slot i; if
    //                              slot i is the FIRST matching slot,
    //                              each earlier slot holds an edit, and a
    //                              larger shift forces a match in an
    //                              earlier slot's window instead)
    //   |delta − Δ| <= d − i      (edits after the slot must absorb the
    //                              remaining length difference)
    // i.e. p ∈ [max(home − i, home + delta − (d − i)),
    //           min(home + i, home + delta + (d − i))] — width ≤ d+1,
    // roughly halving candidate volume vs the sound-but-loose ±d window
    // (asserted in MaintenanceSpec; completeness is pinned by the
    // brute-force property test and q130's cross-join oracle).
    val probeSegs = probeSegments(l, leftId, leftStr, d)

    val segCandidates = probeSegs.join(idxSegs, "__seg").select(col(leftId), col(rightId))

    // Short-string bucket: indexed strings with length < k have no d+1
    // non-empty segmentation; any partner within distance d has length
    // <= len + d <= 2d, so cross both tiny sets and let the exact filter
    // decide.
    val shortCandidates = l.filter(length(col(leftStr)) <= 2 * d)
      .select(col(leftId))
      .crossJoin(r.filter(length(col(rightStr)) < k).select(col(rightId)))

    segCandidates.unionByName(shortCandidates)
      .distinct()
      .join(l, leftId)
      .join(r, rightId)
      .withColumn("dist", levenshtein(col(leftStr), col(rightStr)))
      .filter(col("dist") <= d)
      .select(col(leftId), col(rightId), col("dist"))
  }

  /** The probe-side (tl, slot, substring) generation under the
    * multi-match-aware window — exposed for the fan-out assertion in
    * MaintenanceSpec. Range emptiness is handled by filter() (sequence()
    * would flip to a descending range). */
  private[graft] def probeSegments(
      l: DataFrame, leftId: String, leftStr: String, d: Int): DataFrame = {
    val k = d + 1
    l.filter(length(col(leftStr)) >= 1)
      .withColumn("__seg", explode(expr(
        s"""flatten(flatten(transform(
           |  filter(sequence(greatest(length($leftStr) - $d, $k),
           |                  greatest(length($leftStr) + $d, $k)),
           |         tl -> tl <= length($leftStr) + $d),
           |  tl -> transform(sequence(0, $d), i ->
           |    transform(
           |      filter(sequence(0, length($leftStr)), p ->
           |        p >= greatest(i * (tl div $k) + least(i, tl % $k) - i,
           |                      i * (tl div $k) + least(i, tl % $k)
           |                        + (length($leftStr) - tl) - ($d - i),
           |                      0) AND
           |        p <= least(i * (tl div $k) + least(i, tl % $k) + i,
           |                   i * (tl div $k) + least(i, tl % $k)
           |                     + (length($leftStr) - tl) + ($d - i),
           |                   length($leftStr) - ((tl div $k) + IF(i < tl % $k, 1, 0)))),
           |      p -> named_struct(
           |        'tl', tl,
           |        'i', i,
           |        'sub', substring($leftStr, p + 1,
           |                 (tl div $k) + IF(i < tl % $k, 1, 0))))))))""".stripMargin)))
      .select(col(leftId), col("__seg"))
  }
}
