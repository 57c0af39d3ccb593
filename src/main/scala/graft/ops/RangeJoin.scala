package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join without the quadratic trap: joining points to
  * the intervals containing them (`point BETWEEN lo AND hi`, plus optional
  * equi-keys) plans as BroadcastNestedLoop/cartesian in vanilla Spark the
  * moment the range predicate is the only condition — a scale killer.
  *
  * This operator BINS both sides: each interval is exploded to the fixed-
  * width bins it covers, each point computes its single bin, and the join
  * becomes an EQUI-join on (keys, bin) followed by the exact range filter.
  * Each matching (point, interval) pair joins exactly once — only the
  * interval's copy in the point's own bin satisfies the equi-condition —
  * so no post-join dedup is needed.
  *
  * Scale: shuffle is hash-partitioned on (keys, bin) like any equi-join;
  * the interval side grows by span/binSize copies per row — pick binSize
  * near the TYPICAL interval length so that factor stays O(1). Skewed hot
  * bins can be salted downstream with [[SkewJoin]] if a single (key, bin)
  * dominates.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose `[loCol, hiCol]`
    * (inclusive, epoch-long columns) contains `pointCol`, matching
    * `keys` (point-side name, interval-side name) exactly. Returns all
    * point columns plus all non-key interval columns.
    */
  def bucketed(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keys: Seq[(String, String)], binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val binnedPts = points.withColumn("__bin", floor(col(pointCol) / binSize).cast("long"))
    val binnedIvs = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binSize).cast("long"),
        floor(col(hiCol) / binSize).cast("long"))))
    val cond = keys.foldLeft(binnedPts("__bin") === binnedIvs("__bin")) {
      case (acc, (pk, ik)) => acc && binnedPts(pk) === binnedIvs(ik)
    }
    val joined = binnedPts.join(binnedIvs, cond)
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(binnedIvs("__bin"))
    keys.foldLeft(joined) { case (d, (_, ik)) => d.drop(binnedIvs(ik)) }
      .drop("__bin")
  }

  /** Interval-OVERLAP equi-join: every pair of rows whose inclusive
    * `[lo, hi]` epoch-long intervals intersect, matching `keys` exactly —
    * the interval analog of [[bucketed]], same anti-quadratic trick. Both
    * sides explode to the fixed-width bins they cover and join on
    * `(keys, bin)`; an overlapping pair shares every bin its intersection
    * covers, so the join emits ONLY in the intersection's FIRST bin
    * (`floor(max(lo_l, lo_r) / binSize)`) — each pair appears exactly
    * once, no post-join distinct over a pair explosion.
    *
    * Column names must be disjoint across the two inputs (rename before
    * calling, as with any self-join lineage). Scale: shuffle is the
    * equi-join's hash exchange; each side grows by span/binSize copies
    * per row, and a bin's cost is (left-in-bin x right-in-bin) PER KEY —
    * keep a real equi-key (or salt with [[SkewJoin]]) when many intervals
    * of one key cover the same bin.
    */
  def overlapBucketed(
      left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      keys: Seq[(String, String)], binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(lo) / binSize).cast("long"),
          floor(col(hi) / binSize).cast("long"))))
    val bl = binned(left, lLo, lHi)
    val br = binned(right, rLo, rHi)
    val cond = keys.foldLeft(bl("__bin") === br("__bin")) {
      case (acc, (lk, rk)) => acc && bl(lk) === br(rk)
    }
    val joined = bl.join(br, cond)
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        bl("__bin") === floor(greatest(col(lLo), col(rLo)) / binSize).cast("long"))
      .drop(br("__bin"))
    keys.foldLeft(joined) { case (d, (_, rk)) => d.drop(br(rk)) }
      .drop("__bin")
  }
}
