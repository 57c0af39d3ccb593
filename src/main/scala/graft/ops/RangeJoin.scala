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
}
