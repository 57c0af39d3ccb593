package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesAgg

/** Exact heavy hitters over ultra-high-cardinality columns without a full
  * `groupBy(item)`: a bounded Misra-Gries candidate pass, then an exact
  * recount restricted to the <= k candidates.
  *
  * Reference analog: none — `ETLUtils` delegates frequency tables to SQL
  * `GROUP BY` (`/root/reference/R/ffsql.R:108`), which is exactly what
  * stops scaling when the item domain does (token vocabularies, URLs,
  * user ids at 100 TB: the exchange carries every distinct item). Here
  * pass 1 shuffles at most k counters per partition and pass 2 aggregates
  * at most k groups.
  */
object HeavyHitters {

  /** All items of `itemCol` with frequency strictly greater than
    * `n * minShare` (n = non-null row count), with their EXACT counts:
    * `(item, cnt)`.
    *
    * Two passes, both bounded:
    *  1. one aggregation computes the MG summary (<= k counters/partition
    *     shuffled) and n; the candidate set collected to the driver is
    *     <= k items — the same O(k) driver boundary as the IVF training
    *     sample / model-fit collects documented elsewhere;
    *  2. a codegen'd `InSet` filter keeps candidate rows only, and the
    *     recount `groupBy` has at most k groups — its exchange is k rows.
    *
    * Exactness: MG guarantees every item with true count > n/(k+1) keeps a
    * positive counter (merge-order independent), so with k+1 >= 1/minShare
    * the candidate set is a superset of the answer and the recount filter
    * `cnt > n*minShare` makes the result EQUAL to the full-groupBy answer
    * — which is what the DuckDB oracle replays (q162). Choose k ~ 2x
    * 1/minShare: the guarantee needs 1x, the slack halves the error mass.
    */
  def frequentItems(
      df: DataFrame, itemCol: Column, minShare: Double,
      k: Int = 512, itemName: String = "item"): DataFrame = {
    requireGuarantee(minShare, k)
    val first = df
      .agg(
        MisraGriesAgg.misraGriesSummary(itemCol, k).as("mg"),
        count(itemCol).as("n"))
      .select(map_keys(col("mg")).as("cands"), col("n"))
      .head() // bounded: one row, <= k strings
    recountExact(df, itemCol, first.getSeq[String](0), first.getLong(1),
      minShare, itemName)
  }

  /** Per-group exact heavy hitters: all items whose frequency WITHIN
    * their group exceeds `groupCount * minShare`, with exact counts —
    * `(groupCols..., item, cnt)`. The per-domain boilerplate-token shape:
    * one MG summary per group bounds pass-1 shuffle at k counters per
    * (group, partition).
    *
    * Unlike [[frequentItems]] nothing is collected to the driver: the
    * candidate frame `(group, item, threshold)` — at most k rows per
    * group — broadcasts into the recount join, and the recount groupBy
    * aggregates candidate occurrences only. Groups must therefore be
    * broadcast-bounded (sources, languages, shards — thousands, not
    * millions); the threshold stays in the same IEEE double
    * `n * minShare` the SQL oracle computes, floored to long so the
    * final integer comparison is exact.
    */
  def frequentItemsByGroup(
      df: DataFrame, groupCols: Seq[String], itemCol: Column,
      minShare: Double, k: Int = 512, itemName: String = "item"): DataFrame = {
    requireGuarantee(minShare, k)
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val cands = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        MisraGriesAgg.misraGriesSummary(itemCol, k).as("__mg"),
        count(itemCol).as("__n"))
      .select(groupCols.map(col) :+
        explode(map_keys(col("__mg"))).as(itemName) :+
        floor(col("__n") * lit(minShare)).cast("long").as("__thresh"): _*)
    // null-SAFE equality on the group keys: groupBy keeps a NULL group,
    // so the recount join must match it too — a plain equi-join would
    // silently drop every null-keyed group's heavy hitters. Items are
    // never null (both passes skip them), so the item leg stays ===.
    val left = df.select(groupCols.map(col) :+ itemCol.as(itemName): _*)
    val right = broadcast(
      cands.toDF(cands.columns.map("__r_" + _): _*))
    val cond = groupCols
      .map(g => left(g) <=> right(s"__r_$g"))
      .reduce(_ && _) && left(itemName) === right(s"__r_$itemName")
    left.join(right, cond)
      .groupBy((groupCols :+ itemName).map(left(_)) :+ col("__r___thresh"): _*)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > col("__r___thresh"))
      .drop("__r___thresh")
  }

  private[graft] def requireGuarantee(minShare: Double, k: Int): Unit = {
    require(minShare > 0 && minShare < 1, "minShare must be in (0, 1)")
    require((k + 1) * minShare >= 1.0,
      s"k=$k cannot guarantee share $minShare: need k+1 >= ${1 / minShare}")
  }

  /** The exact-recount second pass, shared by the batch operator above and
    * the streaming candidate pass
    * ([[graft.streaming.CorpusStreams.heavyHittersStreaming]]): any MG
    * candidate superset yields the same exact answer, which is why the
    * streamed and batch faces sit under ONE oracle.
    */
  private[graft] def recountExact(
      df: DataFrame, itemCol: Column, cands: Seq[String], n: Long,
      minShare: Double, itemName: String): DataFrame = {
    if (n == 0 || cands.isEmpty) {
      return df.sparkSession.range(0)
        .select(lit("").as(itemName), lit(0L).as("cnt")).where(lit(false))
    }
    // floor threshold: cnt > n*minShare  <=>  cnt >= floor(n*minShare)+1,
    // kept in long math so the comparison is exact (no double drift)
    val thresh = math.floor(n * minShare).toLong
    df.where(itemCol.isin(cands: _*)) // >10 values => codegen'd InSet
      .groupBy(itemCol.as(itemName))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > thresh)
  }
}
