package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: refresh a per-group `(n, sum)` table
  * from row-level deltas WITHOUT rescanning the base table — the
  * materialized-view counterpart of [[ChangeApply]]. At 100 TB this is the
  * difference between touching the delta (minutes) and recomputing the
  * corpus statistic (hours): every shuffle here is delta-sized or
  * groups-sized; the base table is never read.
  *
  * Exactness: sums route through DECIMAL(27,`scale`) — count/sum deltas are
  * then EXACT group arithmetic, so `refresh(agg(T), removed, added)` is
  * bit-identical to `agg(T - removed + added)` (asserted in the spec and by
  * q102's recompute oracle), not merely close. A raw double fold would
  * drift: subtraction of nearly-equal doubles loses the low bits that a
  * later recompute would keep. The stored double survives the
  * double->decimal round trip exactly while |sum| < 10^(15-scale).
  *
  * Contract: `aggOld` has columns `groupCols :+ nCol :+ sumCol` (the shape
  * [[refresh]] itself emits, so refreshes chain); `removed` rows must
  * actually be in the base table with the recorded values, `added` rows are
  * the incoming versions (an update contributes its old image to `removed`
  * and its new image to `added`). Groups whose count reaches zero drop out;
  * brand-new groups appear. `valueCol` must be NON-NULL — a NULL delta value
  * fails loudly at execution (SQL's sum-of-all-NULL-group-is-NULL cannot be
  * maintained from `(n, sum)` alone, and quietly coalescing it to 0 would
  * break the bit-identical-recompute contract the first time it happened).
  */
object IncrementalAgg {

  def refresh(
      aggOld: DataFrame, removed: DataFrame, added: DataFrame,
      groupCols: Seq[String], valueCol: String,
      nCol: String = "n", sumCol: String = "sum_value",
      scale: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "groupCols required")
    require(aggOld.columns.contains(nCol) && aggOld.columns.contains(sumCol),
      s"aggOld must carry $nCol and $sumCol")
    val dec = s"decimal(27,$scale)"
    // per-row null guard, codegen'd — no extra validation job
    val guarded = when(col(valueCol).isNull,
      raise_error(lit(s"IncrementalAgg: NULL $valueCol in a delta row — " +
        "the (n, sum) state cannot represent all-NULL groups")))
      .otherwise(col(valueCol).cast(dec))
    def deltaOf(df: DataFrame, n: String, s: String): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as(n), sum(guarded).as(s))
    val minus = deltaOf(removed, "__n_rm", "__s_rm")
    val plus = deltaOf(added, "__n_ad", "__s_ad")
    def z(c: String) = coalesce(col(c), lit(0))
    aggOld
      .join(minus, groupCols, "full_outer")
      .join(plus, groupCols, "full_outer")
      .select(
        groupCols.map(col) ++ Seq(
          (z(nCol) - z("__n_rm") + z("__n_ad")).as(nCol),
          (coalesce(col(sumCol).cast(dec), lit(0).cast(dec))
            - z("__s_rm") + z("__s_ad")).cast("double").as(sumCol)): _*)
      .where(col(nCol) > 0)
  }
}
