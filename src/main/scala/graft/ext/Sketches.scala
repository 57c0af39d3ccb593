package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-derived corpus statistics. The underlying KMV ("k minimum
  * values") aggregate is [[graft.expressions.BottomKAgg]] — a bounded
  * TypedImperativeAggregate whose shuffle traffic is at most k longs per
  * (group, partition) — so these estimators run at any group cardinality
  * without ever materializing per-group distinct sets.
  */
object Sketches {

  /** Per-group distinct-count estimate from the KMV sketch, next to the
    * exact count for audit: `(groupCols..., n_exact, n_est)`.
    *
    * Estimator (Bar-Yossef et al. 2002): with h uniform on [0, 2^32) and
    * h_(k) the k-th smallest DISTINCT hash, D ~ (k-1) * 2^32 / h_(k);
    * relative error ~ 1/sqrt(k-2). A group with fewer than k distinct
    * hashes has an exact sketch — the estimate IS its size. All integer
    * math (floor division), so the estimate hash-matches any engine that
    * reproduces the md5-prefix hash — no float drift (q130).
    *
    * Scale: the exact count here is for the oracle/audit column; at 100 TB
    * drop it (`withExact = false`) and the whole statistic is one bounded
    * map-side-combinable aggregation — the point of carrying a sketch.
    */
  def kmvDistinctCount(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 16, withExact: Boolean = true): DataFrame = {
    require(k >= 3, "k must be >= 3 (estimator needs k-1 >= 2)")
    val h = conv(substring(md5(col(valueCol)), 1, 8), 16, 10).cast("long")
    val est = when(size(col("bk")) < k, size(col("bk")).cast("long"))
      .otherwise(expr(s"CAST(${(k - 1).toLong * 4294967296L} div element_at(bk, $k) AS BIGINT)"))
    val aggs =
      if (withExact)
        Seq(countDistinct(col(valueCol)).as("n_exact"),
          graft.expressions.BottomKAgg.bottomKHashes(h, k).as("bk"))
      else Seq(graft.expressions.BottomKAgg.bottomKHashes(h, k).as("bk"))
    val out = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("n_est", est)
    val keep = groupCols.map(col) ++
      (if (withExact) Seq(col("n_exact")) else Nil) :+ col("n_est")
    out.select(keep: _*)
  }
}
