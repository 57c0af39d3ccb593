package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: fixed-width time buckets per key over each key's
  * observed span, with GAP buckets materialized (no silent holes) and the
  * aggregate carried forward (LOCF) across empty buckets — the standard
  * "regularize an irregular event stream" move before windowed feature
  * extraction, and the grid shape the reference's `naLOCFPlusone`
  * (`R/utils.R:64-80`) assumes already exists.
  *
  * Scale: the grid is `sequence(lo, hi)` exploded per KEY — rows bounded by
  * (span / bucket) per key, never a global driver-side calendar; the join
  * back to the bucket aggregates and the LOCF window both partition by key,
  * so every stage is key-parallel with map-side partial aggregation on the
  * bucket sums. No stage depends on the number of distinct keys fitting
  * anywhere.
  */
object Resample {

  /** Resample `df` to `bucketSeconds`-wide buckets of `tsCol` per `keyCol`:
    * one row per (key, bucket) from the key's min to max bucket, with
    * `n_events` (0 on gaps) and `sum_value` = decimal-routed exact sum of
    * `valueCol`, LOCF-carried across gap buckets. `tsCol` must be a
    * timestamp column; buckets are epoch-seconds divided by `bucketSeconds`
    * (floor).
    */
  def locf(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketSeconds: Long = 3600L, sumScale: Int = 4): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val e = df.select(
      col(keyCol),
      floor(unix_timestamp(col(tsCol)).cast("double") / bucketSeconds)
        .cast("long").as("bucket"),
      col(valueCol).as("__v"))
    val agg = e.groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__v").cast(s"decimal(18,$sumScale)")).cast("double").as("__sv"))
    // the grid derives from the BUCKET AGGREGATE, not the raw events: same
    // min/max per key, but the second aggregation reads |keys × buckets|
    // pre-aggregated rows (and reuses agg's shuffle) instead of rescanning
    // the full input
    val grid = agg.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val joined = grid.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
    // LOCF: the first bucket per key always has events (lo = min observed
    // bucket), so last(ignoreNulls) never leaves a leading null
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("sum_value", last(col("__sv"), ignoreNulls = true).over(w))
      .drop("__sv")
  }
}
