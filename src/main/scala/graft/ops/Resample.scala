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
    // The LOCF *is* the gap explode: each aggregated (key, bucket) row
    // knows the next observed bucket via lead(), so it emits its own
    // bucket plus every gap bucket up to (next - 1) — the carried sum is
    // constant across that range by definition of LOCF, and gap rows take
    // n_events = 0. This produces the identical grid to a generated
    // sequence joined back (first bucket per key is observed, so no
    // leading null exists), but the plan is the agg exchange plus ONE
    // per-key window over |keys x observed buckets| pre-aggregated rows —
    // no grid join, no second window pass over the materialized grid.
    val w = Window.partitionBy(keyCol).orderBy("bucket")
    agg
      .withColumn("__next", lead(col("bucket"), 1).over(w))
      .withColumnRenamed("bucket", "__ob")
      .withColumnRenamed("n_events", "__ne")
      .select(col(keyCol), col("__ob"), col("__ne"), col("__sv"),
        explode(sequence(col("__ob"),
          coalesce(col("__next") - 1, col("__ob")))).as("bucket"))
      .select(col(keyCol), col("bucket"),
        when(col("bucket") === col("__ob"), col("__ne"))
          .otherwise(lit(0L)).as("n_events"),
        col("__sv").as("sum_value"))
  }
}
