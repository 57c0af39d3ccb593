package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Contiguous global row ordinals — the ffdf's implicit row order
  * (`R/ffsql.R:320-323`) made explicit.
  *
  * The reference's table abstraction is row-ordered and growable; LOCF (W1)
  * and order-preserving egress depend on it. Spark DataFrames are unordered
  * multisets, so order-sensitive pipelines materialize an ordinal at ingest
  * and carry it. `monotonically_increasing_id` is NOT contiguous (partition
  * id is baked into the high bits), which breaks cross-batch append
  * arithmetic — this helper produces dense 0..n-1 ordinals like
  * `zipWithIndex`: one lightweight count pass for partition sizes, then a
  * partition-parallel stamp. Appends continue at `startAt = prev max + 1`.
  */
object Ordinals {

  def withRowOrdinal(
      df: DataFrame,
      colName: String = "_rowpos",
      startAt: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(colName, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Append `extra` after `base`, continuing the ordinal sequence — the
    * reference's `nrow(x) <- nff + n; x[hi(...),] <- dat` append
    * (`R/ffsql.R:320-323`) as a union with ordinal offset.
    */
  def appendWithOrdinal(
      base: DataFrame,
      extra: DataFrame,
      colName: String = "_rowpos"): DataFrame = {
    val maxRow = base.agg(org.apache.spark.sql.functions.max(col(colName))).head()
    val next = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) + 1L
    base.unionByName(withRowOrdinal(extra, colName, next))
  }
}
