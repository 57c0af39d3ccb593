package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff for incremental pipelines: classify every id across two
  * corpus versions as `added` / `removed` / `changed` / `unchanged` — the
  * audit step before an incremental re-process (only `added`+`changed` need
  * re-embedding/re-scoring, `removed` needs tombstoning downstream).
  *
  * Scale: content equality is decided on `md5(contentCol)` computed BEFORE
  * the join, so the full-outer shuffle carries 32-byte digests instead of
  * document bodies; the join itself is a plain hash-partitioned equi-join
  * on the id. One scan per side, one shuffle each.
  */
object SnapshotDiff {

  /** `(idCol, status)` for the union of ids in `oldDf` and `newDf`.
    * `contentCol` must be non-null (a null hashes to null and would read as
    * a missing row); ids must be unique per side — enforce upstream with
    * [[graft.ext.Dedup.exact]] if unsure.
    */
  def apply(
      oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(contentCol)).as("__old_h"))
    val n = newDf.select(col(idCol), md5(col(contentCol)).as("__new_h"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__old_h").isNull, "added")
          .when(col("__new_h").isNull, "removed")
          .when(col("__old_h") =!= col("__new_h"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
