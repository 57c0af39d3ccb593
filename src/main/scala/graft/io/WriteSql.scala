package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Chunked DataFrame-to-database sink — the reference's `write.dbi.ffdf` /
  * `write.jdbc.ffdf` / `write.odbc.ffdf` (`R/ffsql.R:972-1010`, `:1060-1098`,
  * `:1150-1180`) unified into one operator over Spark's JDBC writer.
  *
  * Reference semantics preserved:
  *  - non-empty input required (`stopifnot(nrow(x) > 0)`, `R/ffsql.R:980`).
  *  - chunked inserts: `by` rows per round-trip (`bit::chunk`,
  *    `R/ffsql.R:991`) -> JDBC `batchsize`.
  *  - first-chunk `overwrite` then forced append for the rest
  *    (`R/ffsql.R:1001-1006`) is EXACTLY Spark's `SaveMode.Overwrite`
  *    (truncate/recreate once on the driver, then parallel partition
  *    inserts). Default (no flag) errors if the table exists, like
  *    `dbWriteTable`'s default.
  *
  * Divergence (documented, `SURVEY.md §2.2`): the reference's single
  * connection preserves row order; Spark writes partitions in parallel.
  * `orderedBy=Some(col)` restores reference behavior (global sort + ONE
  * writing partition) — parity mode for modest data; at scale leave unset.
  */
object WriteSql {

  def apply(
      df: DataFrame,
      url: String,
      table: String,
      props: Properties = new Properties(),
      overwrite: Boolean = false,
      append: Boolean = false,
      batchSize: Int = 1000,
      numPartitions: Int = 0,
      orderedBy: Option[String] = None,
      requireNonEmpty: Boolean = true): Unit = {
    GraftDerbyDialect.ensureRegistered()
    require(!(overwrite && append), "overwrite and append are exclusive")
    // Reference semantic `stopifnot(nrow(x) > 0)`. NOTE: this check runs the
    // upstream plan once before the write runs it again — for an expensive
    // pipeline either persist the input or pass requireNonEmpty = false.
    if (requireNonEmpty)
      require(df.head(1).nonEmpty, "nothing to write: input has zero rows")

    val arranged = orderedBy match {
      case Some(c) => df.orderBy(col(c)).coalesce(1)
      case None if numPartitions > 0 => df.repartition(numPartitions)
      case None => df
    }
    val mode =
      if (overwrite) SaveMode.Overwrite
      else if (append) SaveMode.Append
      else SaveMode.ErrorIfExists

    arranged.write
      .mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
  }
}
