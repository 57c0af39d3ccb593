package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked SQL-query-to-DataFrame source — the reference's
  * `read.dbi.ffdf` / `read.odbc.ffdf` / `read.jdbc.ffdf` triplet
  * (`R/ffsql.R:108-339`, `:394-623`, `:676-908`) unified into ONE operator.
  * The triplication in the reference is an artifact of R driver APIs; Spark's
  * JDBC source covers DBI/ODBC/JDBC with a URL + properties.
  *
  * Reference semantics preserved:
  *  - arbitrary `query` executed verbatim by the remote database — full
  *    relational pushdown by construction (`R/ffsql.R:171-176`).
  *  - `nrows` row cap across chunks (`R/ffsql.R:277-281`) -> `.limit(n)`,
  *    which Spark pushes to the remote as `LIMIT` where supported.
  *  - memory-bounded chunk size: `BATCHBYTES %/% recordsize`
  *    (`R/ffsql.R:245-251`) -> JDBC `fetchsize` computed from the JDBC
  *    schema's field widths when `batchBytes` is given.
  *  - `transFUN` per-chunk transform hook (`R/ffsql.R:186`, may change
  *    schema, example `:70-76`) -> a `DataFrame => DataFrame` applied to the
  *    stream; row-wise transforms are chunk/whole equivalent, and the final
  *    schema is inferred from the transformed plan exactly like the
  *    reference infers from the transformed first chunk.
  *  - append mode (`R/ffsql.R:267-272`): re-execute the query and append the
  *    ENTIRE result to `appendTo` (it is append-these-results, NOT resume).
  *    Done via `unionByName`.
  *  - `levels` override + dictionary union on append
  *    (`R/ffsql.R:191-200`, `:311-316`) -> `graft.ops.Ops.factorise`
  *    metadata; physical dictionary encoding is automatic in Parquet/Tungsten.
  *  - zero-row results: the reference returns a raw data.frame
  *    (`R/ffsql.R:209-215`); we return an empty DataFrame with the
  *    JDBC-derived schema — strictly better, divergence documented.
  *
  * Scale design: `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`
  * turn the reference's sequential chunk loop into N parallel range-scanning
  * executor connections; `fetchsize` bounds per-connection memory exactly as
  * `BATCHBYTES` bounded the reference's chunks.
  */
object ReadSql {

  def apply(
      spark: SparkSession,
      url: String,
      query: String,
      props: Properties = new Properties(),
      nrows: Long = -1L,
      fetchSize: Int = 0,
      batchBytes: Long = 0L,
      transform: DataFrame => DataFrame = identity,
      appendTo: Option[DataFrame] = None,
      levels: Map[String, Seq[String]] = Map.empty,
      orderedFactors: Boolean = false,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 0L,
      numPartitions: Int = 0,
      verbose: Boolean = false,
      maxFactorLevels: Int = 65536): DataFrame = {
    GraftDerbyDialect.ensureRegistered()

    def base(extra: Map[String, String]): DataFrame = {
      var r = spark.read.format("jdbc").option("url", url)
      props.stringPropertyNames().forEach(k => r = r.option(k, props.getProperty(k)))
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load()
    }

    // fetchsize: explicit wins; else derive rows-per-fetch from batchBytes
    // and the JDBC schema (metadata-only plan, no data read) — the
    // reference's `BATCHBYTES %/% sum(.rambytes[vmode(x)])`, min 1
    // (`R/ffsql.R:245-251`).
    val fetch: Int =
      if (fetchSize > 0) fetchSize
      else if (batchBytes > 0L) {
        val schema = base(Map("query" -> query)).schema
        val rowBytes = math.max(1, schema.fields.map(_.dataType.defaultSize).sum)
        math.max(1, (batchBytes / rowBytes).toInt)
      } else 1000 // reference default first.rows/next.rows = 1000 (`R/ffsql.R:152-161`)

    val partOpts: Map[String, String] = partitionColumn match {
      case Some(c) =>
        require(numPartitions > 0, "numPartitions required with partitionColumn")
        Map("partitionColumn" -> c, "lowerBound" -> lowerBound.toString,
          "upperBound" -> upperBound.toString, "numPartitions" -> numPartitions.toString)
      case None => Map.empty
    }
    // Spark's JDBC partitioned read requires dbtable, not query.
    val srcOpt: Map[String, String] =
      if (partOpts.nonEmpty) Map("dbtable" -> s"($query) AS graft_sub") else Map("query" -> query)

    val raw = base(srcOpt ++ partOpts + ("fetchsize" -> fetch.toString))
    require(nrows <= Int.MaxValue,
      s"nrows=$nrows exceeds Spark's Int limit cap; drop the cap or filter in SQL")
    val limited = if (nrows >= 0L) raw.limit(nrows.toInt) else raw
    val transformed = transform(limited)

    // `levels` override: force the dictionary of chosen string columns
    // (`R/ffsql.R:191-200`), validated against column names (`:194-196`).
    val badLevels = levels.keySet -- transformed.columns.toSet
    require(badLevels.isEmpty, s"levels for unknown columns: ${badLevels.mkString(", ")}")
    val withLevels =
      if (levels.isEmpty) transformed
      else graft.ops.Ops.factorise(transformed, cols = levels.keys.toSeq,
        ordered = orderedFactors, levelsOverride = levels)

    val out = appendTo match {
      case Some(existing) =>
        // Append-time dictionary union (`R/ffsql.R:311-316`): per factor
        // column, old levels first, then unseen new levels — first-seen order.
        val factorCols = existing.columns.filter(c =>
          graft.ops.Ops.levelsOf(existing, c).isDefined).toSeq
        val merged = existing.unionByName(withLevels)
        if (factorCols.isEmpty) merged
        else {
          // Unseen new levels are appended in FIRST-SEEN order of the
          // incoming rows (`R/ffsql.R:311-316`), not lexicographically:
          // stamp the incoming frame with a dense row ordinal once (the
          // reference's implicit ffdf row order made explicit) and rank
          // each new level by the first row it appears on.
          lazy val stamped = graft.ops.Ordinals.withRowOrdinal(
            withLevels, "_graft_seen").localCheckpoint(true)
          val unioned = factorCols.map { c =>
            val old = graft.ops.Ops.levelsOf(existing, c).get
            val incoming = levels.getOrElse(c,
              graft.ops.Ops.factorLevelsFirstSeen(
                stamped, c, "_graft_seen", maxFactorLevels))
            c -> (old ++ incoming.filterNot(old.contains))
          }.toMap
          graft.ops.Ops.factorise(merged, cols = factorCols,
            ordered = orderedFactors, levelsOverride = unioned)
        }
      case None => withLevels
    }
    if (verbose) {
      // The reference's VERBOSE per-chunk wall-times (`R/ffsql.R:201-205`)
      // map to per-action listener reports (rows + wall-time, [[Verbose]]);
      // the effective chunking + plan print once, here.
      Verbose.register(spark)
      println(s"[graft.io.ReadSql] fetchsize=$fetch nrows=$nrows partitions=" +
        (if (partOpts.nonEmpty) numPartitions else 1))
      out.explain("formatted")
    }
    out
  }
}
