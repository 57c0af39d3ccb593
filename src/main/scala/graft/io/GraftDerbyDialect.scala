package graft.io

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, StringType}

/** Spark's stock Derby dialect maps StringType to CLOB, and Derby cannot
  * compare CLOB with CHAR — which silently breaks every pushed-down string
  * predicate on a table our sink created. Mapping strings to a wide VARCHAR
  * keeps filters pushdown-able (the reference's whole design is predicates
  * running inside the database, `R/ffsql.R:171-176`).
  */
object GraftDerbyDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    // Derby VARCHAR max is 32672
    case StringType => Some(JdbcType("VARCHAR(32000)", java.sql.Types.VARCHAR))
    case _ => None // fall through to the default Derby mappings
  }

  private val registered = new AtomicBoolean(false)

  /** Idempotently put this dialect ahead of the built-in one. */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
