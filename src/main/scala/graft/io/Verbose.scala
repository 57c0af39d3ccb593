package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** VERBOSE-mode progress reporting — the Spark analog of the reference's
  * per-chunk fetch lines (`R/ffsql.R:201-205`, `:299-303`: rows fetched +
  * wall-time per batch).
  *
  * Spark has no sequential chunk loop to instrument; the unit of progress is
  * the query execution. A [[QueryExecutionListener]] reports, per action:
  * wall-time, rows scanned at the leaves (the "fetched" count — for a JDBC
  * read this is the rows pulled over the connection), and rows returned by
  * the root plan. Listener callbacks are delivered asynchronously on the
  * listener bus — lines can trail the action that produced them.
  */
object Verbose {

  final class Listener(sink: String => Unit) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val scanned = qe.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      val outRows = qe.executedPlan.metrics.get("numOutputRows")
        .map(m => s", ${m.value} rows out").getOrElse("")
      sink(f"[graft.verbose] $funcName: ${durationNs / 1e9}%.3f s, " +
        s"$scanned rows scanned$outRows")
    }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      sink(s"[graft.verbose] $funcName FAILED: ${ex.getMessage}")
  }

  // weak keys: a session registered verbose but never unregistered must not
  // be pinned for the process lifetime (the listener itself dies with the
  // session's listener bus; only this bookkeeping entry would leak). The
  // VALUE is held through a WeakReference too: a sink closure that captures
  // the SparkSession would otherwise form a value→key strong path that
  // defeats the weak key. The listener stays reachable while registered —
  // the session's listenerManager holds it strongly — so the ref is only
  // cleared once the session itself is collectable.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.ref.WeakReference[Listener]]())

  /** Register the verbose listener on the session (idempotent per session).
    * Returns the listener so tests/tools can unregister it.
    */
  def register(spark: SparkSession, sink: String => Unit = Console.out.println): Listener =
    registered.synchronized {
      val existing = registered.get(spark)
      val live = if (existing != null) existing.get else null
      if (live != null) live
      else {
        val l = new Listener(sink)
        spark.listenerManager.register(l)
        registered.put(spark, new java.lang.ref.WeakReference(l))
        l
      }
    }

  def unregister(spark: SparkSession): Unit = registered.synchronized {
    val ref = registered.remove(spark)
    val l = if (ref != null) ref.get else null
    if (l != null) spark.listenerManager.unregister(l)
  }
}
