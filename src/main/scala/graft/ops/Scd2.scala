package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history: turn an insert/update/delete changelog
  * into effective-dated version rows `(key, attrs..., valid_from,
  * valid_to, is_current)` — the history-keeping counterpart of
  * [[ChangeApply]]'s latest-state merge. The reference keeps only the
  * latest appended state (`read.*.ffdf(x = existing)` concatenates new
  * chunks, `R/ffsql.R:267-272`); a warehouse dimension needs the full
  * version history with validity intervals, which this operator builds.
  *
  * Contract (shared with [[ChangeApply]]): `changes` carries `keyCol`,
  * `seqCol` (change version — strictly orders versions within a key),
  * `opCol` ('I'/'U'/'D'), and attribute columns. Each 'I'/'U' opens a
  * version effective at its `seq`; the key's next change (any op) closes
  * it at that change's `seq` (half-open interval `[valid_from,
  * valid_to)`). A 'D' closes the prior version and opens nothing — a
  * later 'I' re-opens the key. `(key, seq)` pairs should be unique; ties
  * break on `opCol` descending so output is deterministic regardless.
  * `is_current` is 1 for the open (unclosed, non-deleted) version.
  *
  * Scale: ONE shuffle of the changelog on `keyCol` (the per-key ordering
  * window — inherent to versioning, and it is the changelog that
  * shuffles, never an existing history; see [[applyDelta]] for the
  * incremental form where that difference is the whole point).
  */
object Scd2 {

  private val ValidFrom = "valid_from"
  private val ValidTo = "valid_to"
  private val IsCurrent = "is_current"

  private def checkCols(
      df: DataFrame, keyCol: String, seqCol: String, opCol: String): Unit = {
    for (c <- Seq(keyCol, seqCol, opCol))
      require(df.columns.contains(c), s"changes lack column $c")
    for (c <- Seq(ValidFrom, ValidTo, IsCurrent))
      require(!df.columns.contains(c),
        s"changes must not already contain $c")
  }

  /** Full-history build from a complete changelog. Output columns:
    * key, attrs..., `valid_from` (= the version's change seq), `valid_to`
    * (next change's seq; null while open), `is_current` (int 0/1).
    */
  def buildHistory(
      changes: DataFrame, keyCol: String, seqCol: String,
      opCol: String): DataFrame = {
    checkCols(changes, keyCol, seqCol, opCol)
    val attrs = changes.columns.toSeq
      .filterNot(c => c == keyCol || c == seqCol || c == opCol)
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).asc, col(opCol).desc)
    changes
      .withColumn(ValidTo, lead(col(seqCol), 1).over(w))
      .where(col(opCol) =!= "D") // D closes its predecessor via lead; no row
      .select((col(keyCol) +: attrs.map(col)) ++ Seq(
        col(seqCol).as(ValidFrom),
        col(ValidTo),
        col(ValidTo).isNull.cast("int").as(IsCurrent)): _*)
  }

  /** Incremental SCD2 merge: close the open versions touched by a delta
    * changelog and append the delta's new versions — bit-identical to
    * rebuilding with [[buildHistory]] over the concatenated changelog
    * (spec-asserted), at delta cost.
    *
    * Contract: every delta `seq` for a key must be STRICTLY greater than
    * that key's open `valid_from` in `history` (late-arriving changes
    * need a rebuild of the affected keys — versioning is order-dependent
    * by nature). `history` must be a [[buildHistory]]-shaped frame.
    *
    * Scale (100 TB shape: history >> daily delta): the history side NEVER
    * shuffles — each touched key's first delta seq arrives by broadcast
    * join (bounded by delta key count) to close the open version
    * map-side; closed versions pass through untouched; the delta alone
    * pays the [[buildHistory]] window shuffle. Set `broadcastTouched =
    * false` when the delta key set is too large to broadcast. The delta
    * subtree feeds two consumers (close-seq agg + history build) — bounded
    * by delta size; persist upstream if computing it is expensive.
    */
  def applyDelta(
      history: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String,
      broadcastTouched: Boolean = true): DataFrame = {
    checkCols(changes, keyCol, seqCol, opCol)
    for (c <- Seq(ValidFrom, ValidTo, IsCurrent))
      require(history.columns.contains(c), s"history lacks column $c")
    val closeSeq = {
      val f = changes.groupBy(col(keyCol))
        .agg(min(col(seqCol)).as("__scd_close_seq"))
      if (broadcastTouched) broadcast(f) else f
    }
    val closed = history
      .join(closeSeq, Seq(keyCol), "left")
      .withColumn(ValidTo,
        when(col(IsCurrent) === 1 && col("__scd_close_seq").isNotNull,
          col("__scd_close_seq")).otherwise(col(ValidTo)))
      .withColumn(IsCurrent,
        (col(IsCurrent) === 1 && col("__scd_close_seq").isNull)
          .cast("int"))
      .drop("__scd_close_seq")
    closed.unionByName(buildHistory(changes, keyCol, seqCol, opCol))
  }

  /** Point-in-time snapshot: the version of each key effective at `seq`
    * (half-open intervals: `valid_from <= seq < valid_to`). Deleted /
    * not-yet-inserted keys are absent. A pure filter — no shuffle.
    */
  def asOf(history: DataFrame, seq: Column): DataFrame =
    history
      .where(col(ValidFrom) <= seq &&
        (col(ValidTo).isNull || col(ValidTo) > seq))
      .drop(ValidFrom, ValidTo, IsCurrent)
}
