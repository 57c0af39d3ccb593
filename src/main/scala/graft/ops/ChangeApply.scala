package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge: apply an insert/update/delete changelog to a snapshot — the
  * "keep a local mirror of a mutating remote table" counterpart of the
  * reference's append-only ingest (`read.*.ffdf(x = existing)` re-executes
  * and concatenates, `R/ffsql.R:267-272`; a mutating source needs
  * upsert-apply instead, which this operator provides).
  *
  * Contract: `changes` carries `keyCol`, `seqCol` (change version — later
  * wins), `opCol` ('I'/'U'/'D'), and — for I/U rows — every snapshot column.
  * For each key, only the change with the highest `(seq, op)` applies:
  * 'D' removes the row, 'I'/'U' replace it (upsert — an 'I' for an existing
  * key behaves like 'U', matching SQL MERGE). Keys without changes pass
  * through. `(key, seq)` pairs should be unique; ties break on `opCol`
  * descending so the result is deterministic regardless. Keys and ops must
  * be non-null: a null op compares as neither 'D' nor not-'D' and its row
  * is dropped (SQL three-valued filter semantics), and null keys join
  * nothing in the anti-join step.
  *
  * Scale (the 100 TB shape: snapshot >> daily changelog):
  *   - latest-change-per-key runs on the native [[graft.plans.GroupTopK]]
  *     heap operator — per-partition k=1 heaps, so the only full shuffle is
  *     over the CHANGELOG, carrying at most one row per (key, partition);
  *   - the snapshot itself never shuffles: touched keys are broadcast and
  *     removed with a broadcast LEFT ANTI join (map-side), then surviving
  *     upserts are unioned on. Set `broadcastKeys = false` when the touched
  *     key set is too large to broadcast — the anti join then degrades to a
  *     shuffle join, which AQE may still convert back.
  *
  * The latest-change subtree feeds two consumers (broadcast keys + upsert
  * union), so Spark evaluates the CHANGELOG pipeline twice — bounded by the
  * delta size, never the snapshot. Persist `changes` upstream if computing
  * it is expensive.
  */
object ChangeApply {

  def apply(
      snapshot: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String,
      broadcastKeys: Boolean = true): DataFrame = {
    val snapCols = snapshot.columns.toSeq
    require(snapCols.contains(keyCol), s"snapshot lacks key column $keyCol")
    require(!snapCols.contains(seqCol) && !snapCols.contains(opCol),
      s"snapshot must not already contain $seqCol/$opCol")
    val missing = snapCols.filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes lack snapshot columns: $missing")

    // latest change per key: GroupTopK k=1 — heap partial phase means the
    // pre-shuffle volume is one row per (key, input partition), not the
    // whole changelog. Rank column name is internal; dropped below.
    val latest = graft.plans.GroupTopK(
      changes.select((Seq(keyCol, seqCol, opCol) ++
        snapCols.filterNot(_ == keyCol)).map(col): _*),
      groupCols = Seq(keyCol),
      orderKeys = Seq(seqCol -> false, opCol -> false), k = 1,
      rankName = "__ca_rnk")

    val touchedKeys = {
      val k = latest.select(col(keyCol))
      if (broadcastKeys) broadcast(k) else k
    }
    val untouched = snapshot.join(touchedKeys, Seq(keyCol), "left_anti")
    val upserts = latest
      .where(col(opCol) =!= "D")
      .select(snapCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
