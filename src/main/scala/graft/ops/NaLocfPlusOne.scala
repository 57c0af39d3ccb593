package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Gap-fill: replace each null with the last non-null value carried forward
  * PLUS its 1-based position inside the null run.
  *
  * Reference: `naLOCFPlusone`, `R/utils.R:49-52` —
  * `ix <- cumsum(is.na(x)); na.locf(x) + ix - cummax(ix * !is.na(x))`.
  * Example: `2, NA, NA, 4, 5, 2, NA` -> `2, 3, 4, 4, 5, 2, 3`.
  *
  * Divergence (documented): the reference errors on a leading null
  * (`zoo::na.locf` drops it, then lengths mismatch). We define leading nulls
  * to REMAIN null (the `ignoreNulls` convention) — strictly more total.
  * `strict = true` restores reference parity: a leading null raises (at
  * action time — Spark is lazy where R is eager), per round-16 verdict #7.
  *
  * Scale design — this is the one reference operator that needs a total row
  * order, and a naive `Window.orderBy(ord)` collapses the whole table onto
  * ONE task. Instead we run a two-pass, fully partition-parallel algorithm:
  *
  *   1. `repartitionByRange(ord)` + `sortWithinPartitions(ord)` — a single
  *      range shuffle; every partition holds a contiguous, sorted key range.
  *   2. Pass 1 computes a tiny per-partition summary (row count, last
  *      non-null value, trailing-null run length) — O(partitions) rows
  *      collected to the driver.
  *   3. A driver-side prefix scan (associative carry combine) yields each
  *      partition's incoming state, broadcast back.
  *   4. Pass 2 streams each partition once, applying LOCF+runpos with the
  *      carried-in state.
  *
  * Both passes are sequential scans with no further shuffle; the driver
  * holds O(num_partitions) data. This survives a 100 TB input where the
  * single-task window would not.
  */
object NaLocfPlusOne {

  /** Per-partition carry state: has the prefix seen a non-null value, what
    * was it, and how long is the null run still open at the prefix end.
    */
  private final case class Carry(has: Boolean, last: Double, openRun: Long)

  /** @param df        input
    * @param orderCol  total-order column (must be globally unique, e.g. an
    *                  ingest ordinal or event id)
    * @param valueCol  numeric column to gap-fill (cast to double)
    * @param outCol    name of the appended filled column
    * @param partitions range-partition count (0 = spark.sql.shuffle.partitions)
    * @param strict    reference-parity mode (round-16 verdict #7): raise on
    *                  a LEADING null like `naLOCFPlusone` does
    *                  (`R/utils.R:51` — `zoo::na.locf` drops it and the
    *                  lengths mismatch) instead of the default
    *                  keep-it-null divergence. The error surfaces at
    *                  ACTION time (executor-side), not at plan time —
    *                  Spark is lazy where R is eager.
    */
  def apply(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String = "filled",
      partitions: Int = 0,
      strict: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val prepared = df.withColumn(valueCol, col(valueCol).cast(DoubleType))
    val sorted = prepared
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema: StructType = sorted.schema
    val vIdx = schema.fieldIndex(valueCol)

    // Both passes evaluate this RDD; the range shuffle is computed once and
    // reused via Spark's shuffle-file reuse (the second evaluation skips the
    // map stage), so no explicit persist is needed.
    val rdd = sorted.rdd

    // Pass 1: tiny per-partition summaries.
    val summaries: Array[(Int, Long, Carry)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var count = 0L; var has = false; var last = 0.0; var trail = 0L
        while (it.hasNext) {
          val r = it.next(); count += 1
          if (r.isNullAt(vIdx)) trail += 1
          else { has = true; last = r.getDouble(vIdx); trail = 0 }
        }
        Iterator.single((pid, count, Carry(has, last, trail)))
      }
      .collect()
      .sortBy(_._1)

    // Driver-side prefix scan: state BEFORE each partition.
    val carries = new Array[Carry](summaries.length)
    var st = Carry(has = false, last = 0.0, openRun = 0L)
    summaries.zipWithIndex.foreach { case ((_, cnt, s), i) =>
      carries(i) = st
      st =
        if (s.has) Carry(has = true, s.last, s.openRun)
        else Carry(st.has, st.last, st.openRun + cnt)
    }
    val bc = spark.sparkContext.broadcast(carries)

    // Pass 2: apply LOCF + run position with carried-in state.
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val c0 = bc.value(pid)
      var has = c0.has; var last = c0.last; var run = c0.openRun
      it.map { r =>
        val filled: java.lang.Double =
          if (r.isNullAt(vIdx)) {
            run += 1
            if (has) java.lang.Double.valueOf(last + run)
            else if (strict) throw new IllegalStateException(
              s"leading null in '$valueCol' under strict=true — the " +
                "reference errors here (zoo::na.locf drops it and the " +
                "lengths mismatch, R/utils.R:51); default strict=false " +
                "keeps leading nulls null")
            else null
          } else {
            last = r.getDouble(vIdx); has = true; run = 0
            java.lang.Double.valueOf(last)
          }
        Row.fromSeq(r.toSeq :+ filled)
      }
    }
    val outSchema = schema.add(outCol, DoubleType, nullable = true)
    spark.createDataFrame(outRdd, outSchema)
  }

  /** Per-group LOCF+1: the same gap-fill within each group (e.g. per user,
    * per sensor). Unlike the global variant, this needs NO custom two-pass
    * machinery — a window partitioned by the group keys is already
    * partition-parallel and codegen'd, because each group's order is local.
    * This is the form a 100 TB pipeline should prefer whenever a grouping
    * key exists.
    *
    * Same cumsum/cummax identity as the reference (`R/utils.R:50-51`):
    * `filled = locf + ix - cummax(ix * notNull)`.
    */
  def byGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      outCol: String = "filled",
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol).cast(DoubleType)
    val ix = sum(when(v.isNull, 1L).otherwise(0L)).over(w)
    val locf = last(v, ignoreNulls = true).over(w)
    val cm = max(when(v.isNotNull, ix).otherwise(0L)).over(w)
    // strict reference parity (see apply): a null with no prior non-null
    // in ITS GROUP is a leading null — raise in-plan (raise_error rides
    // the same projection, so the check is free) instead of keeping null
    val onLeading =
      if (strict) raise_error(concat(lit(
        s"leading null in '$valueCol' under strict=true (group "),
        concat_ws(",", groupCols.map(c => col(c).cast("string")): _*),
        lit(") — the reference errors here, R/utils.R:51"))).cast(DoubleType)
      else lit(null).cast(DoubleType)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(locf.isNull, onLeading)
        .otherwise(locf + (ix - cm)))
  }

  /** Linear-interpolation gap fill per group — the time-series sibling of
    * the reference's LOCF family: each null gets
    * `prev + (next - prev) * (ord - prev_ord) / (next_ord - prev_ord)`
    * between its nearest non-null neighbors in `orderCol` order; leading
    * nulls backfill from the first value, trailing nulls carry the last
    * (LOCF), all-null groups stay null. One fixed IEEE double tree over
    * the neighbor values and integer positions — engine-exact.
    *
    * Two ignore-nulls window passes on ONE group exchange (running last /
    * reversed-frame first of the `(ord, value)` pair); no self-join, no
    * explode. For an UNGROUPED total-order fill at 100 TB use the
    * range-partitioned two-pass architecture of [[apply]] — this is the
    * per-series (bounded-partition) variant, the shape metric series
    * actually have.
    */
  def interpolateByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      outCol: String = "filled",
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val v = col(valueCol).cast(DoubleType)
    val pair = when(v.isNotNull, struct(col(orderCol).as("o"), v.as("v")))
    val wPrev = Window.partitionBy(g: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(g: _*).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prev = last(pair, ignoreNulls = true).over(wPrev)
    val next = first(pair, ignoreNulls = true).over(wNext)
    val interp = prev.getField("v") +
      (next.getField("v") - prev.getField("v")) *
        (col(orderCol) - prev.getField("o")).cast(DoubleType) /
        (next.getField("o") - prev.getField("o")).cast(DoubleType)
    df.withColumn(outCol, round(
      when(v.isNotNull, v)
        .when(prev.isNull && next.isNull, lit(null).cast(DoubleType))
        .when(prev.isNull, next.getField("v"))
        .when(next.isNull, prev.getField("v"))
        .otherwise(interp), roundTo))
  }
}
