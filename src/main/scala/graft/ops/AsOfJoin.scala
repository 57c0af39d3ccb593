package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (latest-prior) join: for every probe row, the payload of the most
  * recent reference row at-or-before it in event time, per key — the "state
  * at the time of the event" join (purchase -> last click, trade -> last
  * quote).
  *
  * Spark-first composition, no custom plan: tag both sides, union, and run
  * ONE running `last(ignoreNulls)` window per key ordered by (time, side).
  * Cost = one shuffle on the key + one sort — the same as any windowed op,
  * with none of the range-join blowup a theta-join formulation
  * (`b.ts <= a.ts` + row_number) pays: that plan is O(|A| x |B|) per key
  * before ranking; this one is O((|A|+|B|) log(|A|+|B|)).
  *
  * Ref rows sort BEFORE probe rows at equal timestamps, so "at-or-before"
  * includes exact ties. Ties BETWEEN ref rows at one timestamp are broken
  * arbitrarily (callers needing determinism there should disambiguate the
  * timestamp; sub-second event times make real ties rare).
  */
object AsOfJoin {

  /** Append `refPayloadCols` of the latest at-or-before `ref` row to each
    * `probe` row (nulls when none, or none within `toleranceSec`).
    * Payload columns colliding with probe names get `suffix`. When
    * `lagCol` is set, also appends probe-minus-ref microseconds as that
    * column.
    */
  def lastPrior(
      probe: DataFrame, ref: DataFrame,
      partitionCols: Seq[String], timeCol: String,
      refPayloadCols: Seq[String],
      toleranceSec: Option[Long] = None,
      lagCol: Option[String] = None,
      suffix: String = "_ref"): DataFrame = {
    require(partitionCols.nonEmpty, "partitionCols required (per-key as-of)")
    require(refPayloadCols.nonEmpty, "refPayloadCols required")
    require(suffix.nonEmpty, "suffix must be non-empty")

    // unresolved on purpose: binds to whichever side's select it lands in
    val micros: Column = unix_micros(col(timeCol).cast("timestamp"))

    val probePay = struct(probe.columns.map(col).toIndexedSeq: _*)
    val refPay = struct((refPayloadCols.map(col) :+ micros.as("__ref_t")): _*)
    val probePayType = probe.select(probePay).schema.head.dataType
    val refPayType = ref.select(refPay).schema.head.dataType.asInstanceOf[StructType]

    val key = partitionCols.map(col)
    val refSide = ref.select((key :+ micros.as("__t") :+ lit(0).as("__side")
      :+ lit(null).cast(probePayType).as("__p") :+ refPay.as("__r")): _*)
    val probeSide = probe.select((key :+ micros.as("__t") :+ lit(1).as("__side")
      :+ probePay.as("__p") :+ lit(null).cast(refPayType).as("__r")): _*)

    val w = Window.partitionBy(key: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__r"), ignoreNulls = true).over(w)

    val matchedRaw = refSide.unionByName(probeSide)
      .withColumn("__c", carried)
      .where(col("__side") === 1)
    val inTolerance: Column = toleranceSec match {
      case Some(tol) => col("__c").isNotNull &&
        (col("__t") - col("__c.__ref_t")) <= tol * 1000000L
      case None => col("__c").isNotNull
    }
    val c = when(inTolerance, col("__c")).otherwise(lit(null).cast(refPayType))

    val taken = scala.collection.mutable.Set(probe.columns.toIndexedSeq: _*)
    val refOut = refPayloadCols.map { rc =>
      var n = rc
      while (taken.contains(n)) n = n + suffix
      taken += n
      c.getField(rc).as(n)
    }
    val lagOut = lagCol.toSeq.map { n =>
      when(inTolerance, col("__t") - col("__c.__ref_t")).otherwise(lit(null)).as(n)
    }
    val probeOut = probe.columns.map(n => col(s"__p.`$n`").as(n)).toIndexedSeq
    matchedRaw.select((probeOut ++ refOut ++ lagOut): _*)
  }
}
