package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension keys so
  * that rows close in BOTH dimensions land close in ONE sort order. Laying a
  * 100 TB table out by z-value means a range predicate on either dimension
  * prunes most files (min/max stats per file stay tight on both columns) —
  * the standard multi-dimensional data-skipping layout, here as a plain
  * column expression plus a range repartition.
  *
  * The bit-spread cascade is the classic shift-or-mask Morton encoding; the
  * step table below drives BOTH the Column implementation and [[zValueSql]]
  * (ANSI SQL text of the same computation), so an external engine computes
  * bit-identical z-values and the oracle cannot drift from the plan.
  *
  * Inputs must be non-negative and < 2^16 (mask them first: `x % 65536`);
  * the interleaved result is a 32-bit value in a BIGINT.
  */
object ZOrder {

  /** (shift, mask) cascade spreading a 16-bit value to even bit positions. */
  private val steps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` to even positions (bit i -> bit 2i). */
  def spreadBits16(c: Column): Column =
    steps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton z-value of two 16-bit dimensions: x on even bits, y on odd. */
  def zValue16(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** ANSI SQL text of [[spreadBits16]] over the SQL expression `e` —
    * generated from the same step table as the Column form.
    */
  def spreadBits16Sql(e: String): String =
    steps.foldLeft(s"(($e) & 65535)") { case (x, (s, m)) =>
      s"((($x | ($x << $s))) & $m)"
    }

  /** ANSI SQL text of [[zValue16]]. */
  def zValue16Sql(x: String, y: String): String =
    s"(${spreadBits16Sql(x)} | (${spreadBits16Sql(y)} << 1))"

  /** Cluster `df` by the z-value of two 16-bit dimension expressions:
    * range-repartition into `numPartitions` z-ranges, sorted within each —
    * the write-side layout op (each output file covers a tight z-range, so
    * both dimensions' min/max file stats prune well).
    */
  def cluster(
      df: DataFrame, x: Column, y: Column, numPartitions: Int,
      zCol: String = "zval"): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    df.withColumn(zCol, zValue16(x, y))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
  }
}
