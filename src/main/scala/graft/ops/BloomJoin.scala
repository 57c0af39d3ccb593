package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered joins: shed non-matching rows of the BIG side *before*
  * its shuffle using a compact sketch of the small side's key set.
  *
  * At 100 TB the dominant cost of `big ⋉ small` is shuffling the big side
  * when `small` exceeds the broadcast threshold. A Bloom filter of small's
  * keys is kilobytes-to-megabytes regardless of row width, ships to every
  * task, and is probed inside WholeStageCodegen
  * ([[BloomFilterMightContain]] has `doGenCode`) — so most non-matching big
  * rows never reach the exchange. False positives are harmless: the exact
  * join that follows removes them; the sketch only controls how much
  * useless data the shuffle carries (fpp = fraction of non-matching rows
  * that still shuffle). This is the manual, composable form of what AQE's
  * runtime row-level filtering injects for some plans automatically.
  *
  * Keys are probed as `xxhash64(key)` longs — the same item is inserted on
  * the build side, so any key type works.
  */
object BloomJoin {

  /** Build a Bloom filter over `xxhash64(keyCol)` of `df`. One bounded
    * driver-side sketch (`log2(1/fpp) * expectedItems / ln4` bits) — never
    * the key set itself.
    */
  def buildFilter(
      df: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(xxhash64(col(keyCol)), expectedItems, fpp)

  /** Codegen'd membership probe of `value`'s xxhash64 against `bf`. */
  def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      new XxHash64(Seq(ColumnBridge.convertedExpression(value)))))
  }

  /** `big ⋉ small` (left semi) with a Bloom prefilter on the big side.
    * Result is EXACTLY the semi join (the sketch never changes the answer,
    * only the shuffle volume). `expectedItems` defaults to a count of the
    * small side — pass it explicitly to skip that extra job.
    */
  def semi(
      big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else math.max(1L, small.count())
    val bf = buildFilter(small, smallKey, n, fpp)
    // rename the build key to a fresh name: an unqualified smallKey === bigKey
    // condition is ambiguous whenever the two sides share the column name —
    // the COMMON semi-join shape. (No distinct: semi-join semantics already
    // ignore duplicate build rows; a pre-dedup would just add a shuffle.)
    val k = s"__bj_${smallKey}"
    big.where(mightContain(bf, col(bigKey)))
      .join(small.select(col(smallKey).as(k)), col(bigKey) === col(k), "left_semi")
  }
}
