package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded mergeable per-group quantile sketch: the k (hash, value) pairs
  * with the SMALLEST hashes form a deterministic uniform sample of the
  * group — quantiles read off the sample approximate the group's with
  * standard sampling error O(1/sqrt(k)), in O(k) space per group.
  *
  * Why bottom-k-by-hash rather than KLL compaction: a compactor's content
  * depends on the merge ORDER, so two runs (or an engine and its oracle)
  * disagree bit-for-bit even when both are "correct". Bottom-k over a
  * deterministic row hash is a SET function of the group — merge-order
  * independent, partition independent, and exactly replayable in SQL
  * (`row_number() OVER (ORDER BY hv, v) <= k` + element picks), which is
  * how q154 hash-oracles the estimates. Same design family as
  * [[BottomKHashes]] (KMV) — this carries the VALUE alongside the hash.
  *
  * The buffer is a counted multiset ordered by (hash, value): duplicate
  * (hv, v) pairs are kept with multiplicity, so the sample content equals
  * the SQL `rn <= k` slice even under hash collisions — a plain set would
  * silently drop one of two colliding rows and desync the tail of the
  * sample.
  *
  * `update` and `merge` both cap the buffer at k, so partial aggregation
  * is map-side combinable and shuffle traffic is at most k (hash, value)
  * pairs per (group, partition) — O(sketch), never O(values); the exact
  * `percentile` aggregate this complements shuffles every value.
  */
case class BottomKSample(
    hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSample.Buffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = hash :: value :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && value.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT hash, DOUBLE value), got " +
        s"(${hash.dataType.simpleString}, ${value.dataType.simpleString})")
  override def nullable: Boolean = false
  // values of the sample, sorted ascending BY VALUE — ready for rank picks
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): BottomKSample.Buffer =
    new BottomKSample.Buffer(k)

  override def update(buf: BottomKSample.Buffer, input: InternalRow): BottomKSample.Buffer = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      buf.add(h.asInstanceOf[Long], v.asInstanceOf[Double], 1)
    buf
  }

  override def merge(buf: BottomKSample.Buffer, other: BottomKSample.Buffer): BottomKSample.Buffer = {
    other.foreach((h, v, n) => buf.add(h, v, n))
    buf
  }

  override def eval(buf: BottomKSample.Buffer): Any = {
    val out = buf.values
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: BottomKSample.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 20 * buf.entryCount)
    bb.putInt(buf.entryCount)
    buf.foreach { (h, v, n) => bb.putLong(h); bb.putDouble(v); bb.putInt(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKSample.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble, bb.getInt); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), value = newChildren(1))
}

object BottomKSample {

  /** Counted multiset of (hash, value) keeping the k smallest pairs in
    * (hash, value) lexicographic order.
    */
  final class Buffer(k: Int) {
    private val map = new java.util.TreeMap[(Long, Double), Integer](
      new java.util.Comparator[(Long, Double)] {
        override def compare(a: (Long, Double), b: (Long, Double)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c else java.lang.Double.compare(a._2, b._2)
        }
      })
    private var total = 0

    def add(h: Long, v: Double, n: Int): Unit = {
      val key = (h, v)
      val prev = map.get(key)
      map.put(key, if (prev == null) n else prev + n)
      total += n
      // evict from the large end until back at k (never evicts the key
      // just added below capacity — the multiset keeps exactly the k
      // smallest pairs, duplicates counted)
      while (total > k) {
        val last = map.lastEntry()
        val over = total - k
        if (last.getValue <= over) {
          total -= last.getValue
          map.remove(last.getKey)
        } else {
          map.put(last.getKey, last.getValue - over)
          total -= over
        }
      }
    }

    def entryCount: Int = map.size()

    def foreach(f: (Long, Double, Int) => Unit): Unit = {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        f(e.getKey._1, e.getKey._2, e.getValue)
      }
    }

    /** All sample values with multiplicity (unsorted). */
    def values: Array[Double] = {
      val out = new Array[Double](total)
      var i = 0
      foreach { (_, v, n) =>
        var j = 0
        while (j < n) { out(i) = v; i += 1; j += 1 }
      }
      out
    }
  }

  /** Column wrapper: values of the k smallest-(hash, value) sample rows,
    * sorted ascending by value.
    */
  def bottomKSample(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSample(ColumnBridge.expression(hash),
        ColumnBridge.expression(value), k).toAggregateExpression())
}
