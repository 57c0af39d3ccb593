package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary of a string column — at most `k`
  * counters per group, mergeable (Agarwal et al., "Mergeable Summaries",
  * PODS 2012), with the deterministic guarantee that every item whose true
  * frequency exceeds N/(k+1) survives in the summary regardless of row or
  * partition order. The summary OVER-approximates the frequent set and its
  * counts UNDER-approximate by at most N/(k+1); an exact answer needs the
  * recount pass ([[graft.ext.HeavyHitters.frequentItems]]), which is why
  * the candidate map — not this aggregate's raw output — is what queries
  * oracle.
  *
  * A [[TypedImperativeAggregate]] like [[BottomKHashes]]: `update` runs
  * classic MG (increment if present; insert if room; else decrement all
  * and drop zeros), `merge` adds counter maps pointwise and, when the
  * union exceeds k, subtracts the (k+1)-th largest counter from every
  * entry and drops the non-positive ones. Both keep the buffer at <= k
  * entries, so partial aggregation is map-side combinable and shuffle
  * traffic is at most k (item, count) pairs per (group, partition) — the
  * whole point versus a full `groupBy(item)` whose exchange volume is the
  * distinct-item cardinality.
  *
  * Output is `map<string, long>` of surviving items to their (lower-bound)
  * counters. Content is merge-order dependent BELOW the guarantee line —
  * only the superset property is stable — so callers must treat it as a
  * candidate set, never as counts.
  */
case class MisraGriesSummary(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING column, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries_summary"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else {
        // full and unseen: the classic MG step — charge one decrement to
        // every counter (and, implicitly, to the arriving item)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from everything: at least
      // (size - k) entries are <= it, so at most k survive, and the total
      // subtracted mass stays within the mergeable-summaries error bound
      val vals = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1)
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val cnts = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      cnts(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(cnts))
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on items
  // whose encoding exceeds 64 KiB, which a general-purpose string
  // aggregate (URLs, concatenated keys) must survive
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column wrapper: MG summary (`map<item, lower-bound count>`) of a
    * string column with at most `k` counters.
    */
  def misraGriesSummary(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesSummary(ColumnBridge.expression(c), k).toAggregateExpression())
}
