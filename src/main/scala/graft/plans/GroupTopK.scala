package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Descending, Expression,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Per-group top-k as a FIRST-CLASS physical operator — the whole-operator
  * Catalyst extension path (custom LogicalPlan + SparkStrategy + SparkPlan,
  * registered via SparkSessionExtensions / [[graft.GraftExtensions]]).
  *
  * Spark has no group-wise TakeOrdered: the declarative form
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`, see
  * [[graft.ops.Ops.topKPerGroup]]) shuffles EVERY input row and fully SORTS
  * every group, even though only k rows per group survive. This operator
  * runs in two heap phases instead:
  *
  *   - partial (map side): one bounded heap of k rows per group per
  *     partition — emits at most min(inputRows, groups×k) rows into the
  *     shuffle, never more than the input;
  *   - final (reduce side, clustered on the group keys): re-heap, then sort
  *     only the ≤k retained rows per group to assign ranks 1..k.
  *
  * At 100 TB the difference is structural: a hot group of 10^9 rows costs a
  * full O(n log n) sort in the window form but O(n log k) heap maintenance
  * here, and the shuffle after the partial phase carries k rows per
  * (group, partition) instead of the whole group. Task memory is bounded by
  * (groups-per-partition × k) retained rows — the same envelope as a
  * partial aggregation over the group keys.
  *
  * Semantics (identical to the window form, asserted in `GroupTopKSpec`
  * and by q74's DuckDB oracle): rank by `orderKeys` (make the order TOTAL
  * or ties make ranks nondeterministic), 1-based dense `rankName` column,
  * groups smaller than k kept whole.
  */
object GroupTopK {

  /** Logical marker node: output = child.output :+ rank. `rankAttr` is a
    * constructor param (not a derived val) so `copy()` under transforms
    * preserves its exprId.
    */
  case class GroupTopKPlan(
      groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
      rankAttr: Attribute, maxPartialGroups: Int,
      child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
    override protected def withNewChildInternal(c: LogicalPlan): GroupTopKPlan =
      copy(child = c)
  }

  /** Plans the logical node as partial-heap -> (exchange inserted by
    * EnsureRequirements) -> final-heap.
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupTopKPlan(ge, so, k, rank, mpg, child) =>
        val partial = GroupTopKExec(ge, so, k, rank, mpg,
          isFinal = false, planLater(child))
        GroupTopKExec(ge, so, k, rank, mpg, isFinal = true, partial) :: Nil
      case _ => Nil
    }
  }

  case class GroupTopKExec(
      groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
      rankAttr: Attribute, maxPartialGroups: Int, isFinal: Boolean,
      child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] =
      if (isFinal) child.output :+ rankAttr else child.output

    // rankAttr rides in the constructor, so QueryPlan counts it as a
    // reference; declaring it produced keeps missingInput empty (without
    // this the node prints with the "!" invalid marker)
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

    override def requiredChildDistribution: Seq[Distribution] =
      if (isFinal) ClusteredDistribution(groupExprs) :: Nil
      else UnspecifiedDistribution :: Nil

    override def outputPartitioning: Partitioning = child.outputPartitioning

    override protected def withNewChildInternal(c: SparkPlan): GroupTopKExec =
      copy(child = c)

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val ge = groupExprs
      val so = order
      val kk = k
      val fin = isFinal
      val outAttrs = output
      val mpg = maxPartialGroups
      child.execute().mapPartitions({ iter =>
        val groupProj = UnsafeProjection.create(ge, childOutput)
        val ordering = RowOrdering.create(so, childOutput)
        // max-heap by the sort order: peek() is the WORST retained row, so
        // a candidate beating it evicts in O(log k)
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        val reversed = ordering.reverse
        def insert(row: InternalRow): Unit = {
          val key = groupProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kk, reversed)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kk) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        if (!fin) {
          // memory bound: at most maxPartialGroups k-heaps live at once — a
          // partition with more distinct groups drains retained rows
          // downstream and starts a fresh map (the partial phase merely gets
          // less reductive; the final phase re-heaps whatever arrives), the
          // same safety valve as partial aggregation's spill-to-next-phase
          new Iterator[InternalRow] {
            private var out: Iterator[InternalRow] = Iterator.empty
            private def refill(): Unit = {
              while (iter.hasNext && heaps.size < mpg) insert(iter.next())
              if (!heaps.isEmpty) {
                val drained = new java.util.ArrayList(heaps.values)
                heaps.clear()
                out = drained.iterator.asScala.flatMap(_.iterator.asScala)
              }
            }
            override def hasNext: Boolean =
              out.hasNext || { refill(); out.hasNext }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              out.next()
            }
          }
        } else {
          // the final phase must hold every group of its partition at once
          // (ranks are assigned per complete group) — that is <= k retained
          // rows per group, the operator's OUTPUT size for this partition
          while (iter.hasNext) insert(iter.next())
          val toUnsafe = UnsafeProjection.create(outAttrs, childOutput :+ rankAttr)
          val joined = new JoinedRow
          heaps.values.iterator.asScala.flatMap { heap =>
            val rows = heap.toArray(new Array[InternalRow](heap.size))
            java.util.Arrays.sort(rows, ordering)
            rows.iterator.zipWithIndex.map { case (r, i) =>
              toUnsafe(joined(r, InternalRow(i + 1L)))
            }
          }
        }
      }, preservesPartitioning = true)
    }
  }

  /** Top-`k` rows per group — the native-operator twin of
    * [[graft.ops.Ops.topKPerGroup]] (same contract: TOTAL `orderKeys`
    * `(column, ascending)` pairs, 1-based `rankName`). Computed order keys
    * must be projected to columns first. Requires [[graft.GraftExtensions]]
    * on the session (it injects [[Strategy]]).
    */
  def apply(
      df: DataFrame, groupCols: Seq[String], orderKeys: Seq[(String, Boolean)],
      k: Int, rankName: String = "rnk",
      maxPartialGroups: Int = 1 << 17): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderKeys.nonEmpty, "need at least one order key")
    require(k > 0, "k must be positive")
    require(maxPartialGroups > 0, "maxPartialGroups must be positive")
    val analyzed = df.queryExecution.analyzed
    // session-conf resolver (case-insensitive by default), ambiguity
    // fail-fast — the same resolution behavior as the window twin
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    def attr(name: String): Attribute = {
      val matches = analyzed.output.filter(a => resolver(a.name, name))
      if (matches.isEmpty) throw new IllegalArgumentException(
        s"column $name not found in ${analyzed.output.map(_.name)}")
      if (matches.size > 1) throw new IllegalArgumentException(
        s"column $name is ambiguous (${matches.size} matches); " +
          "disambiguate with a projection first")
      matches.head
    }
    require(!analyzed.output.exists(a => resolver(a.name, rankName)),
      s"rank column '$rankName' already exists; pass a different rankName")
    // normalize float/double group keys (-0.0 == 0.0, canonical NaN) so
    // heap-map keys AND the exchange's hash partitioning group exactly like
    // built-in aggregates/windows, whose keys Catalyst's
    // NormalizeFloatingNumbers rewrites (it never visits custom nodes)
    val ge = groupCols.map(attr).map(ColumnBridge.normalizeFloats)
    val so = orderKeys.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    ColumnBridge.ofRows(df.sparkSession,
      GroupTopKPlan(ge, so, k, rank, maxPartialGroups, analyzed))
  }
}
