package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
/** Corpus selection under a global token budget: rank every document by a
  * score, keep the best ones until the budget is spent. The greedy-prefix
  * rule (keep while the running cost INCLUDING this row stays <= budget) is
  * the standard data-selection step between scoring and training — and it
  * is exactly `SUM(cost) OVER (ORDER BY score DESC, tie) <= budget`, so it
  * stays fully oracle-expressible.
  *
  * Scale design — like [[graft.ops.NaLocfPlusOne]], this is a total-order
  * computation, and a naive `Window.orderBy` collapses 100 TB onto ONE
  * task. Same two-pass cure:
  *
  *   1. `repartitionByRange(score DESC, tie ASC)` + sortWithinPartitions —
  *      one range shuffle; partition i holds a contiguous rank range.
  *   2. Pass 1: per-partition cost sums — O(partitions) longs to the driver.
  *   3. Driver prefix scan -> each partition's incoming spent-so-far offset,
  *      broadcast back. Partitions whose offset already exceeds the budget
  *      are dropped WITHOUT a second scan (their shuffle files are never
  *      read), so the second pass touches only the prefix that can win.
  *   4. Pass 2: stream the surviving partitions once, keeping rows while
  *      offset + running cost stays within budget.
  */
object Selection {

  /** @param df       input (one row per selectable unit)
    * @param scoreCol  ranking column, higher = better (any orderable type)
    * @param costCol   per-row cost (cast to long, must be non-negative) —
    *                  the pluggable token currency: materialize whitespace
    *                  `text.tokenCount` or tokenizer-exact
    *                  `text.bpeTokenCount` into this column and the budget
    *                  spends real tokens (the q156 card contract)
    * @param tieCol    unique tiebreak column (ascending) — makes the global
    *                  order, and therefore the selected set, deterministic
    * @param budget    total cost budget (inclusive prefix rule)
    * @param partitions range-partition count (0 = spark.sql.shuffle.partitions)
    * @return the selected rows, original schema
    */
  def budgetSelect(
      df: DataFrame, scoreCol: String, costCol: String, tieCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = df.sparkSession
    val n =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val order = Seq(col(scoreCol).desc, col(tieCol).asc)
    val sorted = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val cIdx = schema.fieldIndex(costCol)
    def costOf(r: Row): Long = {
      val v = r.get(cIdx) match {
        case null => throw new IllegalArgumentException(s"null $costCol")
        case x: Number => x.longValue()
        case x => throw new IllegalArgumentException(s"non-numeric $costCol: $x")
      }
      require(v >= 0, s"negative $costCol: $v")
      v
    }

    // Both passes evaluate this RDD; the range shuffle is reused via
    // Spark's shuffle-file reuse, so no explicit persist is needed.
    val rdd = sorted.rdd

    // Pass 1: per-partition cost totals.
    val sums: Array[(Int, Long)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        while (it.hasNext) s += costOf(it.next())
        Iterator.single((pid, s))
      }
      .collect()
      .sortBy(_._1)

    // Driver prefix scan: cost spent BEFORE each partition.
    val offsets = new Array[Long](sums.length)
    var acc = 0L
    sums.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val live = offsets.zipWithIndex.collect {
      case (off, pid) if off <= budget => pid
    }.toSet
    val bc = spark.sparkContext.broadcast(offsets)

    // Pass 2: keep while the inclusive running cost fits. Only partitions
    // that can still contribute are scanned at all.
    val outRdd = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (!live.contains(pid)) Iterator.empty
        else {
          var spent = bc.value(pid)
          it.takeWhile { r => spent += costOf(r); spent <= budget }
        }
      }
    spark.createDataFrame(outRdd, schema)
  }

  /** Per-group budget selection: the same greedy-prefix rule within each
    * group (per source, language, domain...), each group's budget
    * independent. Unlike the global form this needs NO two-pass machinery —
    * a window partitioned by the group keys is already partition-parallel
    * and codegen'd, because each group's order is local. Prefer this form
    * at 100 TB whenever a grouping key exists (the same guidance as
    * [[graft.ops.NaLocfPlusOne.byGroup]]).
    */
  def budgetSelectByGroup(
      df: DataFrame, groupCols: Seq[String], scoreCol: String,
      costCol: String, tieCol: String, budgetPerGroup: Long): DataFrame = {
    require(groupCols.nonEmpty,
      "groupCols required: use budgetSelect for the global form")
    require(budgetPerGroup >= 0, "budget must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val cum = "__graft_cum"
    df.withColumn(cum, sum(col(costCol).cast("long")).over(w))
      .where(col(cum) <= budgetPerGroup)
      .drop(cum)
  }
}
