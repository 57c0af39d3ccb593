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

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a weight-aware
    * sample of k rows that supports UNBIASED subset-sum estimation — the
    * survey-statistics answer to "estimate per-slice token totals from a
    * small audited sample". Each row draws priority `q = w / u` with
    * `u ~ U(0,1]`; the k largest priorities are the sample, the (k+1)-th
    * is the threshold `tau`, and `est = max(w, tau)` per sampled row makes
    * `sum(est)` over ANY subset an unbiased estimate of that subset's true
    * weight sum (heavy rows enter with probability 1 and keep their exact
    * weight).
    *
    * Determinism + oracle: `u` is the portable md5 32-bit hash of `keyCol`
    * shifted to [1, 2^32] (the [[Splits]] hash — no RNG, reproducible
    * across engines) and the priority is the INTEGER `(w * 2^32) div u`
    * (>= w always, exact for `w < 2^30`), so sample membership, `tau` and
    * every estimate are integer-exact and the whole output sits under the
    * hash oracle (q181). Rows with null or non-positive weight are
    * excluded (they contribute nothing to any subset sum).
    *
    * Scale: ONE [[graft.plans.GroupTopK]] heap pass over a single hot
    * group (the operator's designed worst case): O(n log k) per partition,
    * <= k+1 rows per partition on the exchange — never a global sort. The
    * returned frame carries `estName`; `sum(estName)` grouped any way is
    * the estimator.
    */
  def prioritySample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      estName: String = "est_weight"): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.exists(Set("__u", "__q", "__g", "__tau", "__rnk")),
      "input must not already have __u/__q/__g/__tau/__rnk columns")
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(1L)
    val withQ = df
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__u", u)
      .withColumn("__q",
        expr(s"(CAST(`$weightCol` AS BIGINT) * 4294967296) div __u"))
      .withColumn("__g", lit(0))
    val top = graft.plans.GroupTopK(withQ, Seq("__g"),
      Seq("__q" -> false, keyCol -> true), k + 1, "__rnk")
    // tau = the (k+1)-th priority; the aggregate keeps this ONE row (null
    // when the input has <= k rows, in which case every row keeps its
    // exact weight — the sample IS the population)
    val tau = top.where(col("__rnk") === k + 1)
      .agg(max(col("__q")).as("__tau"))
    top.where(col("__rnk") <= k)
      .crossJoin(broadcast(tau))
      .withColumn(estName,
        when(col("__tau").isNull, col(weightCol).cast("long"))
          .otherwise(greatest(col(weightCol).cast("long"), col("__tau"))))
      .drop("__u", "__q", "__g", "__tau", "__rnk")
  }

  /** Over-representation cap (the C4/RefinedWeb "no domain dominates"
    * rule): keep at most `cap` rows per group, chosen DETERMINISTICALLY by
    * `(md5(key), key)` order — a content-hash shuffle, so the kept subset
    * is a stable pseudo-random sample per group, reproducible in any
    * engine (the q56 md5-threshold convention; no RNG, no seed state).
    * Returns the input columns plus a 1-based `pick` order within the
    * group.
    *
    * Scale: ranking runs on the [[graft.plans.GroupTopK]] heap — at most
    * `cap` rows per (group, partition) reach the exchange, so a
    * 1e9-document domain costs O(cap) shuffle rows, never a per-group
    * window sort.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, keyCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val hashed = df.withColumn("__h", md5(col(keyCol).cast("string")))
    graft.plans.GroupTopK(hashed, Seq(groupCol),
      Seq("__h" -> true, keyCol -> true), cap, "pick")
      .drop("__h")
  }
}
