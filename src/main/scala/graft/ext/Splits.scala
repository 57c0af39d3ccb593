package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training-data pipelines
  * (train/validation/test, mixture shards).
  *
  * Assignment is a pure function of the KEY VALUE (first 32 bits of its
  * md5), not of row position, partitioning, or RNG state — so a document
  * keeps its split across re-ingests, engine versions, and cluster sizes,
  * and duplicate content always lands in the same split (no train/test
  * leakage through near-identical rows sharing a key). md5 also exists in
  * every SQL engine, so splits are reproducible for differential tests —
  * unlike `randomSplit`, which is seed- AND partitioning-dependent.
  *
  * Scale: one codegen'd hash + integer compare per row; no shuffle, no RNG
  * coordination, trivially parallel at any data size.
  */
object Splits {

  /** Split-assignment column: `weights(i)` (need not sum to 1; normalized)
    * of the key space maps to `labels(i)`. Bucket thresholds are exact
    * 32-bit integers, so the comparison is FP-free.
    */
  def contentHashSplit(key: Column, weights: Seq[Double], labels: Seq[String]): Column = {
    require(weights.length == labels.length && weights.nonEmpty,
      "weights and labels must align and be non-empty")
    require(weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val space = 1L << 32
    // cumulative exact thresholds over [0, 2^32)
    val thresholds = weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.min(space, math.round(c / total * space)))
    val h = conv(substring(md5(key), 1, 8), 16, 10).cast("long")
    val assigned = labels.zip(thresholds).reverse.foldLeft(lit(labels.last): Column) {
      case (acc, (label, t)) => when(h < t, label).otherwise(acc)
    }
    // md5(NULL) is NULL, so every `h < t` is NULL and the fold's default
    // would silently dump null-key rows into the LAST label; propagate the
    // null instead so callers see the missing key
    when(key.isNull, lit(null: String)).otherwise(assigned)
  }

  /** [[contentHashSplit]] applied as a new column. */
  def byContentHash(
      df: DataFrame, keyCol: String, weights: Seq[Double],
      labels: Seq[String], outCol: String = "split"): DataFrame =
    df.withColumn(outCol, contentHashSplit(col(keyCol), weights, labels))

  /** Cluster-keyed split: assignment is a pure function of the CLUSTER
    * id, not of the row — so every member of a near-duplicate cluster
    * lands in the SAME split. [[byContentHash]] already co-assigns
    * byte-identical content; this closes the remaining train/test
    * leakage hole, NEAR-identical rows (one word changed, boilerplate
    * stripped) straddling the split boundary and leaking eval content
    * into training. `clusterCol` is typically the component id from
    * `Dedup.connectedComponents` over verified near-dup pairs, with
    * singletons labeled by their own id.
    *
    * Scale: one codegen'd hash + integer compare per row on top of
    * whatever produced the cluster ids — no extra shuffle; the split
    * stays stable across re-ingests as long as cluster ids are (which
    * min-id component labeling guarantees for unchanged content).
    */
  def byClusterHash(
      df: DataFrame, clusterCol: String, weights: Seq[Double],
      labels: Seq[String], outCol: String = "split"): DataFrame =
    df.withColumn(outCol,
      contentHashSplit(col(clusterCol).cast("string"), weights, labels))

  /** Split-leakage audit — the measurement [[byClusterHash]]'s doc
    * promises: given a near-duplicate PAIR frame and a per-row split
    * assignment `(idCol, splitCol)`, count the pairs whose endpoints
    * landed in DIFFERENT splits (eval content leaking into training
    * through a near-copy). Returns one row per unordered split pair:
    * `(split_l, split_r, n_pairs)` with `split_l <= split_r` — the
    * off-diagonal rows are the leaks, and a cluster-keyed split must
    * produce none for pairs inside its own clusters.
    *
    * Scale: two equi-joins of the pair frame against the O(rows)
    * assignment plus one small aggregation — never an all-pairs stage
    * (the pair frame IS the bounded candidate set).
    */
  def leakageAudit(
      pairs: DataFrame, idL: String, idR: String,
      assign: DataFrame, idCol: String, splitCol: String): DataFrame = {
    val a = assign.select(col(idCol), col(splitCol))
    pairs
      .join(a.select(col(idCol).as(idL), col(splitCol).as("__sl")), Seq(idL))
      .join(a.select(col(idCol).as(idR), col(splitCol).as("__sr")), Seq(idR))
      .groupBy(least(col("__sl"), col("__sr")).as("split_l"),
        greatest(col("__sl"), col("__sr")).as("split_r"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Exactly-`n` deterministic uniform subsample: rank every row by
    * `md5(keyCol)` (tie-broken by `tieCol` for non-unique keys) and keep the
    * first `n` — the fixed-size eval-subset / spot-check primitive. Unlike
    * `sample(fraction)`, the result has an exact size and is a pure function
    * of content: stable across runs, partitionings, and engines.
    *
    * Scale: orderBy+limit plans as `TakeOrderedAndProject` — per-partition
    * top-n heaps merged on one reducer holding only n rows; no global sort.
    */
  def sampleExact(df: DataFrame, keyCol: String, tieCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    df.withColumn("__h", md5(col(keyCol)))
      .orderBy(col("__h"), col(tieCol))
      .limit(n)
      .drop("__h")
  }

  /** Exactly-`n` deterministic WEIGHTED subsample — the consumer the
    * soft-dedup weights needed (round-16 verdict #4): rank every row by
    * `priority = kmvHash(keyCol) * costCol` (the md5 32-bit prefix as
    * the uniform, priority sampling in the Duffield–Lund–Thorup shape)
    * and keep the `n` smallest. A row's inclusion chance is ∝ 1/cost,
    * so with `costCol` = the near-dup `cluster_size` from
    * [[graft.ext.Dedup.softDedupWeights]] (whose `weight` is exactly
    * 1/cost) each duplicate cluster contributes ~ONE document-
    * equivalent to the sample in expectation while every intra-cluster
    * variant stays eligible — "keep variety, sample one equivalent"
    * executed end to end. Cost rides as the exact INTEGER inverse of
    * the weight (never the rounded double), and the priority is one
    * exact decimal(38,0) product — hash-identical in any engine, no
    * RNG, stable across runs and partitionings.
    *
    * Scale: same `TakeOrderedAndProject` shape as [[sampleExact]] —
    * per-partition top-n heaps merged on one reducer holding n rows.
    */
  def sampleExactWeighted(
      df: DataFrame, keyCol: String, tieCol: String, n: Int,
      costCol: String): DataFrame = {
    require(n > 0, "n must be positive")
    // a null key hashes to a null priority (Spark sorts nulls FIRST
    // ascending — the row would silently occupy a sample slot in every
    // draw) and a null/non-positive/fractional cost breaks the
    // inclusion-chance ∝ 1/cost contract the same silent way (the
    // priority formula rounds the cost to decimal(18,0), so 0.4 would
    // silently become 0 and 1.9 would become 2); raise in-plan like
    // the IncrementalAgg delta guard, testing the ORIGINAL value —
    // guarding the rounded one would mislabel 0.4 as "non-positive"
    val raw = col(costCol)
    val cost = raw.cast("decimal(18,0)")
    val guarded = when(
      col(keyCol).isNull.or(raw.isNull).or(cost.isNull).or(raw <= 0)
        .or(raw.cast("decimal(28,10)") =!= cost.cast("decimal(28,10)")),
      raise_error(concat(
        lit(s"sampleExactWeighted: NULL $keyCol, or $costCol not a " +
          s"strictly positive integer — priority sampling needs a " +
          s"hashable key and an exact integer cost; got $costCol="),
        coalesce(raw.cast("string"), lit("NULL")))))
      .otherwise(
        conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
          .cast("decimal(20,0)") * cost)
    df.withColumn("__p", guarded)
      .orderBy(col("__p"), col(tieCol))
      .limit(n)
      .drop("__p")
  }

  /** Deterministic shard assignment for corpus writing: `shard` = first 32
    * bits of `md5(keyCol)` mod `nShards` (duplicate content co-shards, the
    * assignment survives re-ingests and engine changes), plus a dense
    * within-shard `ordinal` ordered by `orderCol` — the (shard, position)
    * pair a sharded training-data writer needs.
    *
    * Scale: the hash is one codegen'd expression; the ordinal is a
    * row_number window partitioned by shard — one hash-partitioned shuffle
    * into `nShards` groups. With the usual shard counts (2^7..2^12) each
    * group is corpus/nShards rows; if a single shard must stay smaller,
    * raise `nShards` — the assignment is mod-stable only in distribution,
    * so pick the final shard count up front.
    */
  def shardAssign(
      df: DataFrame, keyCol: String, orderCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy("shard").orderBy(orderCol)
    df.withColumn("shard", (h % nShards).cast("long"))
      .withColumn("ordinal", row_number().over(w).cast("long"))
  }
}
