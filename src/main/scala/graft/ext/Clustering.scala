package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus topic clustering over an embedding column — the "cluster, size,
  * cohesion, dominant label" report that drives mixture design and SemDedup
  * bucket choice. Unlike [[Ivf]] (whose quantizer is an internal ANN detail
  * trained on xxhash-sampled rows), this is the USER-FACING clustering with
  * the portable reproducibility contract: every step replays verbatim in
  * any SQL engine, so the assignment and the report sit under the oracle.
  *
  * Reproducibility: seeds are the `k` lowest-`md5(id)` corpus vectors (the
  * q56 content-hash convention — deterministic, engine-independent);
  * distances are per-row IEEE doubles ROUNDED to 6 dp before the argmin
  * (ties on the rounded value break by cluster id, so an ulp of summation-
  * order wobble cannot flip an assignment); centroid coordinates are exact
  * DECIMAL sums divided per-row in double and rounded to 6 dp. Lloyd runs a
  * FIXED `iters` rounds — a convergence loop would make the plan
  * data-dependent and the oracle unreplayable.
  *
  * Scale: each round is one row-local assignment pass (centroids are a
  * k x dim literal inlined into the projection — no join, no broadcast
  * exchange) plus one map-side-combinable (cluster, dim) aggregation;
  * between rounds exactly k x dim doubles reach the driver (the bounded
  * centroid collect [[Ivf.train]] already established). Assignment of the
  * full corpus is ONE more row-local pass; the report reuses the
  * assignment's aggregation partitioning.
  */
object Clustering {

  /** One Lloyd round's centroids as `(cluster, coords)` pairs. */
  private type Centroids = Seq[(Int, Seq[Double])]

  private def distTo(v: Column, c: Seq[Double]): Column =
    round(sqrt(aggregate(
      zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)), 6)

  /** Rounded-distance argmin over the centroid literals: the minimum of
    * `struct(dist, cluster)` compares lexicographically — rounded distance
    * first, cluster id as the deterministic tiebreak.
    */
  private def assignExpr(v: Column, cents: Centroids): Column =
    array_min(array(cents.map { case (j, c) =>
      struct(distTo(v, c).as("d"), lit(j).as("c"))
    }: _*))

  /** `iters` fixed Lloyd rounds from md5-seeded centroids; returns the
    * per-row assignment frame `(idCol, cluster, dist)` with `dist` the
    * rounded distance to the FINAL centroid.
    */
  def assign(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    // Materialize the projected (id, vec) frame ONCE (eager
    // localCheckpoint, the q222/q216 pattern): the Lloyd loop consumes it
    // iters+2 times (seed collect, per-round assignment, final assign)
    // and Catalyst does not share subtrees across actions — without the
    // checkpoint every round re-reads and re-decodes the source scan.
    // The stored blocks are exactly the iteration working set (two
    // columns, not the source table), the standard trade for any
    // fixed-point algorithm; lineage + storage release when the frame
    // drops (VERDICT r11 #6).
    val vecs = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
      .localCheckpoint()
    // seeds: k lowest (md5(id), id) — tiny deterministic collect
    val seeds = vecs
      .select(col("__id"), col("__v"), md5(col("__id").cast("string")).as("__h"))
      .orderBy(col("__h"), col("__id")).limit(k)
      .select(col("__v")).collect()
      .zipWithIndex.map { case (r, j) => (j, r.getSeq[Double](0).toSeq) }.toSeq
    var cents: Centroids = seeds
    for (_ <- 1 to iters) {
      val assigned = vecs.withColumn("__c",
        assignExpr(col("__v"), cents).getField("c"))
      // exact decimal coordinate sums; per-row double division + round —
      // k x dim rows total, the bounded collect between rounds
      val next = assigned
        .select(col("__c"), posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy(col("__c"), col("__i"))
        .agg(count(lit(1)).as("__n"),
          sum(col("__x").cast("decimal(18,9)")).as("__s"))
        .select(col("__c"), col("__i"),
          round(col("__s").cast("double") / col("__n"), 6).as("__m"))
        .collect()
      val byCluster = next.groupBy(_.getInt(0))
      // a cluster that lost every member keeps its previous centroid
      cents = cents.map { case (j, prev) =>
        byCluster.get(j) match {
          case Some(rows) => (j, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          case None => (j, prev)
        }
      }
    }
    val fin = assignExpr(col("__v"), cents)
    vecs.select(col("__id").as(idCol), fin.getField("c").as("cluster"),
      fin.getField("d").as("dist"))
  }

  /** Cluster report joined with a label column from the source frame:
    * `(cluster, n_members, inertia, top_label, label_share)` where
    * `inertia` is the exact decimal sum of rounded member distances (cast
    * back to double) and `top_label` the modal label (ties break on label
    * value). One aggregation over the assignment plus a k-row ranking.
    */
  def report(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    // the narrow (id, cluster, dist, label) frame feeds three consumers
    // (sizes, label mode, the join) — materialize once, like DupGraph
    val a = assign(df, idCol, vecCol, k, iters)
      .join(df.select(col(idCol), col(labelCol)), Seq(idCol))
      .localCheckpoint()
    val sizes = a.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast("decimal(18,6)")).cast("double").as("inertia"))
    val labels = a.groupBy(col("cluster"), col(labelCol))
      .agg(count(lit(1)).as("__ln"))
    val top = graft.plans.GroupTopK(labels, Seq("cluster"),
      Seq("__ln" -> false, labelCol -> true), 1, "__r")
      .select(col("cluster"), col(labelCol).as("top_label"), col("__ln"))
    sizes.join(top, Seq("cluster"))
      .select(col("cluster"), col("n_members"), round(col("inertia"), 6).as("inertia"),
        col("top_label"),
        round(col("__ln").cast("double") / col("n_members"), 6).as("label_share"))
  }
}
