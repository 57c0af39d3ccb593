package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-shape diagnostics over a near-duplicate PAIR frame (the output of
  * [[Dedup.allPairsJaccard]] / minhash / winnowing): how clique-like is the
  * duplication structure? A corpus of template stamps shows dense triangle
  * clusters; a chain of near-misses shows none — the difference decides
  * whether transitive closure ([[Dedup.connectedComponents]]) will merge
  * what a human would call one group.
  */
object DupGraph {

  /** Triangle census of the undirected pair graph: ONE row with
    * `(n_nodes, n_edges, n_wedges, n_triangles, clustering)` where
    * `clustering = 3T / wedges` (the global clustering coefficient,
    * rounded to 6 dp; null when the graph has no wedge).
    *
    * Scale, layer 1 — weighted-cluster collapse: dup graphs are
    * clique-heavy (a template stamped s times is a K_s), and an exact
    * census that ENUMERATES closed wedges is C(s,3)-bound on each. But
    * structurally-equivalent nodes (identical CLOSED neighborhoods) are
    * interchangeable: each equivalence class is a clique whose members
    * share every outside neighbor, so the census decomposes in closed
    * form over the collapsed weighted graph —
    *   T = sum_A C(s_A,3)                          (all-in-one-cluster)
    *     + sum_{A~B} [C(s_A,2)*s_B + C(s_B,2)*s_A] (two-in-one)
    *     + sum_{A~B~C~A} s_A*s_B*s_C               (all distinct)
    * A K_s costs ONE cluster row instead of C(s,3) wedge rows; only the
    * (small) collapsed graph pays the wedge join. The collapse itself is
    * linear: one neighbor-list groupBy keyed by the sorted closed
    * neighborhood (exact — no hash-collision merge risk).
    *
    * Scale, layer 2 — the wedge join that remains runs under the
    * degree-ordered orientation (Suri & Vassilvitskii 2011): every edge
    * points from its lower-(degree, id) endpoint to the higher, each
    * triangle survives as exactly ONE wedge-plus-closing-edge, and wedge
    * fan-out is bounded by the oriented out-degree, O(sqrt(m)) on any
    * graph — no hub explosion. Wedge totals for the clustering
    * coefficient come from the ORIGINAL degree frame in closed form
    * (sum d(d-1)/2), never from materializing wedges.
    */
  def triangleCensus(
      pairs: DataFrame, idL: String = "id_l", idR: String = "id_r",
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    // The census consumes the edge frame FOUR times (degrees, cluster
    // keys, relabeling, edge count) and Catalyst does not share common
    // subtrees across joins — with an expensive upstream (a similarity
    // pair join), the input would re-execute per consumer. The pair
    // frame is O(edges), orders smaller than the corpus that produced
    // it, so an eager localCheckpoint materializes it once and every
    // downstream pass reads the stored blocks (storage is released with
    // the lineage when the result frame is dropped). The operator is
    // therefore EAGER in its input, like the diagnostic it is.
    val undRaw = pairs
      .select(least(col(idL), col(idR)).as("a"),
        greatest(col(idL), col(idR)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    // Size the dozen downstream micro-stages to the MATERIALIZED edge
    // count, not the session default: a diagnostic on a 50-edge slice
    // otherwise pays 32-partition exchanges per stage (pure scheduler
    // overhead), while a 1e9-edge graph keeps full parallelism. The
    // count is free — the frame is already checkpointed.
    val nEdges = undRaw.count()
    val spark = pairs.sparkSession
    // Small-graph fast path, same rationale as Spark's own broadcast-join
    // threshold: below `LocalEdgeLimit` edges (~16 bytes each, a few MB)
    // the exact census computes driver-side in one pass over the
    // collected edge list — a ONE-ROW diagnostic routed through ~15
    // distributed micro-stages otherwise pays seconds of scheduler
    // overhead per 50-edge slice. The bound is explicit and the large
    // path below is the one that scales.
    if (nEdges <= localEdgeLimit) return localCensus(spark, undRaw)
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 100000L + 1L)).toInt
    val und = undRaw.coalesce(parts)

    // adjacency lists once: degrees (wedge closed form) + closed-
    // neighborhood key (cluster identity) both come from this one pass
    val adj = und.select(col("a").as("v"), col("b").as("n"))
      .union(und.select(col("b").as("v"), col("a").as("n")))
    val neigh = adj.groupBy(col("v"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
    val deg = neigh.select(col("v"), size(col("ns")).cast("long").as("d"))

    // structural-equivalence classes: group by the sorted closed
    // neighborhood (ns ∪ {v}) — exact array equality, then explode the
    // member list back out for the edge relabeling (no second array join)
    val clusters = neigh
      .groupBy(sort_array(array_union(col("ns"), array(col("v")))).as("key"))
      .agg(min(col("v")).as("c"), collect_list(col("v")).as("members"),
        count(lit(1)).as("s"))
    val weights = clusters.select(col("c"), col("s"))
    val v2c = clusters.select(col("c"), explode(col("members")).as("v"))

    // relabel edges to cluster space; intra-cluster edges vanish (they are
    // fully accounted by the closed forms below)
    val ce = und
      .join(v2c.select(col("v").as("a"), col("c").as("ca")), Seq("a"))
      .join(v2c.select(col("v").as("b"), col("c").as("cb")), Seq("b"))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

    // decimal(38,0) arithmetic: the closed forms are exact integers, and
    // double division would silently round past 2^53 — a 1e6-doc template
    // clique alone holds C(1e6,3) ~ 1.7e17 triples
    def c2(s: Column) = (s.cast("decimal(38,0)") * (s - 1) / 2).cast("decimal(38,0)")
    def c3(s: Column) = (s.cast("decimal(38,0)") * (s - 1) * (s - 2) / 6).cast("decimal(38,0)")

    // term 1: triples inside one class (each class is a clique)
    val within = weights.agg(
      coalesce(sum(c3(col("s"))), lit(0).cast("decimal(38,0)")).as("t_within"))
    // term 2: two nodes in class A + one in an adjacent class B — every
    // member of A sees B's members identically (complete bipartite by
    // structural equivalence), so the count is exact
    val edgeTerm = ce
      .join(weights.select(col("c").as("a"), col("s").as("sa")), Seq("a"))
      .join(weights.select(col("c").as("b"), col("s").as("sb")), Seq("b"))
      .agg(coalesce(sum(c2(col("sa")) * col("sb") + c2(col("sb")) * col("sa")),
        lit(0).cast("decimal(38,0)")).as("t_edge"))
    // term 3: one node from each of three mutually adjacent classes —
    // the only part that still pays a wedge join, on the COLLAPSED graph
    val tripleTerm = weightedTriangleSum(ce, weights)

    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(c2(col("d"))), lit(0).cast("decimal(38,0)"))
        .cast("long").as("n_wedges"))
    val t = col("t_within") + col("t_edge") + col("t_triple")
    stats.withColumn("n_edges", lit(nEdges)) // counted at checkpoint time
      .crossJoin(within).crossJoin(edgeTerm)
      .crossJoin(tripleTerm)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        t.cast("long").as("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(round(lit(3.0) * t.cast("double") / col("n_wedges"), 6))
          .as("clustering"))
  }

  /** Edge-count bound for the driver-side census: 200k edges collect to
    * ~3 MB — the same order as Spark's broadcast-join threshold.
    */
  private val LocalEdgeLimit = 200000L

  /** Driver-side exact census of a small (≤ [[LocalEdgeLimit]]) edge
    * frame: degree-ordered orientation, wedge scan over oriented
    * adjacency — O(m^1.5) worst case, microseconds at the bound. Emits
    * the identical one-row schema, with `clustering` rounded through the
    * same HALF_UP-at-6 rule as the distributed `round(..., 6)`.
    */
  private def localCensus(
      spark: org.apache.spark.sql.SparkSession, und: DataFrame): DataFrame = {
    // Type-generic like the distributed path and localPageRank: ids are
    // collected UNTYPED and indexed into dense longs driver-side (a long
    // cast would null out string ids and NPE — ADVICE r11). The census
    // emits only counts, never ids, and the triangle/wedge totals are
    // invariant under any consistent node order, so the arbitrary index
    // assignment is safe.
    val rawEdges = und.select(col("a"), col("b"))
      .collect().map(r => (r.get(0), r.get(1)))
    val index = scala.collection.mutable.HashMap.empty[Any, Long]
    def idx(v: Any): Long = index.getOrElseUpdate(v, index.size.toLong)
    val edges = rawEdges.map { case (a, b) => (idx(a), idx(b)) }
    val deg = scala.collection.mutable.HashMap.empty[Long, Int]
    edges.foreach { case (a, b) =>
      deg.update(a, deg.getOrElse(a, 0) + 1); deg.update(b, deg.getOrElse(b, 0) + 1)
    }
    val nNodes = deg.size.toLong
    val nWedges = deg.valuesIterator.map(d => d.toLong * (d - 1) / 2).sum
    // orient low-(degree, id) -> high; adjacency of higher neighbors
    val ord = Ordering.by[(Long, Long), (Long, Long)] { case (d, v) => (d, v) }
    def rank(v: Long) = (deg(v).toLong, v)
    val out = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val eset = scala.collection.mutable.HashSet.empty[(Long, Long)]
    edges.foreach { case (a, b) =>
      val (lo, hi) = if (ord.lt(rank(a), rank(b))) (a, b) else (b, a)
      out.getOrElseUpdate(lo, scala.collection.mutable.ArrayBuffer.empty) += hi
      eset += ((lo, hi))
    }
    var tri = 0L
    out.foreach { case (_, hs) =>
      val sorted = hs.sortBy(rank)
      var i = 0
      while (i < sorted.length) {
        var j = i + 1
        while (j < sorted.length) {
          val (v, w) = (sorted(i), sorted(j))
          // closing edge is oriented v -> w (v ranks lower by construction)
          if (eset((v, w))) tri += 1
          j += 1
        }
        i += 1
      }
    }
    val clustering: java.lang.Double =
      if (nWedges == 0) null
      else java.math.BigDecimal.valueOf(3.0 * tri.toDouble / nWedges)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nodes", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_edges", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_wedges", org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("n_triangles", org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("clustering", org.apache.spark.sql.types.DoubleType, nullable = true)))
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        nNodes, edges.length.toLong, nWedges, tri, clustering)),
      schema)
  }

  /** Sum of `s_u * s_v * s_w` over the triangles of a distinct undirected
    * edge frame `(a, b)` with node weights `(c, s)` — the degree-ordered
    * oriented enumeration, weights carried through the wedge so no
    * post-hoc weight joins touch the (potentially large) triangle set.
    */
  private def weightedTriangleSum(
      edges: DataFrame, weights: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .join(weights.select(col("c").as("a"), col("s").as("sa")), Seq("a"))
      .join(weights.select(col("c").as("b"), col("s").as("sb")), Seq("b"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, col("sa")).otherwise(col("sb")).as("su"),
      when(aLower, struct(col("db").as("d"), col("b").as("x"), col("sb").as("s")))
        .otherwise(struct(col("da").as("d"), col("a").as("x"), col("sa").as("s")))
        .as("__hi"))
      .select(col("u"), col("su"), col("__hi").getField("x").as("v"),
        col("__hi").getField("d").as("dv"), col("__hi").getField("s").as("sv"))
    // wedges at u between its two higher-ranked neighbors v < w (by
    // (degree, id)); a triangle closes iff the oriented edge v -> w exists
    val l = oriented.select(col("u"), col("su"), col("v"), col("dv"), col("sv"))
    val r = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"),
      col("sv").as("sw"))
    val wedges = l.join(r, Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"),
        (col("su").cast("decimal(38,0)") * col("sv") * col("sw")).as("p"))
    wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"), "leftsemi")
      .agg(coalesce(sum(col("p")), lit(0).cast("decimal(38,0)")).as("t_triple"))
  }
}
