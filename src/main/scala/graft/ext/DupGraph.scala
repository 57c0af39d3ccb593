package graft.ext

import org.apache.spark.sql.DataFrame
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
    * Scale: the naive triangle join explodes on hubs (a degree-d node
    * contributes d^2 wedge candidates). This uses the degree-ordered
    * orientation (Suri & Vassilvitskii 2011): every edge points from its
    * lower-(degree, id) endpoint to the higher, each triangle survives as
    * exactly ONE wedge-plus-closing-edge, and a node's wedge fan-out is
    * bounded by its ORIENTED out-degree, O(sqrt(m)) on any graph — the
    * hub explosion goes away. Wedge and closing joins are plain
    * equi-joins; wedge totals come from the degree frame, not from
    * materializing wedges.
    *
    * Cost floor: an EXACT census must touch every closed wedge once, and
    * a template clique of s documents holds C(s,3) of them — on
    * clique-heavy dup graphs the census is triangle-output-bound no
    * matter the orientation. When that becomes hot, the next step is the
    * [[Dedup.allPairsJaccard]] trick one level up: collapse
    * identical-neighborhood nodes into weighted cluster vertices and
    * count within/between-cluster triples in closed form.
    */
  def triangleCensus(
      pairs: DataFrame, idL: String = "id_l", idR: String = "id_r"): DataFrame = {
    val und = pairs
      .select(least(col(idL), col(idR)).as("a"),
        greatest(col(idL), col(idR)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient from lower (degree, id) to higher; carry both endpoint ranks
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, struct(col("db").as("d"), col("b").as("x")))
        .otherwise(struct(col("da").as("d"), col("a").as("x"))).as("__hi"))
      .select(col("u"), col("__hi").getField("x").as("v"),
        col("__hi").getField("d").as("dv"))
    // wedges at u between its two higher-ranked neighbors v < w (by
    // (degree, id)); a triangle closes iff the oriented edge v -> w exists
    val l = oriented.select(col("u"), col("v"), col("dv"))
    val r = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = l.join(r, Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"))
    val triangles = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"), "leftsemi")
    val tCount = triangles.agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
    val eCount = und.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(eCount).crossJoin(tCount)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering"))
  }
}
