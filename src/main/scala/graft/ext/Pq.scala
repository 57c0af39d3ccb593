package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{PqExpressions, VectorExpressions}

/** Product-quantization ANN (Jégou et al. 2011) — the memory-bounded
  * third leg of the similarity-search family: brute force is exact but
  * O(dim) floats per candidate, IVF prunes candidates but still stores
  * full vectors, PQ stores each candidate as `m` SMALL INTS (m bytes at
  * c <= 256) and scores it with m table lookups. At 100 TB of embeddings
  * the encoded corpus is dim*4/m times smaller than the float corpus —
  * the difference between an index that fits executor memory and one
  * that doesn't — and the scan-side cost per (query, candidate) drops
  * from a dim-length float loop to m reads of a query-local table.
  *
  * Determinism: codebooks are the [[Ivf.portableSeedModel]] convention
  * (the c corpus vectors with the smallest (md5(id), id), sub-sliced per
  * subspace — no iteration), and every distance is evaluated in a fixed
  * nested order (see [[graft.expressions.PqRuntime]]), so codes, ADC
  * scores and ranks all hash-match a SQL replay bit-exactly (q168) —
  * 0.0 drift measured against DuckDB over the battery corpus.
  */
object Pq {

  /** `codebooks(j)(cell)` = codeword `cell` of subspace `j`. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def c: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
  }

  /** Deterministic seed codebooks: the `c` corpus vectors with the
    * smallest `(md5(id), id)` (the q118 portable-quantizer convention),
    * each sliced into `m` sub-vectors. `dim` must divide evenly into `m`
    * subspaces. [[train]] refines these with Lloyd iterations — and does
    * it WITHOUT losing SQL replayability (the q261 decimal-iterate
    * convention), so unlike the IVF pair (q51 trained / q118 portable)
    * both PQ faces sit under full hash oracles (q168 seed, q291 trained).
    */
  def portableSeedCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, c: Int): Model = {
    require(m >= 1, "m must be >= 1")
    require(c >= 1, "c must be >= 1")
    val seeds = corpus
      .select(col(vecCol).cast("array<double>").as("v"), col(idCol).as("id"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(c)
      .collect() // bounded: c rows
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == c, s"corpus has fewer than $c rows")
    val dim = seeds(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sd = dim / m
    Model(Array.tabulate(m)(j => seeds.map(_.slice(j * sd, (j + 1) * sd))))
  }

  /** Lloyd-refined codebooks — the production-quality trainer the seed
    * codebooks deliberately are not: RecallBench (round 16) measured the
    * seed-codebook ADC faces at recall@10 ~0.5 against their own
    * exact-L2 truth at every scale (pure quantization loss — md5-chosen
    * corpus rows are poor codewords), and k-means refinement is the
    * standard fix (Jégou et al. 2011 §III trains exactly this way).
    *
    * Contrary to the seed scaladoc's original trade-off note, refinement
    * does NOT cost SQL replayability when each step follows the q261
    * iterate convention: assignment is [[encode]] under the current
    * codebooks (fixed-order sub-distances, ties to the lower cell);
    * the update is the per-(subspace, cell, dim) mean of the 6-dp
    * quantized coordinates — EXACT decimal(28,6) sums divided by the
    * count in double and re-quantized to 6 dp — so every refined
    * codeword is engine-reproducible (q291 replays one full step in
    * DuckDB). An empty cell keeps its previous codeword (the standard
    * k-means dead-cell rule, and what the LEFT JOIN replay does).
    *
    * Scale: per iteration one shuffle of `(j, cell, d, x)` rows
    * (map-side-combinable aggregation; m*dim values per corpus row) and
    * one O(m*c*subDim) collect — the codebook is driver-bounded by
    * contract, the corpus never is.
    */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, c: Int, iters: Int = 3): Model = {
    require(iters >= 0, "iters must be >= 0")
    var model = portableSeedCodebooks(corpus, idCol, vecCol, m, c)
    val subDim = model.subDim
    val vecs = corpus.where(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"), col(vecCol).as("__raw"))
    for (_ <- 1 to iters) {
      val assigned = vecs
        .select(col("__v"),
          posexplode(PqExpressions.pqEncode(col("__raw"), model.codebooks))
            .as(Seq("j", "cell")))
        .select(col("j"), col("cell"),
          posexplode(slice(col("__v"), col("j") * subDim + 1, lit(subDim)))
            .as(Seq("d", "x")))
      // 6-dp quantization via floor(x*1e6 + 0.5)/1e6 rather than
      // round(x, 6): Spark rounds the exact decimal expansion while
      // DuckDB rounds the FLOAT product, and on an exact .5 product the
      // two disagree by 1e-6 — a codeword off by 1e-6 then shifts ADC
      // dists by ~1e-7 and flips their display rounding (the q291
      // sf0.001 gate hit, round 17). The floor form is the same IEEE
      // ops in either engine; for negative values it is half-toward-
      // +inf rather than half-away — a CONVENTION both sides share,
      // which is all the oracle contract needs
      def q6(e: org.apache.spark.sql.Column) =
        floor(e * lit(1e6) + lit(0.5)) / lit(1e6)
      val means = assigned.groupBy(col("j"), col("cell"), col("d"))
        .agg(q6(sum(q6(col("x")).cast("decimal(28,6)")).cast("double")
          / count(lit(1))).as("w"))
        .collect() // bounded: at most m * c * subDim rows
      val next = Array.tabulate(m, c, subDim)(
        (j, cell, d) => model.codebooks(j)(cell)(d))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      model = Model(next)
    }
    model
  }

  /** Persist codebooks: one line per (subspace, codeword) as
    * `j;cell;v1,v2,...` with `java.lang.Double.toString` values (shortest
    * exact representation — parses back bit-identically), through the
    * Hadoop FileSystem like [[Ivf.saveModel]]. Freeze codebooks once per
    * corpus generation: PQ codes are only comparable under the codebooks
    * that produced them, so an incremental encode MUST load, never
    * retrain (the [[Ivf]] model-reuse argument, but stricter — a moved
    * codeword silently reinterprets every stored code).
    */
  def saveCodebooks(
      spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val sb = new StringBuilder
      for (j <- 0 until model.m; cell <- 0 until model.c) {
        sb.append(j).append(';').append(cell).append(';')
          .append(model.codebooks(j)(cell).mkString(",")).append('\n')
      }
      out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** Load codebooks written by [[saveCodebooks]] — bit-identical. */
  def loadCodebooks(
      spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    val rows = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty)
      .map { line =>
        val Array(j, cell, vs) = line.split(";", 3)
        (j.toInt, cell.toInt, vs.split(",").map(java.lang.Double.parseDouble))
      }
    require(rows.nonEmpty, s"no codebooks in $path")
    val m = rows.map(_._1).max + 1
    val c = rows.map(_._2).max + 1
    require(rows.length == m * c, s"incomplete codebook grid in $path")
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    val cb = Array.tabulate(m)(j => Array.tabulate(c)(cell => byKey((j, cell))))
    require(cb.flatten.map(_.length).distinct.length == 1,
      s"ragged codeword dims in $path")
    Model(cb)
  }

  /** Encode a corpus: `(idCol, codes array<int>)` — the persistable PQ
    * index (m ints per vector; write it as parquet like any table).
    */
  def encode(
      model: Model, df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
      PqExpressions.pqEncode(col(vecCol), model.codebooks).as("codes"))

  /** ADC top-k: `(query_id, neighbor_id, adc_dist, rank)` — rank 1 =
    * smallest approximate distance, ties to the smaller neighbor id.
    *
    * Plan shape: candidates encode (or arrive pre-encoded via
    * `codesDf`) and NEVER shuffle; queries broadcast with their distance
    * tables already materialized (one table per query row, computed
    * once); the scan side pays m table reads per pair; the only
    * exchange is the per-query top-k window — the [[Similarity
    * .bruteForceTopK]] shape with the float loop swapped for lookups.
    */
  def adcTopK(
      model: Model, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int = 10, excludeSelf: Boolean = true,
      codesDf: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val codes = codesDf.getOrElse(encode(model, corpus, idCol, vecCol))
      .select(col(idCol).as("neighbor_id"), col("codes").as("__codes"))
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      PqExpressions.pqDistTable(col(vecCol), model.codebooks).as("__dtab")))
    val scored = codes
      .join(q)
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("__dist",
        PqExpressions.pqAdcScore(col("__dtab"), col("__codes"), model.c))
    topKRank(scored, k)
  }

  /** Per-query top-k on the GroupTopK heap operator: every query is ONE
    * hot group holding the whole candidate set, exactly the shape where
    * the heap's O(n log k) beats the window form's per-partition full
    * sort — and the exchange carries at most k rows per (query,
    * partition) instead of every scored pair. (query, dist, neighbor) is
    * a total order, so ranks are deterministic.
    */
  private def topKRank(scored: DataFrame, k: Int): DataFrame =
    graft.plans.GroupTopK(scored, Seq("query_id"),
        Seq(("__dist", true), ("neighbor_id", true)), k, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"),
        // display rounding via floor(x*1e6 + 0.5)/1e6, NOT round(x, 6):
        // the dist doubles are bit-identical cross-engine, but Spark
        // rounds the exact decimal expansion (HALF_UP on BigDecimal)
        // while DuckDB rounds the FLOAT product x*1e6 — when that
        // product lands exactly on .5 the two disagree by 1e-6 (hit at
        // the sf0.001 gate, round 17). The floor form is the same three
        // IEEE ops in either engine, so it cannot diverge; dist >= 0
        // (a sum of squares), so floor(+0.5) IS half-up here
        (floor(col("__dist") * lit(1e6) + lit(0.5)) / lit(1e6)).as("adc_dist"),
        col("rank").cast("int").as("rank"))

  /** ADC shortlist + exact re-rank — the production remedy for ADC's
    * quantization ceiling. RecallBench (round 16) measured the ADC faces
    * at recall@10 ~0.5 against their own exact-L2 truth at every scale
    * AND showed Lloyd training barely moves it (~+0.02): with c = 16
    * codewords per 8-dim subspace the approximation error among CLOSE
    * neighbors dominates, and better codebooks cannot buy the ranking
    * back. The standard fix (FAISS's refine stage) is to over-retrieve
    * by ADC — cheap, code-only scans — and re-rank only the shortlist
    * with the exact metric on raw floats: measured recall@10 0.94-0.99
    * (scale-flat) at `shortlist = 10 * k` where pure ADC sat at ~0.5.
    *
    * Plan shape: the ADC stage is [[adcTopK]] unchanged (candidates
    * never shuffle); the re-rank joins the |queries| * shortlist frame
    * (bounded, broadcast side) back to the corpus on the id — the
    * corpus streams once more, no shuffle — and exact cosine + the
    * GroupTopK heap keep `k`. Output is the [[Similarity.bruteForceTopK]]
    * contract `(query_id, neighbor_id, cosine, rank)`, so the two are
    * drop-in interchangeable.
    *
    * SHORTLIST SIZING (round-17, the verdict's SQ8 lesson applied): a
    * FIXED shortlist dilutes as the corpus grows — the ADC error shell
    * around each query holds a roughly constant FRACTION of the corpus
    * at fixed codebook resolution, so the rows that belong in the
    * shortlist outgrow any constant S (RecallBench measured S=100
    * recall 0.78 -> 0.57 -> 0.56 at 1x/10x/25x). The DEFAULT
    * (`shortlist = 0`) therefore DERIVES S from the corpus count:
    * `S = max(ceil(shortlistFrac * |corpus|), 10 * k)` — the fraction
    * tracks the error shell, the `10 * k` floor is the measured 1x
    * knee. Pass `shortlist > 0` to pin a fixed count explicitly (the
    * oracle-friendly override), and `corpusCount` to skip the count
    * action when the caller already knows it. Rerank cost is
    * |queries| * S exact distances — linear in the corpus at fixed
    * query count, the price of scale-flat recall.
    */
  def adcRerankTopK(
      model: Model, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int = 10, shortlist: Int = 0, excludeSelf: Boolean = true,
      codesDf: Option[DataFrame] = None,
      shortlistFrac: Double = DefaultShortlistFrac,
      corpusCount: Option[Long] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(shortlist >= 0, s"shortlist $shortlist must be >= 0 (0 = derive)")
    require(shortlistFrac > 0.0 && shortlistFrac <= 1.0,
      "shortlistFrac must be in (0, 1]")
    val s =
      if (shortlist > 0) shortlist
      // ONE sizing rule for both rerank families (q297 and q305) — a
      // round-17 review finding had it duplicated here and in mining
      else Similarity.miningShortlistSize(
        corpusCount.getOrElse(corpus.count()), k, shortlistFrac)
    require(s >= k, s"shortlist $s must be >= k $k")
    val short = adcTopK(model, corpus, queries, idCol, vecCol, queryIdCol,
        k = s, excludeSelf = excludeSelf, codesDf = codesDf)
      .select(col("query_id"), col("neighbor_id"))
    val scored = broadcast(short)
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"))), Seq("query_id"))
      .withColumn("__cos",
        graft.functions.vectors.cosine(col("__qv"), col("__cv")))
    graft.plans.GroupTopK(scored, Seq("query_id"),
        Seq(("__cos", false), ("neighbor_id", true)), k, rankName = "rank")
      .select(col("query_id"), col("neighbor_id"),
        // + 0.0 normalizes signed zero (the cosineTopKRank convention)
        (round(col("__cos"), 6) + lit(0.0)).as("cosine"),
        col("rank").cast("int").as("rank"))
  }

  /** Corpus fraction behind the DERIVED rerank shortlist: 0.02 is the
    * 1x fixture geometry where S = 100 over the 5k-vector corpus read
    * its best recall — the shell fraction RecallBench's dilution rows
    * imply (S=100 was right at 1x and starved at 10x/25x, where
    * 0.02 * corpus restores 1000/2500-deep shortlists). Re-derive for a
    * different codebook resolution: higher c shrinks the error shell
    * and supports a smaller fraction.
    */
  val DefaultShortlistFrac: Double = 0.02

  /** IVF + PQ — the production ANN architecture (FAISS's IVFADC): the
    * coarse quantizer prunes candidates to the `nProbe` nearest cells,
    * PQ codes score the survivors. Composes the two oracled components
    * unchanged: cell assignment is [[Ivf]]'s cosine convention, scoring
    * is [[adcTopK]]'s fixed-order ADC, so the whole path stays under one
    * SQL replay (q169).
    *
    * Plan shape: the candidate side carries `(cell, codes)` — one int +
    * m small ints per vector, never the floats — and the probe join is a
    * broadcast EQUI-join on the cell id (candidates never shuffle; each
    * candidate has exactly one cell, so no post-join dedup is needed).
    * Search cost drops from |corpus| pairs (q168) to |probed cells| —
    * the two levers (candidate pruning, per-pair cost) multiply.
    */
  def ivfAdcTopK(
      coarse: Ivf.Model, pq: Model, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int = 10, nProbe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    // nProbe = 4 matches Ivf.topK's measured-knee default (RecallBench:
    // 0.90 vs 0.76-0.82 at nProbe=2, scale-flat) — the two faces share
    // the same coarse quantizer, so they share the dial (a round-17
    // review finding: this one stayed at 2 when Ivf.topK moved)
    require(k >= 1, "k must be >= 1")
    require(nProbe >= 1, "nProbe must be >= 1")
    ivfAdcProbe(coarse, pq,
      AnnIndex.encode(corpus, idCol, vecCol, coarse, pq),
      queries, vecCol, queryIdCol, k, nProbe, excludeSelf)
  }

  /** [[ivfAdcTopK]]'s probe half against a PRE-ENCODED candidate frame
    * (`(vec_id, cell, codes)` — [[AnnIndex.encode]]'s schema): the
    * production ingest shape encodes the corpus ONCE per generation and
    * persists the codes ([[AnnIndex]]), so a query pays only the
    * broadcast probe join — the corpus-side `nearestCentroids` +
    * `pqEncode` pass that [[ivfAdcTopK]] runs per call vanishes.
    * Identical results to [[ivfAdcTopK]] over the frame's source corpus
    * (AnnIndexSpec pins it); `excludeSelf` defaults FALSE here because
    * the ingest shape probes an increment whose ids are disjoint from
    * the standing index.
    */
  def ivfAdcProbe(
      coarse: Ivf.Model, pq: Model, cells: DataFrame, queries: DataFrame,
      vecCol: String, queryIdCol: String,
      k: Int = 10, nProbe: Int = 4, excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(nProbe >= 1, "nProbe must be >= 1")
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"),
      PqExpressions.pqDistTable(col(vecCol), pq.codebooks).as("__dtab"),
      explode(VectorExpressions.nearestCentroids(
        col(vecCol), coarse.centroids, nProbe)).as("__cell")))
    val scored = cells
      .select(col("vec_id").as("neighbor_id"), col("cell").as("__cell"),
        col("codes").as("__codes"))
      .join(q, "__cell")
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("__dist",
        PqExpressions.pqAdcScore(col("__dtab"), col("__codes"), pq.c))
    topKRank(scored, k)
  }
}
