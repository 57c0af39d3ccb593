package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics — the PCA/whitening groundwork under the
  * engine's exactness contract: the covariance of an embedding column
  * computed from EXACT decimal moment sums, so the matrix (the input to
  * any eigen/whitening step, and the diagnostic that catches collapsed or
  * degenerate embedding dims before they poison SemDedup/clustering) is
  * reproducible bit-for-bit in any engine.
  */
object Embeddings {

  /** Upper-triangle covariance report of `vecCol` (dimension `dim`):
    * one row per dim pair `i <= j` with exact decimal moment sums over
    * the 6-dp-QUANTIZED coordinates and `cov = (n*Σxy - Σx*Σy) / n²` —
    * the sums-formulation needs no mean subtraction, so every cross-row
    * quantity is an exact decimal and the single double division
    * (rounded to 6 dp) is the only floating step. Diagonal rows are the
    * per-dim variances: a near-zero entry is a dead dim.
    *
    * Quantization is LOAD-BEARING for portability, not a shortcut: a
    * raw double cast to a high-scale decimal rounds differently across
    * engines (Spark converts via the shortest decimal representation,
    * DuckDB via the exact binary expansion — they disagree in the last
    * digit on float-derived values), while `round(x, 6)` lands both
    * engines on the same 6-dp decimal, whose products and sums are then
    * exact — the rounded-cosine convention applied to moments.
    *
    * Returns `(i, j, n, sx, sy, sxy, cov)` with the sums cast to double
    * for the report (they are exact decimals underneath).
    *
    * Scale: ALL moments accumulate in ONE aggregation pass with a
    * fixed-size mergeable buffer
    * ([[graft.expressions.GramMoments]] — n, d first-moment sums,
    * d(d+1)/2 second-moment sums as exact BigDecimals): map-side
    * combine is total and the exchange carries ONE buffer per
    * partition, where the previous explode-then-groupBy formulation
    * materialized d(d+1)/2 struct rows PER INPUT ROW (4.2M rows at
    * sf0.1) before partial aggregation could shrink them — measured
    * ~3x on the q260 wall clock, identical output bit-for-bit. The
    * O(n·d²) multiply work is inherent to covariance. Rows with null
    * vectors are excluded; a wrong-length vector (and a null
    * coordinate) fails loudly (a silent skip would bias the moments).
    */
  def covarianceReport(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be positive")
    val vecs = df.select(transform(col(vecCol).cast("array<double>"),
        x => round(x, 6).cast("decimal(18,6)")).as("__v"))
      .where(col("__v").isNotNull)
      .localCheckpoint() // feeds the length guard and the moment pass once
    val bad = vecs.where(size(col("__v")) =!= dim).limit(1).count()
    require(bad == 0,
      s"covarianceReport: vector with length != $dim present — mixed " +
        "embedding models? (silent truncation would bias the tail dims)")
    val m = vecs
      .agg(graft.expressions.GramMoments.gramMoments(col("__v"), dim).as("__m"))
      .where(col("__m.n") > 0) // empty corpus -> empty report
    // fan the single moment row out to the d(d+1)/2 pair rows; the
    // row-major upper-triangle index of (i, j) is i*d - i(i-1)/2 + (j-i)
    // (i(i-1) is always even, so the halving is exact)
    val pairIdx = explode(flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"))))))
    val tri = ((col("i") * lit(dim) -
      (col("i") * (col("i") - 1)) / 2 + (col("j") - col("i"))) + 1).cast("int")
    // final arithmetic in ONE fixed double tree over the exact decimal
    // sums (decimal x decimal would hit engine-specific result-scale
    // rules; decimal -> double casts and the IEEE tree are deterministic
    // everywhere)
    val (nD, sxD, syD, sxyD) = (col("n").cast("double"),
      col("__sx").cast("double"), col("__sy").cast("double"),
      col("__sxy").cast("double"))
    m.select(col("__m"), pairIdx.as("__p"))
      .select(col("__p.i").as("i"), col("__p.j").as("j"),
        col("__m.n").as("n"), col("__m.sx").as("__sxa"), col("__m.sxy").as("__sxya"))
      .select(col("i"), col("j"), col("n"),
        element_at(col("__sxa"), col("i") + 1).as("__sx"),
        element_at(col("__sxa"), col("j") + 1).as("__sy"),
        element_at(col("__sxya"), tri).as("__sxy"))
      .select(col("i"), col("j"), col("n"),
        sxD.as("sx"), syD.as("sy"), sxyD.as("sxy"),
        // + 0.0 normalizes IEEE signed zero: Spark's round() (BigDecimal
        // HALF_UP) yields +0.0 where DuckDB's round keeps -0.0 on a tiny
        // negative covariance — `-0.0 + 0.0 = +0.0` lands both engines on
        // the same rendered value (round-12 q260; oracle adds `+ 0` too)
        (round((nD * sxyD - sxD * syD) / (nD * nD), 6) + lit(0.0)).as("cov"))
  }

  /** Row-local projection of every embedding onto a fixed direction —
    * the per-document coordinate along a [[topComponent]] axis (the
    * "outlier along the dominant direction" readout, and the 1-D
    * whitening step). Exact by construction: 6-dp-quantized coordinates
    * times the 6-dp loading literals, summed as one fixed decimal
    * expression tree (decimal addition is exact, so the tree equals any
    * SQL engine's aggregate over the same products). Returns
    * `(idCol, proj)` with `proj` the exact decimal cast to double;
    * null vectors are excluded.
    */
  def projectOnto(
      df: DataFrame, idCol: String, vecCol: String,
      loadings: Seq[Double]): DataFrame = {
    require(loadings.nonEmpty, "empty direction")
    val v0 = col(vecCol).cast("array<double>")
    // loud length guard IN THE ROW PATH (zip_with pads a short vector
    // with nulls, which would null the fold and silently emit proj =
    // null on a mixed-model corpus): raise_error costs no extra action,
    // where a count-based pre-check would recompute the whole upstream
    // plan once per call just to validate it
    // the null-vector WHERE below runs on v0, and this guard fires only
    // for present vectors (a null size would route to otherwise and
    // raise on the excluded rows)
    val v = when(size(v0) === lit(loadings.length), v0)
      .otherwise(raise_error(concat(
        lit("projectOnto: vector with length "), size(v0).cast("string"),
        lit(s" != ${loadings.length} — mixed embedding models? " +
          "(a null projection would silently drop)")))
        .cast("array<double>"))
    // each partial sum is pinned back to decimal(28,12): Spark's decimal
    // ADD grows precision per step, and a 64-term fold blows past the
    // 38 cap where allowPrecisionLoss silently truncates the scale (a
    // 6-dp result was observed); the re-cast is exact at these
    // magnitudes (|term| < 1e6) and keeps every step full-scale.
    // Shape: zip_with + aggregate (a LOOP over the loading literals),
    // not a d-deep nested expression tree — the tree form generated a
    // 64-level method that took janino seconds to compile per plan; the
    // fold is the same left-associated exact arithmetic (a leading
    // 0 + t1 add is exact) in O(1) expression depth
    val loadLit = array(loadings.map(l => lit(l).cast("decimal(18,6)")): _*)
    val terms = zip_with(
      transform(v, x => round(x, 6).cast("decimal(18,6)")), loadLit,
      (x, l) => (x * l).cast("decimal(28,12)"))
    df.where(v0.isNotNull)
      .select(col(idCol),
        aggregate(terms, lit(java.math.BigDecimal.ZERO).cast("decimal(28,12)"),
          (acc, t) => (acc + t).cast("decimal(28,12)"))
          .cast("double").as("proj"))
  }

  /** Dominant principal direction of a [[covarianceReport]] frame via
    * `iters` FIXED power-iteration rounds — the oracle-replayable
    * spectral step (the q222 PageRank iterate convention): every
    * matrix-vector product is exact decimal arithmetic over the 6-dp
    * covariance entries and 6-dp iterate components, each round
    * max-normalizes with ONE double division and re-quantizes to 6 dp.
    * Starting vector is all-ones (deterministic sign). Returns
    * `(i, loading)` — the UNNORMALIZED direction (max |component| = 1);
    * consumers needing a unit vector divide by its norm (libm sqrt,
    * which is exactly why the contract stops here).
    *
    * Scale: the covariance frame is O(d²) — collected to the driver
    * like every model-sized frame (the Ivf/Pq codebook bound); the
    * iteration is O(iters·d²) driver work, microseconds at embedding
    * dims. Fails loudly on an all-zero matrix (no direction exists).
    */
  def topComponent(
      cov: DataFrame, dim: Int, iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val spark = cov.sparkSession
    val c = Array.ofDim[java.math.BigDecimal](dim, dim)
    val zero = java.math.BigDecimal.ZERO
    for (i <- 0 until dim; j <- 0 until dim) c(i)(j) = zero
    cov.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      // valueOf(double) = shortest decimal representation = the exact
      // 6-dp value round(.., 6) produced (the localPageRank convention)
      val v = java.math.BigDecimal.valueOf(r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    var v = Array.fill(dim)(java.math.BigDecimal.ONE)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        (0 until dim).foldLeft(zero)((acc, j) => acc.add(c(i)(j).multiply(v(j))))
      }
      val mx = w.map(_.abs).max
      require(mx.signum != 0,
        "topComponent: zero covariance matrix — no principal direction")
      v = w.map(x => r6(x.doubleValue() / mx.doubleValue()))
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i, x.doubleValue()) }
      .toSeq.toDF("i", "loading")
  }
}
