package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` / `array<double>`
  * columns. Pure `zip_with`/`aggregate` compositions — codegen'd, no UDFs —
  * so similarity math stays inside whole-stage codegen on the executors.
  */
object vectors {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; 0.0 when either vector has zero norm. Runs in the
    * native expression ([[graft.expressions.VectorExpressions]]) — the
    * `zip_with`/`aggregate` form is interpreted per element.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineSimilarity(a, b)

  /** L2-normalized copy of the vector (zero vector stays zero). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, asDouble(a))
      .otherwise(transform(asDouble(a), v => v / n))
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Symmetric int8 quantization: `(scale, codes)` with scale = max|v|/127
    * and round-half-away-from-zero codes in [-127, 127] — the standard
    * storage compression for embedding corpora (4x smaller than float32,
    * reconstruction = code * scale). Native one-pass expression; the exact
    * fixed-order double arithmetic is SQL-reproducible, so quantized codes
    * can be differentially verified across engines.
    */
  def int8Quantize(a: Column): Column =
    graft.expressions.VectorExpressions.int8Quantize(a)

  /** Signed random-hyperplane LSH bucket: k sign bits of dot products with
    * deterministic pseudo-random hyperplanes, packed into a long. Same
    * hyperplanes (seed, dim) on both sides of a join => cosine-similar
    * vectors collide with high probability.
    *
    * The hyperplane matrix is generated driver-side from a fixed seed and
    * inlined as literals — broadcast-free, fully codegen'd.
    */
  def hyperplaneBucket(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val rng = new scala.util.Random(seed)
    val planes: Array[Array[Double]] =
      Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
    graft.expressions.VectorExpressions.hyperplaneSignBucket(vec, planes)
  }
}
