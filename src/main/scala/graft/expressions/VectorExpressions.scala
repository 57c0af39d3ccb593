package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` / `array<double>` embedding
  * columns. The `zip_with`/`aggregate` formulations run on Spark's
  * interpreted higher-order-function path (one closure dispatch per vector
  * element); these expressions run the dot-product loops as tight JVM code —
  * the difference between O(dim) interpreted allocations and O(dim) float
  * multiplies per row, which dominates ANN/near-dup pipelines. They are
  * `CodegenFallback` (one boxed `eval` per row at the codegen boundary) —
  * negligible next to the O(dim) loop they amortize.
  */
object VectorExpressions {

  private def toDoubles(a: ArrayData, elem: DataType): Array[Double] = elem match {
    case FloatType => a.toFloatArray().map(_.toDouble)
    case DoubleType => a.toDoubleArray()
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Mismatched vector dimensions are a caller bug (mixed embedding models,
    * wrong `dim`); silently truncating to the shorter length returns a
    * plausible-but-wrong similarity, so fail loudly instead.
    */
  private def requireSameDim(op: String, a: Int, b: Int): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"$op: vector dimension mismatch ($a vs $b)")

  private def elemType(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => e
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  /** Cosine similarity of two same-length vectors; 0.0 on zero norm. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = toDoubles(l.asInstanceOf[ArrayData], elemType(left.dataType))
      val b = toDoubles(r.asInstanceOf[ArrayData], elemType(right.dataType))
      requireSameDim(prettyName, a.length, b.length)
      val n = a.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Signed random-hyperplane LSH bucket: bit i of the result is the sign of
    * `vec · planes(i)`, packed into a long. The plane matrix is generated
    * driver-side (deterministic seed) and rides in the expression — no
    * broadcast, no per-element lambda.
    */
  case class HyperplaneSignBucket(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    require(planes.nonEmpty && planes.length <= 64, "1..64 planes")
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_sign_bucket"

    override def nullSafeEval(input: Any): Any = {
      val v = toDoubles(input.asInstanceOf[ArrayData], elemType(child.dataType))
      var bucket = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        requireSameDim(prettyName, v.length, plane.length)
        val n = v.length
        var d = 0.0
        var i = 0
        while (i < n) { d += v(i) * plane(i); i += 1 }
        if (d >= 0.0) bucket |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Indices of the `nProbe` nearest centroids (by cosine) for a vector —
    * the IVF coarse-quantizer assignment, one tight k x dim loop per row.
    * Returns array<int> ordered nearest-first.
    */
  case class NearestCentroids(
      child: Expression, centroids: Array[Array[Double]], nProbe: Int)
      extends UnaryExpression with CodegenFallback {
    require(centroids.nonEmpty && nProbe >= 1)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids"

    private lazy val centroidNorms: Array[Double] =
      centroids.map(c => math.sqrt(c.map(x => x * x).sum))

    override def nullSafeEval(input: Any): Any = {
      val v = toDoubles(input.asInstanceOf[ArrayData], elemType(child.dataType))
      val vn = math.sqrt(v.map(x => x * x).sum)
      val sims = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        val cen = centroids(c)
        requireSameDim(prettyName, v.length, cen.length)
        val n = v.length
        var d = 0.0; var i = 0
        while (i < n) { d += v(i) * cen(i); i += 1 }
        val denom = vn * centroidNorms(c)
        sims(c) = if (denom == 0.0) -2.0 else d / denom
        c += 1
      }
      val order = sims.indices.sortBy(i => (-sims(i), i)).take(nProbe)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        order.map(Int.box).toArray[Any])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(
      NearestCentroids(ColumnBridge.expression(vec), centroids, nProbe))

  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplaneSignBucket(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      HyperplaneSignBucket(ColumnBridge.expression(vec), planes))
}
