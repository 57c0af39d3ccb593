package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` / `array<double>` embedding
  * columns. The `zip_with`/`aggregate` formulations run on Spark's
  * interpreted higher-order-function path (one closure dispatch per vector
  * element); these expressions run the dot-product loops as tight JVM code —
  * the difference between O(dim) interpreted allocations and O(dim) float
  * multiplies per row, which dominates ANN/near-dup pipelines. `doGenCode`
  * emits a direct static call into [[VectorRuntime]], so they stay inside
  * whole-stage codegen; the interpreted path shares the same kernels.
  */
object VectorExpressions {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  /** Cosine similarity of two same-length vectors; 0.0 on zero norm. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    private lazy val lFloat = isFloatArray(left.dataType)
    private lazy val rFloat = isFloatArray(right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(VectorRuntime.cosine(
        l.asInstanceOf[ArrayData], lFloat, r.asInstanceOf[ArrayData], rFloat))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.VectorRuntime.cosine($a, $lFloat, $b, $rFloat);")

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
      extends UnaryExpression {
    require(planes.nonEmpty && planes.length <= 64, "1..64 planes")
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_sign_bucket"

    private lazy val vFloat = isFloatArray(child.dataType)

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(VectorRuntime.hyperplaneBucket(
        input.asInstanceOf[ArrayData], vFloat, planes))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.VectorRuntime.hyperplaneBucket($c, $vFloat, $planesRef);")
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
      extends UnaryExpression {
    require(centroids.nonEmpty && nProbe >= 1)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids"

    private lazy val vFloat = isFloatArray(child.dataType)
    private lazy val centroidNorms: Array[Double] =
      centroids.map(c => math.sqrt(c.map(x => x * x).sum))

    override def nullSafeEval(input: Any): Any =
      VectorRuntime.nearestCentroids(
        input.asInstanceOf[ArrayData], vFloat, centroids, centroidNorms, nProbe)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val nRef = ctx.addReferenceObj("centroidNorms", centroidNorms, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.VectorRuntime.nearestCentroids(" +
          s"$c, $vFloat, $cRef, $nRef, $nProbe);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Symmetric int8 quantization of an embedding: `(scale DOUBLE, codes
    * ARRAY<INT>)` — see [[VectorRuntime.int8Quantize]] for the exact,
    * cross-engine-reproducible arithmetic. One pass per row, no explode.
    */
  case class Int8Quantize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "int8_quantize"

    private lazy val vFloat = isFloatArray(child.dataType)

    override def nullSafeEval(input: Any): Any =
      VectorRuntime.int8Quantize(input.asInstanceOf[ArrayData], vFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.VectorRuntime.int8Quantize($c, $vFloat);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact 128-bit dot of two scale-6 unscaled long arrays, typed
    * decimal(38,12) — the SQ8 scoring kernel. The equivalent
    * `aggregate(zip_with(...))` over decimal arrays evaluates one
    * interpreted lambda per element; this is one static call inside
    * WholeStageCodegen with identical exact values (Sq8Spec pins both
    * against a BigDecimal reference).
    */
  case class ScaledDotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DecimalType(38, 12)
    override def prettyName: String = "scaled_dot_product"

    // The kernel reads long element storage directly (ArrayData.getLong);
    // anything but array<long> would silently produce garbage scores, so a
    // wrong-typed child must fail analysis, not score.
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val bad = Seq(("left", left), ("right", right)).collectFirst {
        case (side, e) if !e.dataType.isInstanceOf[ArrayType] ||
            e.dataType.asInstanceOf[ArrayType].elementType != LongType =>
          s"$side input must be array<bigint>, got ${e.dataType.simpleString}"
      }
      bad.fold[org.apache.spark.sql.catalyst.analysis.TypeCheckResult](
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)(
        m => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"scaled_dot_product: $m"))
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      VectorRuntime.scaledDotDecimal(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.VectorRuntime.scaledDotDecimal($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def int8Quantize(vec: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(vec)))

  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(
      NearestCentroids(ColumnBridge.expression(vec), centroids, nProbe))

  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def scaledDotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      ScaledDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplaneSignBucket(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      HyperplaneSignBucket(ColumnBridge.expression(vec), planes))
}
