package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each vector into `m`
  * subspaces, quantize each to its nearest codeword, and score candidates
  * by Asymmetric Distance Computation — the query's per-(subspace,
  * codeword) distance table plus `m` lookups per candidate instead of a
  * `dim`-length float loop.
  *
  * Determinism contract (what lets q168 hash-oracle the whole path): every
  * sub-distance is the sequential dim-order sum of squared diffs, the ADC
  * total is the sequential subspace-order sum of sub-distances, and encode
  * ties break to the smallest codeword index — each an IEEE-fixed
  * evaluation order any engine can replay (DuckDB: a list comprehension
  * per sub-distance, `list_sum(list(... ORDER BY j))` for the total).
  *
  * Same design as [[VectorExpressions]]: one kernel, interpreted and
  * codegen callers, codebooks riding into generated code as one reference
  * object.
  */
object PqRuntime {

  @inline private def at(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private def checkDim(n: Int, cb: Array[Array[Array[Double]]]): Unit = {
    val want = cb.length * cb(0)(0).length
    if (n != want) throw new IllegalArgumentException(
      s"vector has $n dims, codebooks expect ${cb.length} x ${cb(0)(0).length} = $want")
  }

  /** Sub-distance of vector `v`'s subspace `j` to codeword `cw`:
    * sequential dim-order sum of squared diffs.
    */
  @inline private def subDist(
      v: ArrayData, isFloat: Boolean, j: Int, cw: Array[Double]): Double = {
    val sd = cw.length
    var acc = 0.0
    var d = 0
    while (d < sd) {
      val diff = at(v, j * sd + d, isFloat) - cw(d)
      acc += diff * diff
      d += 1
    }
    acc
  }

  /** PQ codes (`array<int>`, length m): per subspace the nearest codeword
    * index, ties to the smallest index (strict `<` keeps the first best).
    */
  def encode(
      v: ArrayData, isFloat: Boolean,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    checkDim(v.numElements(), cb)
    val m = cb.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cells = cb(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var cell = 0
      while (cell < cells.length) {
        val dist = subDist(v, isFloat, j, cells(cell))
        if (dist < bestD) { bestD = dist; best = cell }
        cell += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The query-side ADC distance table (`array<double>`, length m*c):
    * entry j*c + cell = sub-distance of the query's subspace j to
    * codeword cell. Computed once per query row; every candidate then
    * costs m lookups.
    */
  def distTable(
      v: ArrayData, isFloat: Boolean,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    checkDim(v.numElements(), cb)
    val m = cb.length
    val c = cb(0).length
    val out = new Array[Double](m * c)
    var j = 0
    while (j < m) {
      var cell = 0
      while (cell < c) {
        out(j * c + cell) = subDist(v, isFloat, j, cb(j)(cell))
        cell += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: sequential subspace-order sum of the table entries the
    * candidate's codes select — m array reads per (query, candidate).
    */
  def adcScore(dtab: ArrayData, codes: ArrayData, c: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += dtab.getDouble(j * c + codes.getInt(j))
      j += 1
    }
    acc
  }
}

object PqExpressions {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  private def checkCodebooks(cb: Array[Array[Array[Double]]]): Unit = {
    require(cb.nonEmpty, "codebooks must be non-empty")
    val c = cb(0).length
    val sd = cb(0)(0).length
    require(c > 0 && sd > 0, "codebooks must have codewords and dims")
    require(cb.forall(b => b.length == c && b.forall(_.length == sd)),
      "all subspace codebooks must share (codewords, subDim)")
  }

  /** PQ codes of an embedding under frozen codebooks. */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression {
    checkCodebooks(codebooks)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    private lazy val vFloat = isFloatArray(child.dataType)

    override def nullSafeEval(input: Any): Any =
      PqRuntime.encode(input.asInstanceOf[ArrayData], vFloat, codebooks)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.expressions.PqRuntime.encode($v, $vFloat, $cbRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Query-side ADC distance table under frozen codebooks. */
  case class PqDistTable(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression {
    checkCodebooks(codebooks)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_dist_table"

    private lazy val vFloat = isFloatArray(child.dataType)

    override def nullSafeEval(input: Any): Any =
      PqRuntime.distTable(input.asInstanceOf[ArrayData], vFloat, codebooks)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.expressions.PqRuntime.distTable($v, $vFloat, $cbRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC score of a candidate's codes against a query's distance table. */
  case class PqAdcScore(left: Expression, right: Expression, c: Int)
      extends BinaryExpression {
    require(c > 0, "c must be positive")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_score"

    override def nullSafeEval(dtab: Any, codes: Any): Any =
      java.lang.Double.valueOf(PqRuntime.adcScore(
        dtab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], c))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (d, k) =>
        s"${ev.value} = graft.expressions.PqRuntime.adcScore($d, $k, $c);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  def pqDistTable(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqDistTable(ColumnBridge.expression(vec), codebooks))

  def pqAdcScore(dtab: Column, codes: Column, c: Int): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(dtab), ColumnBridge.expression(codes), c))
}
