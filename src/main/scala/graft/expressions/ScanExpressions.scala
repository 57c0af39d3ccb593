package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Prefix-scan kernels over a per-group `array<double>` series — the
  * recursions SQL higher-order functions cannot express in O(n): an
  * `aggregate` fold that must EMIT every intermediate state has no
  * mutable accumulator, so the `concat(acc, array(...))` formulation
  * copies the whole prefix per element — O(n^2) time and allocations per
  * group (ADVICE r11 on `Profile.ewmaHalf`). These run the identical
  * IEEE recursion as one tight primitive loop: same operations in the
  * same order, bit-identical output, O(n).
  */
object ScanExpressions {

  /** EWMA prefix scan with alpha fixed at 1/2: `s_1 = x_1;
    * s_t = (x_t + s_(t-1)) / 2`. Halving a double is an exponent shift
    * (exact), so the only rounding is the single IEEE addition per step —
    * the scan replays bit-for-bit in any engine that runs the same
    * recursion (see [[graft.ops.Profile.ewmaHalf]]). Null input array →
    * null. Input is type-checked at analysis time (the sibling-expression
    * convention — an `array<int>` is REJECTED with a clear error instead
    * of being read through the wrong element width); a NULL element has
    * no defined recursion state and fails loudly rather than fabricating
    * a value.
    */
  case class EwmaHalfScan(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "ewma_half_scan"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE>, got ${other.simpleString} — " +
          "cast the elements explicitly")
    }

    override def nullSafeEval(input: Any): Any =
      ScanRuntime.ewmaHalf(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.ScanRuntime.ewmaHalf($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def ewmaHalfScan(xs: Column): Column =
    ColumnBridge.column(EwmaHalfScan(ColumnBridge.expression(xs)))
}

/** Evaluation kernels shared by the interpreted and generated paths. */
object ScanRuntime {
  def ewmaHalf(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val s = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) throw new IllegalArgumentException(
        s"ewma_half_scan: null element at index $i — the recursion has no " +
          "defined state for a missing point; filter nulls upstream")
      val x = xs.getDouble(i)
      s(i) = if (i == 0) x else (x + s(i - 1)) / 2
      i += 1
    }
    new GenericArrayData(s)
  }
}
