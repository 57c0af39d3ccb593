package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

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
    * null; elements are non-null by the caller's filter contract.
    */
  case class EwmaHalfScan(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "ewma_half_scan"

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
    val x = xs.toDoubleArray()
    val s = new Array[Double](x.length)
    var i = 0
    while (i < x.length) {
      s(i) = if (i == 0) x(0) else (x(i) + s(i - 1)) / 2
      i += 1
    }
    new GenericArrayData(s)
  }
}
