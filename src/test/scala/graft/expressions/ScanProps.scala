package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Prop, Properties}

/** Pure ScalaCheck properties for the O(n) EWMA prefix-scan kernel — the
  * native replacement for the O(n^2) `aggregate`+`concat` fold (ADVICE
  * r11). The contract is BIT-identity with the documented recursion
  * `s_1 = x_1; s_t = (x_t + s_(t-1)) / 2`, element for element.
  */
object ScanProps extends Properties("ScanRuntime") {

  private def kernel(xs: Seq[Double]): Seq[Double] =
    ScanRuntime.ewmaHalf(new GenericArrayData(xs.toArray))
      .asInstanceOf[ArrayData].toDoubleArray().toSeq

  /** The reference recursion, exactly as documented. */
  private def reference(xs: Seq[Double]): Seq[Double] =
    xs.headOption.fold(Seq.empty[Double]) { h =>
      xs.tail.scanLeft(h)((s, x) => (x + s) / 2)
    }

  private val series: Gen[List[Double]] = Gen.listOf(Gen.oneOf(
    Gen.choose(-1e6, 1e6),
    Gen.choose(-1e-6, 1e-6),
    Gen.oneOf(0.0, -0.0, 1.0, 1e300, -1e300, Double.MinPositiveValue)))

  property("bit-identical to the documented recursion") =
    Prop.forAll(series) { xs =>
      val (k, r) = (kernel(xs), reference(xs))
      k.length == r.length &&
        k.zip(r).forall { case (a, b) =>
          java.lang.Double.doubleToRawLongBits(a) ==
            java.lang.Double.doubleToRawLongBits(b)
        }
    }

  property("length preserved; first element is x_1") =
    Prop.forAll(series) { xs =>
      val k = kernel(xs)
      k.length == xs.length && (xs.isEmpty || k.head == xs.head)
    }

  property("constant series is a fixed point") =
    Prop.forAll(Gen.choose(-1e6, 1e6), Gen.choose(0, 50)) { (c, n) =>
      kernel(Seq.fill(n)(c)).forall(_ == c)
    }
}
