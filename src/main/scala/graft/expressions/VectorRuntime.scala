package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Shared evaluation kernels for the vector expressions — called from both
  * the interpreted path and generated code (static forwarders, see
  * [[GramHashRuntime]]). `isFloat` flags are resolved once at plan time from
  * the column types, so the per-row work is a branch-free primitive loop.
  */
object VectorRuntime {

  private def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val f = a.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    } else a.toDoubleArray()

  /** Mismatched vector dimensions are a caller bug (mixed embedding models,
    * wrong `dim`); silently truncating to the shorter length returns a
    * plausible-but-wrong similarity, so fail loudly instead.
    */
  private def requireSameDim(op: String, a: Int, b: Int): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"$op: vector dimension mismatch ($a vs $b)")

  /** Cosine similarity; 0.0 on zero norm. */
  def cosine(l: ArrayData, lFloat: Boolean, r: ArrayData, rFloat: Boolean): Double = {
    val a = toDoubles(l, lFloat)
    val b = toDoubles(r, rFloat)
    requireSameDim("cosine_similarity", a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Signed random-hyperplane bucket: bit p = sign of `v · planes(p)`. */
  def hyperplaneBucket(input: ArrayData, isFloat: Boolean,
      planes: Array[Array[Double]]): Long = {
    val v = toDoubles(input, isFloat)
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      requireSameDim("hyperplane_sign_bucket", v.length, plane.length)
      var d = 0.0
      var i = 0
      while (i < v.length) { d += v(i) * plane(i); i += 1 }
      if (d >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Symmetric int8 quantization: scale = max|v| / 127, code_i =
    * round-half-away-from-zero(v_i / scale) clamped to [-127, 127]; a zero
    * vector gets scale 0 and all-zero codes. Every step is IEEE double math
    * in a fixed order, so any SQL engine reproduces the codes bit-for-bit
    * (`Math.round` is applied to the ABSOLUTE value precisely because its
    * half-up tie break differs from SQL `round` for negatives).
    * Returns (scale DOUBLE, codes ARRAY<INT>).
    */
  def int8Quantize(input: ArrayData, isFloat: Boolean):
      org.apache.spark.sql.catalyst.InternalRow = {
    val v = toDoubles(input, isFloat)
    var maxAbs = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Any](v.length)
    i = 0
    while (i < v.length) {
      val c =
        if (scale == 0.0) 0L
        else {
          val r = Math.round(math.abs(v(i)) / scale)
          if (v(i) < 0) -r else r
        }
      codes(i) = Int.box(math.max(-127L, math.min(127L, c)).toInt)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      scale, new GenericArrayData(codes))
  }

  /** Indices of the `nProbe` nearest centroids by cosine, nearest-first. */
  def nearestCentroids(input: ArrayData, isFloat: Boolean,
      centroids: Array[Array[Double]], centroidNorms: Array[Double],
      nProbe: Int): ArrayData = {
    val v = toDoubles(input, isFloat)
    var vn2 = 0.0
    var i = 0
    while (i < v.length) { vn2 += v(i) * v(i); i += 1 }
    val vn = math.sqrt(vn2)
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      requireSameDim("nearest_centroids", v.length, cen.length)
      var d = 0.0; var j = 0
      while (j < v.length) { d += v(j) * cen(j); j += 1 }
      val denom = vn * centroidNorms(c)
      sims(c) = if (denom == 0.0) -2.0 else d / denom
      c += 1
    }
    val order = sims.indices.sortBy(i => (-sims(i), i)).take(nProbe)
    new GenericArrayData(order.map(Int.box).toArray[Any])
  }

  /** EXACT dot product of two long arrays holding scale-6 unscaled
    * decimal values, returned as decimal(38,12): per-element products are
    * full signed 128-bit (`Math.multiplyHigh` high word + wrapping low
    * word) accumulated with an unsigned low-word carry, so no precision
    * is lost at any magnitude the caller's bound admits — the SQ8
    * scoring hot loop (Sq8.topK guards |value| driver-side so the sum
    * stays under both 2^127 and decimal(38,12)'s 10^26). One primitive
    * loop + a single BigInteger materialization per call, vs the
    * interpreted per-element decimal lambda it replaced (measured ~10x
    * on the RecallBench 25x corpus).
    */
  def scaledDotDecimal(l: ArrayData, r: ArrayData)
      : org.apache.spark.sql.types.Decimal = {
    val n = l.numElements()
    requireSameDim("scaled_dot_product", n, r.numElements())
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      // getLong on a null slot reads undefined element storage — a
      // silently-garbage score. The SQ8 pipelines never produce null
      // elements, but the Column API is public; fail loudly like the
      // dim-mismatch guard (the type check can't require
      // containsNull=false — dequant255's output is marked nullable)
      if (l.isNullAt(i) || r.isNullAt(i))
        throw new IllegalArgumentException(
          s"scaled_dot_product: null element at index $i — " +
            "both arrays must be fully non-null")
      val x = l.getLong(i)
      val y = r.getLong(i)
      val ph = Math.multiplyHigh(x, y)
      val pl = x * y
      val nl = lo + pl
      // unsigned carry out of the low word (Hacker's Delight 2-13)
      val carry = ((lo & pl) | ((lo | pl) & ~nl)) >>> 63
      hi += ph + carry
      lo = nl
      i += 1
    }
    val bytes = new Array[Byte](16)
    var j = 0
    while (j < 8) {
      bytes(j) = (hi >>> (56 - 8 * j)).toByte
      bytes(j + 8) = (lo >>> (56 - 8 * j)).toByte
      j += 1
    }
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(new java.math.BigInteger(bytes), 12), 38, 12)
  }
}
