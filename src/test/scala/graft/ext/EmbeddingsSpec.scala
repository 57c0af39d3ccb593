package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EmbeddingsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("covarianceReport matches a driver-side reference on quantized coords") {
    val rnd = new scala.util.Random(43)
    val dim = 5
    val rows = (1L to 40L).map(i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Embeddings.covarianceReport(df, "embedding", dim)
      .orderBy("i", "j")
      .select("i", "j", "n", "cov")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(out.size == dim * (dim + 1) / 2)
    // reference over the SAME 6-dp quantization, exact BigDecimal sums
    def q(x: Float) = BigDecimal(x.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val m = rows.map(_._2.map(q))
    val n = rows.size
    for ((i, j, nn, cov) <- out) {
      assert(nn == n)
      val sx = m.map(_(i)).sum
      val sy = m.map(_(j)).sum
      val sxy = m.map(v => v(i) * v(j)).sum
      val expected = BigDecimal(
        (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) / (n.toDouble * n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cov == expected, s"($i,$j): $cov vs $expected")
    }
    // diagonal entries are variances: non-negative
    assert(out.filter(r => r._1 == r._2).forall(_._4 >= 0.0))
  }

  test("topComponent recovers known dominant directions; zero matrix fails loudly") {
    // diagonal matrix, dim 2 dominant: loading -> e_2 (max-normalized)
    val diag = Seq((0, 0, 5.0), (1, 1, 2.0), (2, 2, 9.0), (0, 1, 0.0),
      (0, 2, 0.0), (1, 2, 0.0)).toDF("i", "j", "cov")
    val d = Embeddings.topComponent(diag, dim = 3, iters = 5)
      .orderBy("i").as[(Int, Double)].collect().map(_._2)
    assert(d(2) == 1.0 && math.abs(d(0)) < 0.1 && math.abs(d(1)) < 0.15,
      d.toSeq.toString)
    // rank-1 matrix u*u^T with u = (1, 2, -2): one round suffices; the
    // max-normalized loading is u / max|u| = (0.5, 1, -1) exactly
    val u = Seq(1.0, 2.0, -2.0)
    val r1 = (for (i <- 0 until 3; j <- i until 3)
      yield (i, j, u(i) * u(j))).toDF("i", "j", "cov")
    val l = Embeddings.topComponent(r1, dim = 3, iters = 3)
      .orderBy("i").as[(Int, Double)].collect().map(_._2).toSeq
    assert(l == Seq(0.5, 1.0, -1.0), l.toString)
    // all-zero covariance has no direction: loud failure
    val z = Seq((0, 0, 0.0), (0, 1, 0.0), (1, 1, 0.0)).toDF("i", "j", "cov")
    val e = intercept[IllegalArgumentException] {
      Embeddings.topComponent(z, dim = 2)
    }
    assert(e.getMessage.contains("zero covariance"))
  }

  test("projectOnto: exact decimal dot product with quantized coordinates") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, -1.0f)),
      (2L, Seq(0.5f, 0.25f, 4.0f))).toDF("vec_id", "embedding")
    val out = Embeddings.projectOnto(df, "vec_id", "embedding",
        Seq(0.5, 1.0, -1.0))
      .orderBy("vec_id").as[(Long, Double)].collect().toSeq
    // doc1: 1*0.5 + 2*1 + (-1)*(-1) = 3.5; doc2: 0.25 + 0.25 - 4 = -3.5
    assert(out == Seq((1L, 3.5), (2L, -3.5)), out.toString)
    // a 64-term sum must NOT lose scale to decimal-precision clamping:
    // 64 equal terms of 0.000001 * 1.0 sum to exactly 0.000064
    val wide = Seq((1L, Seq.fill(64)(0.000001f))).toDF("vec_id", "embedding")
    val p = Embeddings.projectOnto(wide, "vec_id", "embedding",
        Seq.fill(64)(1.0))
      .as[(Long, Double)].head()._2
    assert(p == 0.000064, s"scale lost in the wide sum: $p")
  }

  test("null vectors are excluded; a wrong-length vector fails loudly") {
    val ok = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None),
      (3L, Some(Seq(0.5f, -1.0f)))).toDF("vec_id", "embedding")
    val n = Embeddings.covarianceReport(ok, "embedding", 2)
      .select("n").distinct().as[Long].head()
    assert(n == 2, "null vec must not count")
    val mixed = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Embeddings.covarianceReport(mixed, "embedding", 2).collect()
    }
    assert(e.getMessage.contains("length != 2"))
  }

  test("projectOnto fails loudly on a wrong-length vector, excludes nulls quietly") {
    val ok = Seq((1L, Seq(0.5f, 0.25f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    // the null vector is excluded without tripping the row-path guard
    val out = Embeddings.projectOnto(ok, "vec_id", "embedding", Seq(1.0, 2.0))
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0)))
    val mixed = Seq((1L, Seq(0.5f, 0.25f)), (3L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    // raise_error surfaces as USER_RAISED_EXCEPTION (the concrete class
    // is not accessible from test scope; the message is the contract)
    val e = intercept[Exception] {
      Embeddings.projectOnto(mixed, "vec_id", "embedding", Seq(1.0, 2.0)).collect()
    }
    assert(e.getMessage.contains("mixed embedding models"))
  }

  test("GramMoments buffer merges are partition-order free; nulls fail loudly") {
    import graft.expressions.GramMoments
    import org.apache.spark.sql.functions.{col, transform}
    val rows = (1 to 97).map(i =>
      Seq(BigDecimal(i) / 100, BigDecimal(-i * 3) / 100, BigDecimal(7 - i) / 50))
    def moments(parts: Int) = rows.toDF("v")
      .repartition(parts)
      .select(transform(col("v"), x => x.cast("decimal(18,6)")).as("v"))
      .agg(GramMoments.gramMoments(col("v"), 3).as("m"))
      .select(col("m.n"), col("m.sx"), col("m.sxy"))
      .as[(Long, Seq[BigDecimal], Seq[BigDecimal])].collect().head
    val one = moments(1)
    // cross-partition merge (and its serde round trip) must be exact:
    // decimal sums are order-free, so any partitioning yields ONE answer
    assert(moments(7) == one && moments(32) == one)
    assert(one._1 == 97L && one._2.length == 3 && one._3.length == 6)
    // reference: driver-side exact sums
    val xs = rows.map(_.map(_.setScale(6)))
    assert(one._2 == (0 until 3).map(i => xs.map(_(i)).sum.setScale(6)))
    val expSxy = for (i <- 0 until 3; j <- i until 3)
      yield xs.map(r => r(i) * r(j)).sum.setScale(12)
    assert(one._3 == expSxy)
    // a null coordinate must fail, not silently bias the moments
    val withNull = Seq(Seq[String]("1.0", null))
      .toDF("v").select(col("v").cast("array<decimal(18,6)>").as("v"))
    val e = intercept[org.apache.spark.SparkException] {
      withNull.agg(GramMoments.gramMoments(col("v"), 2)).collect()
    }
    assert(e.getMessage.contains("null coordinate"))
  }
}
