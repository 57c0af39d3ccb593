package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class NaLocfPlusOneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(xs: Seq[Option[Double]], partitions: Int): Seq[Option[Double]] = {
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ord", "x")
    NaLocfPlusOne(df, "ord", "x", "filled", partitions)
      .orderBy("ord").select("filled")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  /** Driver-side re-implementation of the reference semantics
    * (`R/utils.R:50-51`), leading nulls left as null.
    */
  private def oracle(xs: Seq[Option[Double]]): Seq[Option[Double]] = {
    var last: Option[Double] = None
    var run = 0L
    xs.map {
      case Some(v) => last = Some(v); run = 0; Some(v)
      case None =>
        run += 1
        last.map(_ + run)
    }
  }

  // Reference docstring example `R/utils.R:46-48`.
  test("reference example: 2,NA,NA,4,5,2,NA -> 2,3,4,4,5,2,3") {
    val in = Seq(Some(2d), None, None, Some(4d), Some(5d), Some(2d), None)
    for (p <- Seq(1, 3, 7)) { // result invariant to partition count
      assert(run(in, p) == Seq(2d, 3d, 4d, 4d, 5d, 2d, 3d).map(Some(_)), s"p=$p")
    }
  }

  test("leading nulls remain null (documented divergence from the reference error)") {
    val in = Seq(None, None, Some(1d), None)
    assert(run(in, 2) == Seq(None, None, Some(1d), Some(2d)))
  }

  test("strict=true raises on a leading null (reference parity, r16 verdict #7)") {
    val leading = Seq((0L, None: Option[Double]), (1L, Some(1d)))
      .toDF("ord", "x")
    val ex = intercept[org.apache.spark.SparkException] {
      NaLocfPlusOne(leading, "ord", "x", "filled", partitions = 2,
        strict = true).collect()
    }
    assert(ex.getMessage.contains("leading null") ||
      Option(ex.getCause).exists(_.getMessage.contains("leading null")))
    // interior nulls are untouched by strict — same values as default
    val interior = Seq((0L, Some(2d)), (1L, None), (2L, Some(4d)))
      .toDF("ord", "x")
    val got = NaLocfPlusOne(interior, "ord", "x", "filled", partitions = 2,
        strict = true)
      .orderBy("ord").select("filled").as[Double].collect().toSeq
    assert(got == Seq(2d, 3d, 4d))
    // byGroup: the group WITH a leading null raises, one without passes
    val g = Seq((1L, 0L, None: Option[Double]), (1L, 1L, Some(1d)),
      (2L, 0L, Some(5d)), (2L, 1L, None)).toDF("g", "ord", "x")
    intercept[Exception] {
      NaLocfPlusOne.byGroup(g, Seq("g"), "ord", "x", strict = true).collect()
    }
    val clean = NaLocfPlusOne.byGroup(g.where($"g" === 2L), Seq("g"), "ord",
        "x", strict = true)
      .orderBy("ord").select("filled").as[Double].collect().toSeq
    assert(clean == Seq(5d, 6d))
  }

  test("null-free input is identity") {
    val in = Seq(1d, 2d, 3d, 4d).map(Some(_))
    assert(run(in, 2) == in)
  }

  test("all-null input stays all null") {
    assert(run(Seq(None, None, None), 2) == Seq(None, None, None))
  }

  test("byGroup: per-group LOCF+1 matches the per-sequence oracle") {
    val rng = new scala.util.Random(23)
    val rows = for {
      g <- 0 until 5
      i <- 0 until 30
    } yield (g.toLong, i.toLong,
      if (rng.nextBoolean()) Some(rng.nextInt(50).toDouble) else None)
    val df = rows.toDF("g", "ord", "x")
    val got = NaLocfPlusOne.byGroup(df, Seq("g"), "ord", "x")
      .orderBy("g", "ord").select("g", "filled")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val expected = rows.groupBy(_._1).view.mapValues(grp =>
      oracle(grp.sortBy(_._2).map(_._3))).toMap
    got.groupBy(_._1).foreach { case (g, vs) =>
      assert(vs.map(_._2).toSeq == expected(g), s"group $g")
    }
  }

  test("null runs spanning partition boundaries carry correctly (property)") {
    val rng = new scala.util.Random(5)
    for (trial <- 1 to 5) {
      val xs = Seq.fill(60)(if (rng.nextBoolean()) Some(rng.nextInt(50).toDouble) else None)
      val exp = oracle(xs)
      for (p <- Seq(1, 4, 9)) {
        assert(run(xs, p) == exp, s"trial=$trial p=$p")
      }
    }
  }

  test("interpolateByGroup: linear between neighbors, edge fills, all-null stays null") {
    import spark.implicits._
    val d = Seq(
      // group a: 10 at ord 0, 40 at ord 3 -> 20, 30 between; trailing LOCF
      ("a", 0L, Some(10.0)), ("a", 1L, None), ("a", 2L, None),
      ("a", 3L, Some(40.0)), ("a", 4L, None),
      // group b: leading null backfills; uneven spacing interpolates by ord
      ("b", 0L, None), ("b", 1L, Some(6.0)), ("b", 4L, Some(12.0)),
      ("b", 2L, None),
      // group c: all null
      ("c", 0L, None), ("c", 1L, None)
    ).map { case (g, o, v) => (g, o, v.map(Double.box).orNull.asInstanceOf[java.lang.Double]) }
      .toDF("g", "o", "v")
    val out = NaLocfPlusOne.interpolateByGroup(d, Seq("g"), "o", "v")
      .orderBy("g", "o")
      .select($"g", $"o", $"filled").as[(String, Long, Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      ("a", 0L, Some(10.0)), ("a", 1L, Some(20.0)), ("a", 2L, Some(30.0)),
      ("a", 3L, Some(40.0)), ("a", 4L, Some(40.0)),
      ("b", 0L, Some(6.0)), ("b", 1L, Some(6.0)), ("b", 2L, Some(8.0)),
      ("b", 4L, Some(12.0)),
      ("c", 0L, None), ("c", 1L, None)))
  }
}
