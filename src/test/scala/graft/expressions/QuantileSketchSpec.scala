package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.Sketches

/** Gate for the bottom-k-by-hash quantile sketch ([[BottomKSample]] +
  * `Sketches.quantileSketch`, q154): sample determinism under
  * repartitioning, multiset semantics under (hash, value) collisions,
  * exactness when the group fits in the sketch, null contracts, the
  * binomial rank-error bound the scaladoc promises, and the
  * map-side-combine plan shape.
  */
class QuantileSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("sample = k smallest (hash, value) pairs, regardless of partitioning") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(400)((rng.nextInt(3).toString,
      rng.nextLong().abs % 1000, rng.nextDouble() * 100))
    // reference: hash each key exactly as the engine does, slice, sort by value
    val hashed = Seq(1, 7).map { parts =>
      rows.toDF("g", "id", "v").repartition(parts)
        .groupBy("g")
        .agg(BottomKSample.bottomKSample(
          Sketches.kmvHash(col("id")), col("v"), 16).as("s"))
        .as[(String, Seq[Double])].collect().toMap
        .view.mapValues(_.toSeq).toMap
    }
    // 1-partition and 7-partition runs (the latter forces real partial
    // merges) must agree bit-for-bit: the sample is a SET function
    assert(hashed(0) == hashed(1))
    assert(hashed(0).values.forall(s => s.size == 16 && s == s.sorted))
  }

  test("duplicate (hash, value) pairs keep multiplicity — the SQL rn<=k slice") {
    // same id twice => identical (hv, v) pairs; both must stay in the sample
    val rows = Seq(("a", 1L, 5.0), ("a", 1L, 5.0), ("a", 2L, 9.0))
    val got = rows.toDF("g", "id", "v").repartition(2)
      .groupBy("g")
      .agg(BottomKSample.bottomKSample(
        Sketches.kmvHash(col("id")), col("v"), 8).as("s"))
      .as[(String, Seq[Double])].collect().head._2
    assert(got == Seq(5.0, 5.0, 9.0))
  }

  test("buffer eviction at the boundary: exactly k survive, smallest hashes win") {
    val rows = (1L to 100L).map(i => ("g", i, i.toDouble))
    val expected = rows
      .map { case (_, i, v) =>
        // replicate kmvHash host-side via Spark, one batch
        (i, v)
      }
    val hv = rows.toDF("g", "id", "v")
      .select(col("id"), Sketches.kmvHash(col("id")).as("hv"), col("v"))
      .as[(Long, Long, Double)].collect()
    val want = hv.sortBy(r => (r._2, r._3)).take(10).map(_._3).sorted.toSeq
    val got = rows.toDF("g", "id", "v").repartition(5)
      .groupBy("g")
      .agg(BottomKSample.bottomKSample(
        Sketches.kmvHash(col("id")), col("v"), 10).as("s"))
      .as[(String, Seq[Double])].collect().head._2
    assert(got == want)
  }

  test("group that fits in k: quantileSketch estimates are EXACT nearest-rank-lower") {
    val vals = Seq(10.0, 20.0, 30.0, 40.0, 50.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "v")
    val got = Sketches.quantileSketch(df, Seq("g"), col("id"), "v",
      k = 64, qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      .orderBy("q")
      .select("q", "n_sample", "est")
      .as[(Double, Long, Double)].collect().toSeq
    // n=5: floor(q*4) picks index 0,1,2,3,4
    assert(got == Seq((0.0, 5L, 10.0), (0.25, 5L, 20.0), (0.5, 5L, 30.0),
      (0.9, 5L, 40.0), (1.0, 5L, 50.0)))
  }

  test("null values and null hash keys are excluded; all-null group vanishes") {
    val df = Seq(
      ("a", Some(1L), Some(1.0)), ("a", Some(2L), None),
      ("a", None, Some(99.0)), ("b", None, Some(5.0)))
      .toDF("g", "id", "v")
    val got = Sketches.quantileSketch(df, Seq("g"), col("id"), "v",
      k = 8, qs = Seq(0.5))
      .select("g", "n_sample", "est").as[(String, Long, Double)]
      .collect().toSeq
    // group a keeps only (1, 1.0); group b has no non-null key => no row,
    // and crucially no element_at failure (the r8 advisory fix)
    assert(got == Seq(("a", 1L, 1.0)))
  }

  test("interpolate = true is the percentile/quantile_cont convention when the group fits in k") {
    val vals = Seq(10.0, 20.0, 30.0, 40.0, 50.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "v")
    val qs = Seq(0.0, 0.125, 0.25, 0.5, 0.9, 1.0)
    val got = Sketches.quantileSketch(df, Seq("g"), col("id"), "v",
      k = 64, qs = qs, interpolate = true)
      .orderBy("q").select("q", "est").as[(Double, Double)].collect().toSeq
    // n=5, p=q*4: 0.125 -> 15 (halfway 10..20), 0.9 -> 46 (0.6 into 40..50);
    // integer positions and the endpoints are exact element picks
    assert(got == Seq((0.0, 10.0), (0.125, 15.0), (0.25, 20.0), (0.5, 30.0),
      (0.9, 46.0), (1.0, 50.0)))
    // the convention claim itself: equals Spark's exact percentile here
    val pc = df.agg(expr(
      "percentile(v, array(0.0D, 0.125D, 0.25D, 0.5D, 0.9D, 1.0D))"))
      .as[Seq[Double]].collect().head
    assert(got.map(_._2) == pc)
  }

  test("interpolated estimate always sits within the bracketing sample elements") {
    val n = 5000
    val rng = new scala.util.Random(11)
    val vals = Array.fill(n)(rng.nextDouble() * 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toSeq.toDF("g", "id", "v").repartition(8)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val plain = Sketches.quantileSketch(df, Seq("g"), col("id"), "v", 128, qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val interp = Sketches.quantileSketch(df, Seq("g"), col("id"), "v", 128, qs,
      interpolate = true)
      .select("q", "est").as[(Double, Double)].collect().toMap
    // nearest-rank-lower is the interpolation's lower bracket, so the
    // interpolated value can never fall below it — and the binomial
    // rank-error bound transfers (the bracketing elements are at most one
    // sample rank apart)
    qs.foreach { q =>
      assert(interp(q) >= plain(q), s"q=$q interp ${interp(q)} < lower ${plain(q)}")
    }
    val sorted = vals.sorted
    qs.foreach { q =>
      val trueRank = sorted.count(_ <= interp(q)).toDouble / n
      val bound = 4.0 * math.sqrt(q * (1 - q) / 128) + 1.0 / 128
      assert(math.abs(trueRank - q) <= bound,
        s"q=$q est=${interp(q)} trueRank=$trueRank bound=$bound")
    }
  }

  test("binomial rank-error bound: |trueRank(est) - q| <= 4*sqrt(q(1-q)/k)") {
    // 20k rows, known uniform distribution; k=256 sample. The estimate's
    // TRUE rank must sit within 4 binomial standard errors of q — the
    // O(sqrt(q(1-q)/k)) bound promised in the quantileSketch scaladoc.
    val n = 20000
    val rng = new scala.util.Random(42)
    val vals = Array.fill(n)(rng.nextDouble() * 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toSeq.toDF("g", "id", "v").repartition(8)
    val k = 256
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val est = Sketches.quantileSketch(df, Seq("g"), col("id"), "v", k, qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val e = est(q)
      val trueRank = sorted.count(_ <= e).toDouble / n
      val bound = 4.0 * math.sqrt(q * (1 - q) / k)
      assert(math.abs(trueRank - q) <= bound,
        s"q=$q est=$e trueRank=$trueRank bound=$bound")
    }
  }

  test("q154 plan: ONE exchange with map-side (partial) object aggregation") {
    val df = graft.SparkEntry.queries("q154_quantile_sketch")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    // AQE's toString prints Final + Initial sections; assert on the final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // TypedImperativeAggregate plans as ObjectHashAggregate; partial +
    // final layers around the single exchange = the sketch, not the rows,
    // crosses the wire
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"no map-side sketch combine in:\n$plan")
    // exactly one hash exchange (the sketch shuffle); the only other
    // exchange is the presentation orderBy's range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange in:\n$plan")
  }
}
