package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native expressions implement `doGenCode` (static-call kernels) so
  * projections using them stay inside whole-stage codegen. These tests run
  * with codegen fallback DISABLED: if the generated Java failed to compile,
  * the queries here would throw instead of silently degrading to the
  * interpreted path.
  */
class CodegenSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def withStrictCodegen[T](f: => T): T = {
    val old = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally old match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("gram-hash expressions compile under strict whole-stage codegen") {
    withStrictCodegen {
      val df = Seq((1L, "the quick brown fox jumps 42 times"), (2L, "")).toDF("id", "t")
      val out = df.select(
        size(GramHashExpressions.charNgramHashSet(col("t"), 5)).as("ng"),
        size(GramHashExpressions.wordShingleHashSet(col("t"), 3)).as("ws"),
        GramHashExpressions.simhash64(col("t")).as("sh")).collect()
      assert(out.length == 2)
      assert(out(0).getInt(0) > 0 && out(0).getInt(1) > 0)
    }
  }

  test("char-class stats compile under strict whole-stage codegen") {
    withStrictCodegen {
      val df = Seq("The quick brown fox, 42 times!", "", " \t ",
        "hello 世界 world").toDF("t")
      val out = df.select(GramHashExpressions.charClassStats(col("t")).as("s"))
        .select(col("s.n_tokens"), col("s.n_punct"), col("s.n_digit"),
          col("s.n_upper"), col("s.n_subwords"), col("s.n_unspaced"),
          col("s.n_seg_tokens")).collect()
      assert(out(0).getInt(0) == 6 && out(0).getInt(1) == 2)
      assert(out(0).getInt(2) == 2 && out(0).getInt(3) == 1)
      assert(out(0).getInt(5) == 0 && out(0).getInt(6) == 6)
      assert(out(1).toSeq == Seq(0, 0, 0, 0, 0, 0, 0))
      assert(out(2).toSeq == Seq(0, 0, 0, 0, 0, 0, 0))
      assert(out(3).getInt(5) == 2 && out(3).getInt(6) == 4)
    }
  }

  test("vector expressions compile under strict whole-stage codegen") {
    withStrictCodegen {
      val planes = Array.fill(8)(Array.fill(4)(0.5))
      val df = Seq((Seq(1f, 2f, 3f, 4f), Seq(4f, 3f, 2f, 1f))).toDF("a", "b")
      val out = df.select(
        VectorExpressions.cosineSimilarity(col("a"), col("b")).as("c"),
        VectorExpressions.hyperplaneSignBucket(col("a"), planes).as("h"),
        VectorExpressions.nearestCentroids(col("a"),
          Array(Array(1.0, 2.0, 3.0, 4.0), Array(-1.0, -2.0, -3.0, -4.0)), 1).as("nc"))
        .collect()
      assert(out.length == 1)
      assert(out.head.getDouble(0) > 0.6)
      assert(out.head.getSeq[Int](2) == Seq(0))
    }
  }

  test("int8 quantization: exact codes under strict codegen, zero-vector safe") {
    withStrictCodegen {
      val df = Seq(
        (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
        (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
      ).toDF("id", "v")
      val out = df.select(col("id"),
        VectorExpressions.int8Quantize(col("v")).as("q"))
        .select(col("id"), col("q.scale"), col("q.codes"))
        .orderBy("id").collect()
      // scale = 1.0/127; codes = round(v * 127 / max|v|), half away from zero
      assert(out(0).getDouble(1) == 1.0 / 127.0)
      assert(out(0).getSeq[Int](2) == Seq(127, -64, 32, 0),
        s"got ${out(0).getSeq[Int](2)}")
      assert(out(1).getDouble(1) == 0.0)
      assert(out(1).getSeq[Int](2) == Seq(0, 0, 0, 0))
    }
  }

  test("minhash signature expression equals the explode + xxhash64 formulation") {
    // the one-pass expression claims bit-identical signatures to
    // min(xxhash64(lit(i), gram)) per permutation — prove it on real text
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs and more words here"))
      .toDF("id", "t")
    val sets = docs.select(col("id"),
      GramHashExpressions.wordShingleHashSet(col("t"), 3).as("sh"))
    val fast = sets.select(col("id"),
      GramHashExpressions.minhashSignature(col("sh"), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val slow = {
      val ex = sets.select(col("id"), explode(col("sh")).as("gh"))
      val aggs = (0 until 16).map(i => min(xxhash64(lit(i), col("gh"))).as(s"s$i"))
      ex.groupBy("id").agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap
    }
    assert(fast == slow)
  }

  test("projection over native expressions plans inside WholeStageCodegen") {
    // range source so the projection cannot constant-fold away; with the old
    // CodegenFallback mixin this Project is EXCLUDED from codegen entirely
    val df = spark.range(10)
      .select(GramHashExpressions.simhash64(
        concat(lit("doc "), col("id").cast("string"))).as("sh"))
    val inCodegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty,
      s"expected a WholeStageCodegen stage in:\n${df.queryExecution.executedPlan}")
    assert(df.distinct().count() == 10)
  }
}
