package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Reference example `R/utils.R:23`: LETTERS with an NA; A/B recoded,
  // everything else (and null) passes through.
  test("recoder: mapped values replaced, unseen and null pass through") {
    val letters = ('A' to 'Z').map(_.toString)
    val in = letters.updated(5, null: String).toDF("x")
    val out = in.select(Ops.recode(col("x"), Seq("A", "B"), Seq("a.123", "b.123")).as("x"))
      .as[String].collect()
    assert(out(0) == "a.123" && out(1) == "b.123")
    assert(out(2) == "C" && out(25) == "Z")
    assert(out(5) == null)
  }

  test("recoder: empty mapping is identity") {
    val in = Seq("p", "q").toDF("x")
    val out = in.select(Ops.recode(col("x"), Nil, Nil).as("x")).as[String].collect()
    assert(out.toSeq == Seq("p", "q"))
  }

  test("recoder property: equals scala-map semantics on random data") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val vals = Seq.fill(50)(rng.nextInt(20).toString)
      val from = Seq.fill(5)(rng.nextInt(20).toString).distinct
      val to = from.map(_ + "_r")
      val m = from.zip(to).toMap
      val expected = vals.map(v => m.getOrElse(v, v))
      val got = vals.toDF("x").select(Ops.recode(col("x"), from, to).as("x"))
        .as[String].collect().toSeq
      assert(got == expected)
    }
  }

  // Type-generic recoder (reference `R/utils.R:24-32` works on any vector).
  test("recoder: integer columns recode with identity extension") {
    val in = Seq(1, 2, 3, 7).toDF("x")
    val out = in.select(Ops.recode(col("x"), Seq(1, 2), Seq(101, 102)).as("x"))
      .as[Int].collect().toSeq
    assert(out == Seq(101, 102, 3, 7))
  }

  test("recoder: double columns recode, null passes through") {
    val in = Seq[Option[Double]](Some(1.5), Some(2.5), None).toDF("x")
    val out = in.select(Ops.recode(col("x"), Seq(1.5), Seq(-1.5)).as("x"))
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(-1.5), Some(2.5), None))
  }

  test("factorLevelsFirstSeen orders by first occurrence (R/ffsql.R:311-316)") {
    val df = Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, null: String))
      .toDF("ord", "s")
    assert(Ops.factorLevelsFirstSeen(df, "s", "ord") == Seq("b", "a", "c"))
    intercept[IllegalArgumentException] {
      Ops.factorLevelsFirstSeen(df, "s", "ord", maxLevels = 2)
    }
  }

  test("factorLevels fails fast over maxLevels cardinality") {
    val big = (1 to 50).map(_.toString).toDF("s")
    val err = intercept[IllegalArgumentException] {
      Ops.factorLevels(big, "s", maxLevels = 10)
    }
    assert(err.getMessage.contains("distinct values"))
    // at exactly maxLevels it succeeds
    assert(Ops.factorLevels(big, "s", maxLevels = 50).length == 50)
  }

  // Reference example `R/utils.R:68-70`.
  test("renameColumns renames and validates lengths") {
    val df = Seq((1, "A")).toDF("x", "y")
    val out = Ops.renameColumns(df, Seq("x", "y"), Seq("digits", "letters"))
    assert(out.columns.toSeq == Seq("digits", "letters"))
    intercept[IllegalArgumentException] {
      Ops.renameColumns(df, Seq("x"), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Ops.renameColumns(df, Seq("zz"), Seq("a"))
    }
  }

  test("factorise attaches sorted levels as metadata; levelRank orders") {
    val df = Seq("b", "a", "c", "a", null).toDF("s")
    val f = Ops.factorise(df, cols = Seq("s"), ordered = true)
    assert(Ops.levelsOf(f, "s").contains(Seq("a", "b", "c")))
    assert(f.schema("s").metadata.getBoolean("graft.factor.ordered"))
    val ranks = f.select(Ops.levelRank(col("s"), Seq("a", "b", "c")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(ranks == Seq(2L, 1L, 3L, 1L, -1L))
  }

  test("factorise levels override mirrors the readers' `levels` argument") {
    val df = Seq("x", "y").toDF("s")
    val f = Ops.factorise(df, cols = Seq("s"),
      levelsOverride = Map("s" -> Seq("y", "x", "z")))
    assert(Ops.levelsOf(f, "s").contains(Seq("y", "x", "z")))
  }

  test("factorise default targets all string (and optionally boolean) cols") {
    val df = Seq((1, "a", true)).toDF("i", "s", "b")
    val f1 = Ops.factorise(df)
    assert(Ops.levelsOf(f1, "s").isDefined && Ops.levelsOf(f1, "i").isEmpty)
    val f2 = Ops.factorise(df, logicals = true)
    assert(Ops.levelsOf(f2, "b").isDefined)
  }
}
