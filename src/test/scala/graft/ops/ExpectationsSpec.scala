package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Expectations.Rule

class ExpectationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, Some(10.0), "click"),   // clean
    (2L, Some(500.0), "click"),  // value rule fails
    (3L, Some(5.0), "weird"),    // type rule fails
    (4L, None: Option[Double], "weird") // NULL value -> value rule fails too
  ).toDF("id", "value", "typ")

  private val rules = Seq(
    Rule("value_ok", col("value") <= 300),
    Rule("type_ok", col("typ").isin("click", "view")))

  test("check tags each row with its failed rules, in rule order; NULL predicate = violation") {
    val out = Expectations.check(rows, rules)
      .select(col("id"), concat_ws(",", col("violations")).as("v"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, ""), (2L, "value_ok"), (3L, "type_ok"), (4L, "value_ok,type_ok")))
  }

  test("split routes clean rows onward (no extra column) and quarantines the rest with reasons") {
    val (pass, quarantine) = Expectations.split(rows, rules)
    assert(pass.columns.toSeq == Seq("id", "value", "typ"))
    assert(pass.select("id").as[Long].collect().toSeq == Seq(1L))
    val q = quarantine.select(col("id"), size(col("violations")).as("n"))
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(q == Seq((2L, 1), (3L, 1), (4L, 2)))
  }

  test("duplicate rule names and empty rule sets fail fast") {
    intercept[IllegalArgumentException] {
      Expectations.check(rows, Seq(Rule("a", lit(true)), Rule("a", lit(false))))
    }
    intercept[IllegalArgumentException] { Expectations.check(rows, Nil) }
  }

  test("evaluation is one row-local projection — no shuffle in the plan") {
    val plan = Expectations.check(rows, rules).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expectations check shuffled:\n$plan")
  }
}
