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

  test("orphans reports child keys missing from the parent, with row counts; NULL key = orphan") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"))
      .toDF("fk", "payload")
      .union(Seq((None: Option[Long], "e")).toDF("fk", "payload"))
    val parent = Seq((1L, "one"), (3L, "three")).toDF("pk", "name")
    val out = Expectations.orphans(child, parent, Seq("fk" -> "pk"))
      .orderBy(asc_nulls_first("fk"))
      .as[(Option[Long], Long)].collect().toSeq
    assert(out == Seq((None, 1L), (Some(2L), 1L), (Some(9L), 1L)))
  }

  test("orphans on a composite key matches only full-tuple equality") {
    val child = Seq((1L, "x", 10), (1L, "y", 20), (2L, "x", 30))
      .toDF("k1", "k2", "v")
    val parent = Seq((1L, "x"), (2L, "y")).toDF("p1", "p2")
    val out = Expectations.orphans(child, parent,
        Seq("k1" -> "p1", "k2" -> "p2"))
      .orderBy("k1", "k2").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "y", 1L), (2L, "x", 1L)))
  }

  test("duplicateKeys lists violating tuples with multiplicities; a true key yields nothing") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (1L, "a"))
      .toDF("k", "s")
    val dups = Expectations.duplicateKeys(df, Seq("k", "s"))
      .as[(Long, String, Long)].collect().toSeq
    assert(dups == Seq((1L, "a", 3L)))
    assert(Expectations.duplicateKeys(df.distinct(), Seq("k", "s")).isEmpty)
    intercept[IllegalArgumentException] { Expectations.duplicateKeys(df, Nil) }
  }

  test("kAnonymityAudit flags only combos below k") {
    val d = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(1)(("DE", "A"))).toDF("country", "seg")
    val out = Expectations.kAnonymityAudit(d, Seq("country", "seg"), k = 3)
      .orderBy("country", "seg")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("DE", "A", 1L), ("US", "B", 2L)))
    assert(Expectations.kAnonymityAudit(d, Seq("country", "seg"), k = 2)
      .count() == 1)
  }

  test("lDiversityAudit flags groups whose sensitive column lacks l distinct values") {
    // US: sensitive {x, x, y} -> 2 distinct; DE: {x, y, z} -> 3 distinct
    val d = Seq(("US", "x"), ("US", "x"), ("US", "y"),
      ("DE", "x"), ("DE", "y"), ("DE", "z")).toDF("country", "diag")
    val out = Expectations.lDiversityAudit(d, Seq("country"), "diag", l = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("US", 3L, 2L)))
    assert(Expectations.lDiversityAudit(d, Seq("country"), "diag", l = 2).isEmpty)
  }

  test("signalAgreement: one pass, exact confusion counts per signal pair") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Seq((1, true, true), (2, true, false), (3, false, true),
      (4, false, false), (5, true, true)).toDF("id", "a", "b")
    val out = Expectations.signalAgreement(d,
        Seq("sa" -> col("a"), "sb" -> col("b"), "always" -> lit(true)))
      .orderBy("signal_a", "signal_b")
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq
    // (sa, sb): both {1,5}, only-a {2}, only-b {3}, neither {4} -> 3/5
    assert(out.find(r => r._1 == "sa" && r._2 == "sb").get ==
      (("sa", "sb", 2L, 1L, 1L, 1L, 0.6)))
    // (sa, always): agreement = share of sa-true rows
    assert(out.find(r => r._1 == "sa" && r._2 == "always").get ==
      (("sa", "always", 3L, 0L, 2L, 0L, 0.6)))
    assert(out.size == 3)
    intercept[IllegalArgumentException] {
      Expectations.signalAgreement(d, Seq("only" -> col("a")))
    }
  }

  test("fdViolations: majority/minority accounting; clean FDs report nothing") {
    val d = Seq((1L, "A"), (1L, "A"), (1L, "B"),
      (2L, "C"), (2L, "C"),
      (3L, "D"), (3L, "E")).toDF("k", "v")
    val out = Expectations.fdViolations(d, Seq("k"), "v")
      .orderBy("k")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    // k=1: 3 rows, 2 rhs, majority A (2 rows) -> 1 minority row;
    // k=3: tie D/E (1 each) -> majority D by value order, 1 minority
    assert(out == Seq((1L, 3L, 2L, "A", 1L), (3L, 2L, 2L, "D", 1L)))
    val clean = Seq((1L, "A"), (2L, "B")).toDF("k", "v")
    assert(Expectations.fdViolations(clean, Seq("k"), "v").isEmpty)
  }
}
