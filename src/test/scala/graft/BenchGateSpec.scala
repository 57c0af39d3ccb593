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
  * real r07–r09 artifacts, PINNED under `src/test/resources/benchgate/`
  * — the round-10 verdict found the previous repo-root glob broke the
  * moment the driver wrote its next `BENCH_r*.json` (the newest-three
  * window shifted and the q36 floor moved), i.e. the fixture was mutable
  * driver state. Resources are immutable; the suite is green no matter
  * what the driver writes next round.
  */
class BenchGateSpec extends AnyFunSuite {

  private def resourceArtifact(name: String): String = {
    val in = getClass.getResourceAsStream(s"/benchgate/$name")
    assert(in != null, s"pinned fixture /benchgate/$name missing")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Materialize the pinned artifacts into a temp dir shaped like the repo
    * root, so `Bench.priorTimes(dir)` sees exactly the r07–r09 window.
    */
  private def withPinnedDir[A](names: Seq[String])(body: File => A): A = {
    val dir = Files.createTempDirectory("benchgate").toFile
    try {
      names.foreach { n =>
        Files.write(new File(dir, n).toPath,
          resourceArtifact(n).getBytes("UTF-8"))
      }
      body(dir)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("parseQueries reads the escaped tail shape of a real artifact") {
    val txt = resourceArtifact("BENCH_r09.json")
    val qs = Bench.parseQueries(txt)
    assert(qs.nonEmpty, "parser must match the escaped \\\"queries\\\":{ form")
    assert(qs("q36") == 8.40)
    assert(qs("q12") == 0.23)
    assert(qs.size >= 150)
  }

  test("parseQueries reads the pretty-printed parsed shape") {
    // r08's parsed block is non-null and pretty-printed ("queries": {
    // with a space + newlines); strip the tail so only that shape remains.
    val txt = resourceArtifact("BENCH_r08.json")
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

  test("priorTimes floors q36 at 1.12 across the pinned three artifacts") {
    // r07 parsed: q36=1.12; r08: 3.12; r09 (tail only): 8.40 — the min
    // matters because a single prior artifact can itself be contaminated.
    withPinnedDir(Seq("BENCH_r07.json", "BENCH_r08.json", "BENCH_r09.json")) { dir =>
      val prior = Bench.priorTimes(dir)
      assert(prior("q36") == 1.12)
    }
  }

  test("a synthetic inflated query is actually flagged end-to-end of the parse") {
    withPinnedDir(Seq("BENCH_r09.json")) { dir =>
      // verbatim r09 copy + a newer synthetic artifact claiming q12 once
      // ran at 0.40s; priorTimes must surface min(0.40, 0.23) = 0.23
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
    }
  }

  test("floors map (r12+ artifacts) overrides the chosen attempt's draw") {
    withPinnedDir(Seq("BENCH_r09.json")) { dir =>
      // r12-shape artifact: "queries" carries the chosen attempt's draw
      // (q68 contended at 2.04), "floors" the cross-attempt minimum
      // (0.71) — the prior must take the floor; a failed query (-1 floor)
      // must not poison the map
      val r12 =
        """{"n": 12, "rc": 0, "tail": "...\"queries\":{\"q68\":2.04,\"q999\":0.50},\"floors\":{\"q68\":0.71,\"q999\":-1},\"value\":9.9}"}"""
      Files.write(new File(dir, "BENCH_r12.json").toPath, r12.getBytes("UTF-8"))
      val prior = Bench.priorTimes(dir)
      assert(prior("q68") == 0.71, s"floor must win over the draw: $prior")
      // q999's floor is -1 (failed all attempts) -> falls back to the draw
      assert(prior("q999") == 0.50)
    }
  }

  test("a -1 failed-query draw cannot erase an older artifact's prior") {
    withPinnedDir(Seq("BENCH_r09.json")) { dir =>
      // r12 claims q12 failed every attempt (-1 in BOTH maps); r09 still
      // carries q12 at 0.23 — the prior must survive, not vanish through
      // min(0.23, -1) -> filtered out
      val r12 =
        """{"n": 12, "rc": 0, "tail": "...\"queries\":{\"q12\":-1.00},\"floors\":{\"q12\":-1},\"value\":9.9}"}"""
      Files.write(new File(dir, "BENCH_r12.json").toPath, r12.getBytes("UTF-8"))
      val prior = Bench.priorTimes(dir)
      assert(prior.get("q12").contains(0.23),
        s"failed draw erased the r09 prior: ${prior.get("q12")}")
    }
  }

  test("positional queries_csv (r14+ artifacts) decodes and feeds the gate") {
    // r14-shape artifact: the per-query floors ride a positional csv
    // (position i = query i+1, zero-padded short keys under 10, -1 =
    // failed every attempt) so all ~275 entries fit the 2000-char tail
    val txt =
      """{"n": 14, "rc": 0, "tail": "...\"queries_csv_spec\":\"q1..qN floors sec; -1=failed\",\"queries_csv\":\"1.42,0.33,-1.00,12.05\",\"value\":9.9}"}"""
    val qs = Bench.parseQueriesCsv(txt)
    assert(qs("q01") == 1.42 && qs("q02") == 0.33 && qs("q04") == 12.05)
    assert(qs("q03") == -1.0, "decoder keeps the marker; priorTimes filters it")
    withPinnedDir(Seq("BENCH_r09.json")) { dir =>
      // q12 csv floor 0.11 must beat r09's 0.23 map entry; the -1 in
      // position 3 must not erase r09's q03 prior (if any) nor appear
      java.nio.file.Files.write(new File(dir, "BENCH_r14.json").toPath,
        ("""{"n": 14, "rc": 0, "tail": "...\"queries_csv\":\"""" +
          (1 to 12).map(i => if (i == 12) "0.11" else if (i == 3) "-1.00" else "9.99")
            .mkString(",") + """\",\"value\":9.9}"}""").getBytes("UTF-8"))
      val prior = Bench.priorTimes(dir)
      assert(prior("q12") == 0.11, s"csv floor must win: ${prior.get("q12")}")
      assert(!prior.get("q03").exists(_ < 0), "failed marker must not leak")
    }
  }

  test("a tail-clipped queries_csv drops its final element, not just non-numbers") {
    // the 2000-char stdout tail can clip the csv MID-NUMBER before the
    // closing quote: a 12.05 floor truncated to "1" decodes as a valid
    // 1.0, seeding a falsely-low prior (spurious ~12x inflation flag next
    // round, permanent cross-artifact-min winner). Without the closing
    // quote the last element is untrustworthy even when it parses.
    val clipped =
      """{"n": 15, "rc": 0, "tail": "...\"queries_csv\":\"1.42,0.33,1"""
    val qs = Bench.parseQueriesCsv(clipped)
    assert(qs == Map("q01" -> 1.42, "q02" -> 0.33),
      s"clipped trailing element must drop: $qs")
    // a COMPLETE capture (closing quote present) keeps every element —
    // the guard must not cost the genuine last query its floor
    val whole =
      """{"n": 15, "rc": 0, "tail": "...\"queries_csv\":\"1.42,0.33,12.05\",\"value\":9.9}"}"""
    assert(Bench.parseQueriesCsv(whole)("q03") == 12.05)
    // clip landing EXACTLY after a comma: the dangling fragment is the
    // empty string — split must keep it (limit -1) so dropRight discards
    // IT and not the last fully-intact floor (ADVICE r15)
    val commaClipped =
      """{"n": 15, "rc": 0, "tail": "...\"queries_csv\":\"1.42,0.33,"""
    assert(Bench.parseQueriesCsv(commaClipped) ==
      Map("q01" -> 1.42, "q02" -> 0.33),
      "a comma-boundary clip must not cost the last intact element")
  }

  test("chosen attempt is the min-load-variance one (r16 verdict #3)") {
    // the r15 incident: variances [3.58, 17.35, 2.38] — the old chooser
    // keyed on per-attempt inflation flags first and picked attempt 1
    // (506 s) over attempt 3 (448 s), a 13%-pessimistic headline
    assert(Bench.chooseAttemptIdx(Seq(3.58, 17.35, 2.38)) == 2)
    // ties break to the earliest attempt; a failed canary (negative) is
    // never chosen while any attempt has a real variance
    assert(Bench.chooseAttemptIdx(Seq(1.2, 1.2, 3.0)) == 0)
    assert(Bench.chooseAttemptIdx(Seq(-1.0, 2.4)) == 1)
    assert(Bench.chooseAttemptIdx(Seq(-1.0, -1.0)) == 0,
      "all canaries failed -> first attempt, not an exception")
  }
}
