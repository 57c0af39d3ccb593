package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackingMixtureSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("concatChunk assigns packs by first-token block") {
    // tokens 1000,1000,1000 with budget 2048: offsets 0,1000,2000 ->
    // packs 0,0,0? no — 2000 < 2048 so third doc still pack 0; fourth at
    // 3000 starts pack 1
    val df = Seq((1L, "a", 1000L), (2L, "a", 1000L), (3L, "a", 1000L),
      (4L, "a", 1000L), (5L, "b", 5000L), (6L, "b", 10L))
      .toDF("id", "grp", "tok")
    val out = Packing.concatChunk(df, "tok", "id", 2048L, Seq("grp"))
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 0L)
    assert(out(4L) == 1L)
    // oversized doc owns pack 0 of its group; next doc starts where the
    // stream cursor is (5000 -> pack 2)
    assert(out(5L) == 0L && out(6L) == 2L)
  }

  test("concatChunk rejects global (ungrouped) packing") {
    val df = Seq((1L, 10L)).toDF("id", "tok")
    intercept[IllegalArgumentException] {
      Packing.concatChunk(df, "tok", "id", 100L, Nil)
    }
  }

  test("slidingChunks windows every stride tokens, clamps the tail, skips empties") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i")), // 10 tokens, size 4 stride 3
      (2L, Seq("a")),                   // single token -> one chunk
      (3L, Seq.empty[String])           // empty -> no chunks
    ).toDF("id", "toks")
    val out = Packing.slidingChunks(df, "toks", Seq("id"), size = 4, stride = 3)
      .orderBy("id", "chunk_idx")
      .as[(Long, Int, Seq[String])].collect().toSeq
    // starts 0,3,6,9 -> [t1..t4],[t4..t7],[t7..t10],[t10]
    assert(out == Seq(
      (1L, 0, Seq("t1", "t2", "t3", "t4")),
      (1L, 1, Seq("t4", "t5", "t6", "t7")),
      (1L, 2, Seq("t7", "t8", "t9", "t10")),
      (1L, 3, Seq("t10")),
      (2L, 0, Seq("a"))))
    // every token covered at least once (stride <= size contract)
    val covered = out.filter(_._1 == 1L).flatMap(_._3).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("slidingChunks validates size and stride; plan is shuffle-free") {
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    intercept[IllegalArgumentException] {
      Packing.slidingChunks(df, "toks", Seq("id"), size = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      Packing.slidingChunks(df, "toks", Seq("id"), size = 4, stride = 5)
    }
    val plan = Packing.slidingChunks(df, "toks", Seq("id"), 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }

  test("nextFitPack: boundaries preserved, oversize isolated, resets per group") {
    // g1 docs: 40,30,40,90,120,10 with budget 100:
    //   bin0 = 40+30 (40+30+40=110 > 100), bin1 = 40, bin2 = 90 (90+120
    //   overflows), bin3 = 120 ALONE (oversize), bin4 = 10
    val rows = Seq(
      ("g1", 1L, 40L), ("g1", 2L, 30L), ("g1", 3L, 40L), ("g1", 4L, 90L),
      ("g1", 5L, 120L), ("g1", 6L, 10L),
      ("g2", 1L, 60L), ("g2", 2L, 60L))
    val df = rows.toDF("g", "ord", "n")
    val out = Packing.nextFitPack(df, "n", "ord", budget = 100L, Seq("g"))
      .select("g", "ord", "bin_id").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("g1", 1L)) == 0L && out(("g1", 2L)) == 0L)
    assert(out(("g1", 3L)) == 1L)
    assert(out(("g1", 4L)) == 2L)
    assert(out(("g1", 5L)) == 3L) // oversize doc alone
    assert(out(("g1", 6L)) == 4L)
    // bin counter resets for g2; 60+60 > 100 splits them
    assert(out(("g2", 1L)) == 0L && out(("g2", 2L)) == 1L)
    // invariant: no multi-doc bin exceeds the budget
    val fills = Packing.nextFitPack(df, "n", "ord", budget = 100L, Seq("g"))
      .groupBy("g", "bin_id")
      .agg(sum("n").as("fill"), count(lit(1)).as("c"))
      .where(col("fill") > 100 && col("c") > 1).count()
    assert(fills == 0L)
    // result is partition-count invariant (the shuffle co-locates groups)
    val rep = Packing.nextFitPack(df.repartition(7), "n", "ord",
      budget = 100L, Seq("g"))
      .select("g", "ord", "bin_id").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rep == out)
  }

  test("nextFitPack: null tokens pack as zero; validation is loud") {
    val df = Seq(("g", 1L, Some(50L)), ("g", 2L, None), ("g", 3L, Some(60L)))
      .toDF("g", "ord", "n")
    val out = Packing.nextFitPack(df, "n", "ord", budget = 100L, Seq("g"))
      .select("ord", "bin_id").as[(Long, Long)].collect().toMap
    // null = 0 tokens: 50+0 fits bin0, 60 overflows to bin1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    intercept[IllegalArgumentException] {
      Packing.nextFitPack(df, "n", "ord", budget = 0L, Seq("g"))
    }
    intercept[IllegalArgumentException] {
      Packing.nextFitPack(df, "n", "ord", budget = 10L, Seq.empty)
    }
    val neg = Seq(("g", 1L, -5L)).toDF("g", "ord", "n")
    assertThrows[Exception] {
      Packing.nextFitPack(neg, "n", "ord", budget = 10L, Seq("g")).collect()
    }
  }

  test("paddingReport: longest-first batches pad to their own max, exact waste") {
    // bucket 0 (len < 10): lens 9,8,5,3 with batchSize 2 ->
    //   batch 0 = {9,8}: padded 18, tot 17; batch 1 = {5,3}: padded 10, tot 8
    // bucket 1: lens 12,10 -> one batch: padded 24, tot 22
    val d = Seq((1L, 5), (2L, 9), (3L, 3), (4L, 8), (5L, 12), (6L, 10))
      .toDF("id", "len")
    val out = Packing.paddingReport(d, "len", "id", bucketWidth = 10, batchSize = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 4L, 2L, 25L, 28L, 3L, 0.892857),
      (1L, 2L, 1L, 22L, 24L, 2L, 0.916667)))
    // partition invariance: the in-bucket order is a total order
    val p9 = Packing.paddingReport(d.repartition(9), "len", "id", 10, 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(p9 == out)
  }

  test("sampleToMixture hits exact rates for binary-fraction weights") {
    val rows = for (s <- Seq("a", "b"); i <- 1 to 400)
      yield (s, s"$s-doc-$i")
    val df = rows.toDF("source", "text")
    val kept = Mixtures.sampleToMixture(df, "source", "text",
      Map("a" -> 0.75, "b" -> 0.25))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // binding source is a (400/0.75 < 400/0.25): a kept whole,
    // b targets 400/3 ~ 133 via hash threshold (tolerance: hash variance)
    assert(kept("a") == 400L)
    assert(kept("b") > 90L && kept("b") < 180L)
    // deterministic: second run identical
    val again = Mixtures.sampleToMixture(df, "source", "text",
      Map("a" -> 0.75, "b" -> 0.25)).count()
    assert(again == kept.values.sum)
  }

  test("sampleToMixture drops unlisted sources and validates weights") {
    val df = Seq(("a", "x"), ("zzz", "y")).toDF("source", "text")
    val out = Mixtures.sampleToMixture(df, "source", "text", Map("a" -> 1.0))
    assert(out.select("source").as[String].collect().toSet == Set("a"))
    intercept[IllegalArgumentException] {
      Mixtures.sampleToMixture(df, "source", "text", Map.empty[String, Double])
    }
  }

  test("annealSchedule: quarter interpolation, per-phase budgets, flattening") {
    val df = (1 to 80).map(i => (i.toLong, if (i <= 64) "big" else "small"))
      .toDF("id", "source")
    val out = Mixtures.annealSchedule(df, "source", phases = 5,
        budgetPerPhase = 1000L, startQuarters = 4, endQuarters = 1)
      .orderBy("phase", "source")
      .as[(Int, Int, String, Long, Double, Long)].collect()
    // rounded linear interpolation 4 -> 1 over 5 phases: 4,3,3,2,1
    // (p=3 sits at 2.5 -> HALF_UP 3)
    assert(out.map(_._2).distinct.toSeq == Seq(4, 3, 3, 2, 1).distinct)
    assert(out.grouped(2).map(_.head._2).toSeq == Seq(4, 3, 3, 2, 1))
    // each phase's allocations spend ~the phase budget (per-source
    // rounding can drift by at most #sources/2)
    out.groupBy(_._1).foreach { case (p, rows) =>
      val spent = rows.map(_._6).sum
      assert(math.abs(spent - 1000L) <= rows.length, s"phase $p spent $spent")
      val w = rows.map(_._5).sum
      assert(math.abs(w - 1.0) < 1e-4, s"phase $p weights sum $w")
    }
    // phase 1 (alpha 1) is proportional: big gets 64/80 of the budget;
    // the final sqrt-sqrt phase flattens toward small
    val p1 = out.filter(_._1 == 1).map(r => r._3 -> r._6).toMap
    assert(p1("big") == 800L && p1("small") == 200L)
    val p5 = out.filter(_._1 == 5).map(r => r._3 -> r._6).toMap
    assert(p5("small") > 200L && p5("big") < 800L,
      s"annealing must flatten the mix: $p5")
    // phases=1 degenerates to the start temperature
    val one = Mixtures.annealSchedule(df, "source", phases = 1,
        budgetPerPhase = 1000L)
      .select("alpha_q").distinct().as[Int].collect().toSeq
    assert(one == Seq(4))
  }

  test("temperatureWeights flattens toward low-resource sources") {
    val rows = Seq.fill(900)(("big", "x")) ++ Seq.fill(100)(("small", "y"))
    val df = rows.toDF("source", "text")
    val w = Mixtures.temperatureWeights(df, "source", alpha = 0.5,
      budget = 1000L)
      .select("source", "n", "weight", "alloc")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // sqrt(900)=30, sqrt(100)=10 -> weights 0.75 / 0.25 exactly
    assert(w("big") == (("big", 900L, 0.75, 750L)))
    assert(w("small") == (("small", 100L, 0.25, 250L)))
    // alpha=1 recovers the raw proportions
    val raw = Mixtures.temperatureWeights(df, "source", alpha = 1.0,
      budget = 1000L).select("source", "weight").as[(String, Double)]
      .collect().toMap
    assert(raw("big") == 0.9 && raw("small") == 0.1)
    intercept[IllegalArgumentException] {
      Mixtures.temperatureWeights(df, "source", alpha = 0.0, budget = 1000L)
    }
  }

  test("capWaterfill: caps bind, surplus redistributes, level is exact") {
    // masses 100/100/100, caps 50/150/1000, budget 240:
    // ratios 0.5/1.5/10 -> a saturates (B=190, W=200 after), then the
    // level freezes at 190/200 = 0.95 < b's ratio 1.5, so b and c both
    // drink the level: floor(100 * 190/200) = 95 each; total exactly 240
    val df = Seq(("a", 100L, 50L), ("b", 100L, 150L), ("c", 100L, 1000L))
      .toDF("source", "mass", "cap")
    val out = Mixtures.capWaterfill(df, "source", "mass", "cap", budget = 240L)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 50L, "b" -> 95L, "c" -> 95L))
    // budget above the cap sum: everyone gets exactly their cap
    val all = Mixtures.capWaterfill(df, "source", "mass", "cap", budget = 5000L)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(all == Map("a" -> 50L, "b" -> 150L, "c" -> 1000L))
    // budget below every cap share: pure proportional floor, no cap binds
    val low = Mixtures.capWaterfill(df, "source", "mass", "cap", budget = 90L)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(low == Map("a" -> 30L, "b" -> 30L, "c" -> 30L))
  }

  test("capWaterfill is exact beyond i64 products (100 TB token masses)") {
    // masses ~2.5e13 tokens: cap*massSum and mass*budget overflow Long
    // multiplication; the BigInt walk must not care
    val m = 25_000_000_000_000L
    val df = Seq(("a", m, m), ("b", m, 4 * m), ("c", m, 4 * m))
      .toDF("source", "mass", "cap")
    val budget = 6 * m
    val out = Mixtures.capWaterfill(df, "source", "mass", "cap", budget)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    // a saturates at 1 epoch; b and c split the rest: 2.5 epochs each
    assert(out("a") == m)
    assert(out("b") == 5 * m / 2 && out("c") == 5 * m / 2)
    assert(out.values.sum <= budget)
  }

  test("capWaterfill validates inputs loudly") {
    val ok = Seq(("a", 10L, 5L)).toDF("source", "mass", "cap")
    intercept[IllegalArgumentException] {
      Mixtures.capWaterfill(ok, "source", "mass", "cap", budget = -1L)
    }
    intercept[IllegalArgumentException] {
      Mixtures.capWaterfill(Seq(("a", 0L, 5L)).toDF("source", "mass", "cap"),
        "source", "mass", "cap", budget = 10L)
    }
    intercept[IllegalArgumentException] {
      Mixtures.capWaterfill(Seq(("a", 10L, -5L)).toDF("source", "mass", "cap"),
        "source", "mass", "cap", budget = 10L)
    }
    intercept[IllegalArgumentException] {
      Mixtures.capWaterfill(
        Seq(("a", 10L, 5L), ("a", 20L, 5L)).toDF("source", "mass", "cap"),
        "source", "mass", "cap", budget = 10L)
    }
  }

  test("temperatureWeights mass option re-denominates n in tokens") {
    // token currency: big has 900 rows x 1 token, small 100 rows x 80
    // tokens -> token masses 900 vs 8000; the ROW count would invert the
    // mixture, the token mass must drive it
    val rows = Seq.fill(900)(("big", "x")) ++
      Seq.fill(100)(("small", Seq.fill(80)("y").mkString(" ")))
    val df = rows.toDF("source", "text")
    val w = Mixtures.temperatureWeights(df, "source", alpha = 1.0,
        budget = 1000L,
        mass = Some(graft.functions.text.tokenCount(col("text"))))
      .select("source", "n", "alloc").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(w("big") == (("big", 900L, 101L)))     // 900/8900 of budget
    assert(w("small") == (("small", 8000L, 899L)))
  }

  test("materializeBlocks: exact budget blocks crossing doc boundaries, concat identity") {
    val docs = Seq(
      ("a", 1L, (1 to 7).map(i => s"a$i")),   // + eos = 8 tokens
      ("a", 2L, (1 to 10).map(i => s"b$i")),  // + eos = 11 -> crosses blocks
      ("a", 3L, (1 to 2).map(i => s"c$i")),   // + eos = 3
      ("b", 9L, (1 to 4).map(i => s"z$i"))    // + eos = 5, own group
    ).toDF("src", "doc_id", "toks")
    val out = Packing.materializeBlocks(docs, "toks", "doc_id", budget = 6,
        groupCols = Seq("src"), sepToken = Some("<eos>"))
      .orderBy("src", "block_id")
      .as[(String, Long, Seq[String])].collect()
    // group a: 22 tokens -> blocks of 6,6,6,4; group b: 5 -> one block of 5
    assert(out.map(r => (r._1, r._2, r._3.length)).toSeq ==
      Seq(("a", 0L, 6), ("a", 1L, 6), ("a", 2L, 6), ("a", 3L, 4), ("b", 0L, 5)))
    // concatenation identity: blocks reassemble the doc-order token stream
    val aStream = out.filter(_._1 == "a").sortBy(_._2).flatMap(_._3).toSeq
    val expected = (1 to 7).map(i => s"a$i") ++ Seq("<eos>") ++
      (1 to 10).map(i => s"b$i") ++ Seq("<eos>") ++
      (1 to 2).map(i => s"c$i") ++ Seq("<eos>")
    assert(aStream == expected)
    // doc 2 (11 tokens from offset 8) straddles blocks 1 and 2 intact
    assert(aStream.slice(8, 19) == (1 to 10).map(i => s"b$i") ++ Seq("<eos>"))
    // without a separator the stream is just the raw concatenation
    val plain = Packing.materializeBlocks(docs.where(col("src") === "a"),
        "toks", "doc_id", budget = 100, groupCols = Seq("src"))
      .as[(String, Long, Seq[String])].collect()
    assert(plain.map(_._3.length).sum == 19)
  }

  test("applyTemperature keeps exactly alloc rows per source, ranked") {
    val rows = (1 to 900).map(i => ("big", i.toLong)) ++
      (901 to 1000).map(i => ("small", i.toLong))
    val df = rows.toDF("source", "id")
    // sqrt weights 0.75/0.25 at budget 100 -> allocs 75/25
    val out = Mixtures.applyTemperature(df, "source", "id", alpha = 0.5,
      budget = 100L)
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("big" -> 75L, "small" -> 25L))
    // ranks are 1..alloc and the selection is deterministic
    val ranks = out.where(col("source") === "small")
      .select("rnk").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 25L))
    val again = Mixtures.applyTemperature(df, "source", "id", alpha = 0.5,
      budget = 100L).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("applyTemperature upsample=true delivers over-allocations by epoch repetition") {
    // sqrt weights 0.75/0.25 at budget 400 -> allocs 300/100: big (900
    // rows) downsamples to 300, small (100 rows) is allocated exactly its
    // size; budget 800 -> allocs 600/200: small must UPsample 2x
    val rows = (1 to 900).map(i => ("big", i.toLong)) ++
      (901 to 1000).map(i => ("small", i.toLong))
    val df = rows.toDF("source", "id")
    val out = Mixtures.applyTemperature(df, "source", "id", alpha = 0.5,
      budget = 800L, upsample = true)
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("big" -> 600L, "small" -> 200L),
      s"per-source output must equal alloc exactly, got $bySource")
    // small: alloc 200 over 100 rows = 2 full epochs, empty remainder —
    // every row appears exactly at epochs 0 and 1
    val smallEpochs = out.where(col("source") === "small")
      .groupBy("id").agg(sort_array(collect_list(col("epoch"))).as("es"))
      .select("es").as[Seq[Int]].collect()
    assert(smallEpochs.length == 100 && smallEpochs.forall(_ == Seq(0, 1)))
    // big: alloc 600 < 900 rows — plain downsample, all epoch 0, ranks 1..600
    val big = out.where(col("source") === "big")
    assert(big.where(col("epoch") =!= 0).count() == 0)
    assert(big.select("rnk").as[Long].collect().sorted.toSeq == (1L to 600L))
    // a PARTIAL final epoch truncates in hash order: alloc 250 over 100
    // rows = 2 full epochs + the 50 hash-first rows once more
    val partial = Mixtures.applyTemperature(
      rows.filter(_._1 == "small").toDF("source", "id"), "source", "id",
      alpha = 0.5, budget = 250L, upsample = true)
    assert(partial.count() == 250)
    val thirds = partial.where(col("epoch") === 2)
      .select("rnk").as[Long].collect().sorted
    assert(thirds.toSeq == (1L to 50L),
      s"partial epoch must be the hash-order prefix, got ${thirds.take(5).toSeq}...")
    // default remains the pre-existing behavior: no epoch column, min(alloc, n)
    val legacy = Mixtures.applyTemperature(df, "source", "id", alpha = 0.5,
      budget = 800L)
    assert(!legacy.columns.contains("epoch"))
    assert(legacy.where(col("source") === "small").count() == 100)
  }

  test("strideInterleave: prefix shares within one row of the weights") {
    // a:2, b:1 with row counts IN the 2:1 ratio (40/20), so neither source
    // exhausts early and the comb runs the full schedule
    val df = (1 to 60).map(i => (i.toLong, if (i % 3 == 0) "b" else "a"))
      .toDF("id", "src")
    val out = Mixtures.strideInterleave(df, "src", "id",
      Map("a" -> 2L, "b" -> 1L))
      .orderBy("pos").select("src").as[String].collect().toSeq
    assert(out.take(9) == Seq("a", "b", "a", "a", "b", "a", "a", "b", "a"))
    // low-discrepancy guarantee: every prefix is within 1 row per source
    // of the target share (the property an epoch shuffle lacks)
    val shares = Map("a" -> 2.0 / 3, "b" -> 1.0 / 3)
    out.indices.foreach { i =>
      val prefix = out.take(i + 1)
      shares.foreach { case (s, sh) =>
        val got = prefix.count(_ == s)
        assert(math.abs(got - sh * prefix.size) <= 1.0,
          s"prefix ${i + 1}: source $s count $got vs target ${sh * prefix.size}")
      }
    }
  }

  test("strideInterleave: partition-invariant; unmapped sources dropped; tail") {
    val df = (1 to 40).map(i =>
      (i.toLong, Seq("a", "b", "c")(i % 3))).toDF("id", "src")
    val w = Map("a" -> 3L, "b" -> 1L)
    val one = Mixtures.strideInterleave(df.repartition(1), "src", "id", w)
      .orderBy("pos").collect().toSeq
    val many = Mixtures.strideInterleave(df.repartition(7), "src", "id", w)
      .orderBy("pos").collect().toSeq
    assert(one == many)
    // source c has no weight -> dropped entirely
    assert(one.forall(_.getString(1) != "c"))
    // positions are dense 1..n
    assert(one.map(_.getLong(2)) == (1L to one.size))
    // data-constrained tail: a 3:1 mixture where a runs out early ends in
    // a pure-b tail, never an error
    val tiny = (Seq((1L, "a")) ++ (2 to 12).map(i => (i.toLong, "b")))
      .toDF("id", "src")
    val tail = Mixtures.strideInterleave(tiny, "src", "id", w)
      .orderBy("pos").select("src").as[String].collect().toSeq
    assert(tail.count(_ == "a") == 1 && tail.count(_ == "b") == 11)
    assert(tail.drop(2).forall(_ == "b"))
    // lcm cap refuses silently-overflowing weights
    intercept[IllegalArgumentException] {
      Mixtures.strideInterleave(df, "src", "id",
        Map("a" -> 1048573L, "b" -> 1048571L))
    }
  }
}
