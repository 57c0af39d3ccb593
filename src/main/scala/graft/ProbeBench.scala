package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Probe-ONLY scaling harness (dev tooling beside [[ScaleBench]]): the
  * production shape of the incremental screen triangle is "state built
  * once, persisted, probed per increment" — so the number that matters
  * at 100 TB is how the PROBE alone scales with the standing corpus when
  * the increment is FIXED. [[ScaleBench]]'s q270/q278 entries rebuild
  * their state inside the timed query (the oracled contract shape), so
  * their curves measure build + probe together; this harness separates
  * them.
  *
  * Per corpus scale (1x = the source dir, then [[ScaleBench.buildScaled]]
  * replicas): build + persist each screen state ONCE (wall reported as
  * `build_sec`; reused across invocations via the state manifests), then
  * time ONLY the probe of a fixed ~1/3-of-sf0.1 increment (the replica-a
  * `doc_id % 3 == 0` slice, ids offset so every incoming doc has a
  * standing twin — the "is this new doc already in the corpus" hit
  * path). Expected: probe wall ~flat-ish in corpus size for a fixed
  * increment up to the state-scan term — candidate fan-out per incoming
  * token is the token's df, which the isomorphic replica construction
  * holds constant; what DOES grow linearly is the map-side scan of the
  * persisted postings/prefix frames (Spark has no point-lookup index;
  * the small probe side broadcasts, the state side streams). A
  * super-linear curve is a bug to diagnose.
  *
  * `append` mode (r14 verdict #5): measures the append-vs-rebuild trade
  * behind the 20% `refreshDfreqAbove` default — builds the state from
  * 80% of the corpus, appends the remaining fifth in 4%-of-corpus
  * batches WITHOUT refreshing df, and after each append times the fixed
  * probe and counts its hits against the same probe on a fresh
  * full-corpus rebuild: stale df may only cost probe TIME (prefix
  * selectivity), never hits — the maintenance-contract claim, here
  * measured instead of asserted.
  *
  * Usage:
  *   runMain graft.ProbeBench <srcDir> [attempts=2] [replicas... = 10 25]
  *   runMain graft.ProbeBench <srcDir> append [attempts] [replicas...]
  * Scaled corpora land in /tmp/graft_probe_r<N>, states beside them.
  */
object ProbeBench {

  private val Tau = 0.8 // containment probe threshold
  private val JacT = 0.6 // resemblance state/build threshold
  private val K = 3 // shingleK everywhere (the q270/q278 value)

  /** Fixed increment: the replica-a `% 3 == 0` slice, ids offset PAST
    * the largest possible replica offset (100 x 1e8 — buildScaled's
    * round-17 ceiling) so an incoming id can never equal ANY standing
    * id: a +9e8 offset collided with replica 9's id space, and the
    * probes' `din =!= host` guard would silently drop same-id hosts
    * (benign on token-suffixed iso replicas, a real hit-count
    * distortion on skewed builds where boilerplate spans replicas).
    * 1e10 = RecallBench.PlantBase, but those ids live in the
    * embeddings table — disjoint keyspaces, no collision.
    */
  private def increment(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 100000000L && col("doc_id") % 3 === 0)
      .select((col("doc_id") + 10000000000L).as("doc_id"), col("text"))

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def drain(df: DataFrame): Long = df.count()

  /** A mismatched versioned manifest (e.g. /tmp states persisted by an
    * older build before the prefix-formula bump) must REBUILD here — the
    * library's fail-loudly contract is for production resumes; a dev
    * harness meeting its own stale scratch is the expected case.
    */
  private def tryLoad[A](load: => Option[A]): Option[A] =
    try load catch {
      case e: IllegalArgumentException =>
        System.err.println(
          s"[probebench] stale state manifest, rebuilding: ${e.getMessage.takeWhile(_ != '\n')}")
        None
    }

  /** Load-or-build each persisted screen state for `dir`'s documents. */
  private def states(spark: SparkSession, dir: String, stateRoot: String)
      : (Dedup.ContainmentState, Dedup.ResemblanceState, Dedup.MinhashState,
        DataFrame, Map[String, Double]) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cDir = s"$stateRoot/containment"
    val rDir = s"$stateRoot/resemblance"
    val mDir = s"$stateRoot/minhash"
    val pDir = s"$stateRoot/paragraph"
    new java.io.File(cDir).mkdirs(); new java.io.File(rDir).mkdirs()
    new java.io.File(mDir).mkdirs(); new java.io.File(pDir).mkdirs()
    var builds = Map.empty[String, Double]
    val c = tryLoad(
      Dedup.loadContainmentState(spark, cDir, Dedup.ContainmentParams(K)))
      .getOrElse {
        val (sec, st) = time {
          val s = Dedup.containmentStateCheckpointed(docs, "doc_id", "text", K)
          Dedup.saveContainmentState(s, cDir, Dedup.ContainmentParams(K)); s
        }
        builds += ("containment" -> sec)
        Dedup.loadContainmentState(spark, cDir, Dedup.ContainmentParams(K)).get
      }
    val r = tryLoad(Dedup.loadResemblanceState(spark, rDir,
        Dedup.ResemblanceParams(JacT, K)))
      .getOrElse {
        val (sec, _) = time {
          val s = Dedup.resemblanceStateCheckpointed(
            docs, "doc_id", "text", JacT, K)
          Dedup.saveResemblanceState(s, rDir)
        }
        builds += ("resemblance" -> sec)
        Dedup.loadResemblanceState(spark, rDir,
          Dedup.ResemblanceParams(JacT, K)).get
      }
    val mp = Dedup.MinhashParams(64, 16, K)
    val m = tryLoad(Dedup.loadMinhashState(spark, mDir, mp)).getOrElse {
      val (sec, _) = time {
        val s = Dedup.minhashStateCheckpointed(docs, "doc_id", "text",
          64, 16, K, 1000)
        Dedup.saveMinhashState(s, mDir, mp)
      }
      builds += ("minhash" -> sec)
      Dedup.loadMinhashState(spark, mDir, mp).get
    }
    // the fifth persisted screen (round 17): the corpus-level paragraph
    // seen-hash set — build is one explode + distinct, probe is the
    // keep-first screen of the increment against the standing hashes
    val p = tryLoad(Dedup.loadParagraphState(spark, pDir)).getOrElse {
      val (sec, _) = time {
        val seen = Dedup.paragraphHashes(docs, "doc_id", "text")
          .select(col("seg_h")).distinct().localCheckpoint(true)
        Dedup.saveParagraphState(seen, pDir)
      }
      builds += ("paragraph" -> sec)
      Dedup.loadParagraphState(spark, pDir).get
    }
    (c, r, m, p, builds)
  }

  private def probeBattery(spark: SparkSession, dir: String,
      stateRoot: String, attempts: Int): Unit = {
    val (cs, rs, ms, ps, builds) = states(spark, dir, stateRoot)
    val inc = increment(spark, dir).localCheckpoint(true)
    val nInc = inc.count()
    val nCorpus = spark.read.parquet(s"$dir/documents.parquet").count()
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "containment_probe" -> (() =>
        Dedup.containmentProbe(inc, cs, "doc_id", "text", Tau, K)),
      "resemblance_probe" -> (() => Dedup.jaccardProbe(inc, rs, "doc_id", "text")),
      "minhash_probe" -> (() => Dedup.minhashDedupAgainst(inc, ms, "doc_id",
        "text", 0.7, maxBucket = 1000)),
      // hits = increment docs with at least one segment already standing
      "paragraph_probe" -> (() =>
        Dedup.paragraphDedup(inc, "doc_id", "text",
            priorSeenHashes = Some(ps))
          .where(col("n_kept") < col("n_total"))))
    probes.foreach { case (name, mk) =>
      val runs = (1 to attempts).map(_ => time(drain(mk())))
      val sec = runs.map(_._1).min
      val hits = runs.head._2
      val b = builds.get(name.stripSuffix("_probe")).map(v => f"$v%.3f")
        .getOrElse("null")
      println(f"""{"probe":"$name","corpus_rows":$nCorpus,"inc_rows":$nInc,"build_sec":$b,"probe_sec":$sec%.3f,"hits":$hits}""")
    }
  }

  /** Append-vs-rebuild: state from 80% of docs, five 4%-of-corpus
    * appends with df frozen, probe timed + hit-counted after each; then
    * the same probe against a fresh full rebuild. Intermediate rows
    * LEGITIMATELY under-hit the fresh state (their corpus is smaller);
    * after the LAST append coverage is full and 20% of df is stale, so
    * `hits_match_fresh` there is the measured stale-df-never-costs-
    * recall contract, and `probe_sec` vs `fresh_probe_sec` is the real
    * prefix-selectivity price of the drift the 0.2 default tolerates.
    */
  private def appendBattery(spark: SparkSession, dir: String,
      attempts: Int): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val inc = increment(spark, dir).localCheckpoint(true)
    // doc_id % 25: 0-19 -> the 80% base, each k in 20-24 a 4% batch
    val base = docs.where(pmod(col("doc_id"), lit(25)) < 20)
    val (buildSec, st0) = time {
      val s = Dedup.containmentStateCheckpointed(base, "doc_id", "text", K)
      s.sets.count(); s
    }
    val (rbSec, fresh) = time {
      val s = Dedup.containmentStateCheckpointed(docs, "doc_id", "text", K)
      s.sets.count(); s
    }
    def probeOf(s: Dedup.ContainmentState): (Double, Long) = {
      val runs = (1 to attempts).map(_ =>
        time(drain(Dedup.containmentProbe(inc, s, "doc_id", "text", Tau, K))))
      (runs.map(_._1).min, runs.head._2)
    }
    val (freshSec, freshHits) = probeOf(fresh)
    println(f"""{"append":"base80","build_sec":$buildSec%.3f,"rebuild_full_sec":$rbSec%.3f,"fresh_probe_sec":$freshSec%.3f,"fresh_hits":$freshHits}""")
    var st = st0
    (20 to 24).foreach { k =>
      val batch = docs.where(pmod(col("doc_id"), lit(25)) === k)
      val (appSec, st1) = time {
        // never refresh: measure the drift the 0.2 default tolerates
        Dedup.appendContainmentState(st, batch, "doc_id", "text", K,
          refreshDfreqAbove = Double.MaxValue)
      }
      st = st1
      val stalePct = 100.0 * st.staleDocs / st.sets.count()
      val (pSec, pHits) = probeOf(st)
      println(f"""{"append":"batch${k - 19}","append_sec":$appSec%.3f,"stale_pct":$stalePct%.1f,"probe_sec":$pSec%.3f,"hits":$pHits,"fresh_probe_sec":$freshSec%.3f,"hits_match_fresh":${pHits == freshHits}}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val mode = if (args.length > 1 && args(1) == "append") "append" else "probes"
    val rest = args.drop(if (mode == "append") 2 else 1)
    val attempts = rest.headOption.map(_.toInt).getOrElse(2)
    val replicas = rest.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(10, 25)
      case rs => rs
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.local(cpus.toInt, "graft-probebench")
    val scales: Seq[(String, String)] = ("1x" -> srcDir) +: replicas.map { r =>
      val out = s"/tmp/graft_probe_r$r"
      ScaleBench.buildScaled(spark, srcDir, out, r)
      s"${r}x" -> out
    }
    scales.foreach { case (tag, dir) =>
      println(s"""{"scale":"$tag","dir":"$dir","mode":"$mode"}""")
      if (mode == "append") appendBattery(spark, dir, attempts)
      else probeBattery(spark, dir, s"/tmp/graft_probe_states_$tag", attempts)
    }
    spark.stop()
  }
}
