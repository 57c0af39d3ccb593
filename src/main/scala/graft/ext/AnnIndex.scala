package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{PqExpressions, VectorExpressions}

/** Persisted IVF-PQ ANN index — the ANN family's production ingest shape
  * (round 17). The dedup screens already persist their standing state
  * and pay LOAD + PROBE per increment (minhash/containment/resemblance/
  * substring, q284/q285); the ANN faces re-ran cell assignment and PQ
  * encoding over the WHOLE corpus on every query. At 100 TB the index is
  * the artifact: encode the corpus once per generation (one coarse cell
  * id + m uint8-class codes per vector — ~9 bytes at m=8 against 256
  * float bytes, the FAISS IVFADC compression argument, Jégou et al.
  * 2011 §IV), persist codes + frozen models beside the dedup states,
  * and let every increment pay a broadcast equi-join on its probed
  * cells only.
  *
  * Freeze-on-persist contract (the [[Ivf.saveModel]] argument, applied
  * to the composite): PQ codes are only comparable under the codebooks
  * that produced them and cell membership only under the centroids that
  * assigned it, so an increment MUST encode under the LOADED models —
  * [[append]] takes the state, never a fresh trainer. The manifest
  * carries `(nCells, m, c)` through the same [[Dedup.StateManifest]]
  * codec as the four dedup states and fails loudly on a mismatched
  * resume.
  *
  * The reference (ETLUtils) has no vector operators — this extends the
  * LLM-pipeline surface like the rest of `graft.ext`.
  */
object AnnIndex {

  /** Build parameters, persisted in the manifest: a resume under ANY
    * different geometry must fail loudly (codes under c=16 read as
    * garbage distances under c=32 — silently wrong ranks, the exact
    * failure class the dedup manifests exist to prevent).
    */
  final case class Params(nCells: Int, m: Int, c: Int) {
    require(nCells >= 1 && m >= 1 && c >= 1, "nCells, m, c must be >= 1")
    def encoded: String = s"nCells=$nCells;m=$m;c=$c"
  }

  /** A standing index: frozen coarse centroids, frozen PQ codebooks, and
    * the encoded corpus `codes` frame `(vec_id, cell, codes)`.
    */
  final case class State(coarse: Ivf.Model, pq: Pq.Model, codes: DataFrame) {
    def params: Params =
      Params(coarse.centroids.length, pq.m, pq.c)
  }

  /** Encode a corpus under FROZEN models: `(vec_id, cell, codes)` — one
    * row-local pass (nearest centroid + per-subspace argmin), no
    * shuffle; the scan's output is the ~9-byte index row, never the
    * float vector.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, pq: Pq.Model): DataFrame =
    corpus.where(col(vecCol).isNotNull).select(
      col(idCol).as("vec_id"),
      element_at(VectorExpressions.nearestCentroids(
        col(vecCol), coarse.centroids, 1), 1).as("cell"),
      PqExpressions.pqEncode(col(vecCol), pq.codebooks).as("codes"))

  /** Build a fresh index state over `corpus` under the given models. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      coarse: Ivf.Model, pq: Pq.Model): State =
    State(coarse, pq, encode(corpus, idCol, vecCol, coarse, pq))

  /** Derived default cell count for a corpus of `n` vectors:
    * `max(floor, ⌈√n⌉)` — the FAISS IVF sizing rule (nlist ≈ √N holds
    * per-probe candidate mass at `O(√N · nProbe)` instead of the
    * toward-a-scan degradation of a frozen cell count; Jégou et al.
    * 2011 §V uses the same order). Encoded HERE rather than in probe's
    * scaladoc (the r16 SQ8 / fixed-S lesson: measured scale rules live
    * in code) — round 17's q299 fixture froze nCells=8 while ScaleBench
    * grew the corpus 100× and the probe degraded 64× BY GEOMETRY; under
    * this derivation the same 100× grows nCells 10× and the probed
    * slice stays ~√N.
    *
    * The floor keeps tiny replay fixtures meaningful (at least a few
    * cells to probe); the derivation is exact-integer so an oracle can
    * replay it as `greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT))`.
    */
  def derivedNCells(n: Long, floor: Int = 4): Int = {
    require(n >= 0, "corpus count must be >= 0")
    math.max(floor, math.ceil(math.sqrt(n.toDouble)).toInt)
  }

  /** Build a portable-seeded index SIZED TO THE CORPUS: one count scan,
    * nCells = [[derivedNCells]] unless explicitly overridden (oracle
    * replay fixtures that must freeze geometry across scales pass
    * `Some(k)`; production callers pass None and cannot accidentally
    * freeze a cell count while the corpus grows). Seed models keep the
    * md5-portable convention so the whole index replays in SQL.
    */
  def buildPortable(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, c: Int, nCells: Option[Int] = None): State = {
    val base = corpus.where(col(vecCol).isNotNull)
    val k = nCells.getOrElse(derivedNCells(base.count()))
    build(base, idCol, vecCol,
      Ivf.portableSeedModel(base, idCol, vecCol, k),
      Pq.portableSeedCodebooks(base, idCol, vecCol, m, c))
  }

  /** Build a TRAINED index sized to the corpus: Lloyd-refined coarse
    * quantizer ([[Ivf.train]]) and PQ codebooks ([[Pq.train]]) with the
    * same derived-nCells default as [[buildPortable]] — the production
    * build path (RecallBench: trained models lift recall@10 from ~0.5
    * to ≥0.9 at matched probe cost).
    */
  def buildTrained(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, c: Int, nCells: Option[Int] = None,
      coarseIters: Int = 5, pqIters: Int = 3,
      maxTrainRows: Long = 1000000L): State = {
    val base = corpus.where(col(vecCol).isNotNull)
    val k = nCells.getOrElse(derivedNCells(base.count()))
    build(base, idCol, vecCol,
      Ivf.train(base, idCol, vecCol, k, coarseIters, maxTrainRows),
      Pq.train(base, idCol, vecCol, m, c, pqIters))
  }

  /** Append an increment under the state's FROZEN models: encode the new
    * vectors and union their codes on — centroids and codebooks are
    * untouched, so standing codes stay valid and [[probe]] results are
    * provenance-invariant (append-then-probe == rebuild-then-probe,
    * AnnIndexSpec). Id uniqueness is the caller's contract, as for the
    * dedup states: a re-appended id would simply appear twice among
    * candidates.
    */
  def append(state: State, increment: DataFrame, idCol: String,
      vecCol: String): State =
    state.copy(codes = state.codes.unionByName(
      encode(increment, idCol, vecCol, state.coarse, state.pq)))

  /** Probe the standing index with `queries`: [[Pq.ivfAdcProbe]] over
    * the persisted codes — the query side (dist tables + probed cells)
    * broadcasts, the codes side streams, and only rows in probed cells
    * are scored. `(query_id, neighbor_id, adc_dist, rank)`.
    *
    * Cost shape: ~`|queries| * |corpus| * nProbe / nCells` ADC
    * scorings. The `nCells ≈ √N` sizing that keeps this at
    * `O(√N · nProbe)` is CODE, not guidance: [[derivedNCells]] is the
    * default for [[buildPortable]]/[[buildTrained]], so only an
    * explicit override can freeze a cell count while the corpus grows
    * (round 17 measured that degradation at 64× under a frozen
    * nCells=8 fixture across a 100× corpus).
    */
  def probe(state: State, queries: DataFrame, vecCol: String,
      queryIdCol: String, k: Int = 10, nProbe: Int = 4,
      excludeSelf: Boolean = false): DataFrame =
    Pq.ivfAdcProbe(state.coarse, state.pq, state.codes, queries,
      vecCol, queryIdCol, k, nProbe, excludeSelf)

  /** Persist: codes as parquet, models as the exact-text formats their
    * own save/load pairs use ([[Ivf.saveModel]] / [[Pq.saveCodebooks]]
    * — `java.lang.Double.toString` round-trips bit-identically), all
    * inside the [[Dedup.StateManifest]] crash-safe window (manifest
    * deleted first, recreated only after every part lands — a torn save
    * is never served). The manifest params DERIVE from the state, so
    * the manifest cannot state anything but the truth (a review pass
    * removed the caller-supplied params this require'd against). The
    * codes frame is localCheckpoint'ed first so saving into the
    * directory the state was LOADED from is safe.
    *
    * `dir` is LOCAL-FILESYSTEM scratch, like the four dedup state dirs:
    * the shared manifest codec is `java.io.File`-based, so although the
    * model writers go through the Hadoop FileSystem API, a remote
    * `hdfs://`/`s3://` dir would persist models the loader's local
    * existence checks can never see (state silently rebuilt every run).
    * Fail loudly instead of that.
    */
  def save(spark: SparkSession, state: State, dir: String): Unit = {
    requireLocalDir(dir)
    val codes = state.codes.localCheckpoint(true)
    Dedup.StateManifest.save(dir, state.params.encoded) {
      codes.write.mode("overwrite").parquet(s"$dir/codes")
      Ivf.saveModel(spark, state.coarse, s"$dir/centroids.txt")
      Pq.saveCodebooks(spark, state.pq, s"$dir/codebooks.txt")
    }
  }

  /** The manifest codec only sees the local filesystem (see [[save]]):
    * a URI-schemed dir would split the state across two filesystems and
    * read as forever-absent — the silent re-encode-every-run failure
    * this guard turns into an error.
    */
  private def requireLocalDir(dir: String): Unit =
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*"),
      s"AnnIndex state dir must be a local path (got $dir): the state " +
        "manifest codec is local-filesystem based — stage the index " +
        "locally, or sync the directory to remote storage as files")

  /** Load a state previously written by [[save]]: None when no complete
    * state exists (manifest + codes `_SUCCESS` + both model files);
    * loud when the stored parameters differ from `expect`; the loaded
    * model shapes are re-validated against the manifest (a hand-edited
    * model file cannot silently disagree with the declared geometry).
    */
  def load(spark: SparkSession, dir: String, expect: Params)
      : Option[State] = {
    requireLocalDir(dir)
    val modelFiles = Seq("centroids.txt", "codebooks.txt")
      .forall(f => new java.io.File(dir, f).exists())
    if (!Dedup.StateManifest.complete(dir, Seq("codes")) || !modelFiles) None
    else {
      Dedup.StateManifest.check(dir, "ann index", expect.encoded,
        "codes are only comparable under the models that produced them " +
          "— probing with a different geometry silently mis-ranks " +
          "every candidate")
      val st = State(
        Ivf.loadModel(spark, s"$dir/centroids.txt"),
        Pq.loadCodebooks(spark, s"$dir/codebooks.txt"),
        spark.read.parquet(s"$dir/codes"))
      require(st.params == expect,
        s"ann index at $dir: loaded model shapes ${st.params} disagree " +
          s"with the manifest $expect — the state files are inconsistent")
      Some(st)
    }
  }
}
