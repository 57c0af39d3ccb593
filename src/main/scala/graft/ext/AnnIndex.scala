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
    * scorings. Size `nCells` to the corpus when BUILDING the index —
    * the standard dial is `nCells ≈ sqrt(|corpus|)` (FAISS IVF
    * guidance), which holds per-probe cost at `O(sqrt(N) * nProbe)`;
    * a cell count frozen while the corpus grows 100x degrades toward a
    * scan (measured: the q299 gate fixture deliberately freezes
    * nCells=8 for oracle replay, and its ScaleBench curve grows with
    * corpus x probe-slice — fixture geometry, not the plan).
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
