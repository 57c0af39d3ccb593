package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.expressions.GramHashExpressions
import graft.functions.vectors

/** Gate-recall audit (ADVICE round 3): the oracled dedup queries (q21, q23,
  * q52, q64) compare an LSH-candidate + exact-verify pipeline against a
  * brute-force SQL oracle — parity holds only while LSH recall on the
  * fixture is COMPLETE. These tests compute the exact pair sets on the
  * sf0.01 fixture (the correctness gate's scale factor) and assert the
  * engine output equals them, so a fixture regeneration that pushes a
  * qualifying pair below LSH recall fails HERE with a readable message
  * instead of as an opaque hash mismatch in the driver gate.
  */
class LshCoverageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // fixture root is machine-layout dependent — overridable, and the suite
  // cancels (rather than fails) where the gate fixtures don't exist
  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_GATE_DIR",
    sys.props.getOrElse("graft.gate.dir", "/root/testdata/sf0.01"))
  private def fixture(name: String): String = {
    val path = s"$sfDir/$name"
    assume(new java.io.File(path).exists(), s"gate fixture $path not found — skipping")
    path
  }
  private def docs = spark.read.parquet(fixture("documents.parquet"))
    .select(col("doc_id"), col("text"))
  private def emb = spark.read.parquet(fixture("embeddings.parquet"))
    .select(col("vec_id"), col("embedding"))

  /** Exact all-pairs jaccard >= threshold over hashed gram sets `(doc_id,
    * sh)`, via gram-level equi-join (no cross join; fine at fixture scale).
    */
  private def exactJaccardPairs(sets: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("g"))
    val sz = sets.select(col("doc_id"), size(col("sh")).as("s"))
    val inter = ex.as("a").join(ex.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_l"), $"b.doc_id".as("id_r"))
      .agg(count(lit(1)).as("ic"))
    inter
      .join(sz.select(col("doc_id").as("id_l"), col("s").as("sl")), Seq("id_l"))
      .join(sz.select(col("doc_id").as("id_r"), col("s").as("sr")), Seq("id_r"))
      .where(col("ic").cast("double") / (col("sl") + col("sr") - col("ic")) >= threshold)
      .select(col("id_l"), col("id_r"))
      .as[(Long, Long)].collect().toSet
  }

  test("q21/q64 gate: minhash LSH recalls every exact word-shingle pair at j>=0.6") {
    val sets = docs.select(col("doc_id"),
      GramHashExpressions.wordShingleHashSet(col("text"), 3).as("sh"))
    val exact = exactJaccardPairs(sets, 0.6)
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.6)
      .select(col("id_l"), col("id_r")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture lost its planted near-dups — gate is vacuous")
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).take(5)} / emitted extra ${(lsh -- exact).take(5)}")
  }

  test("q23 gate: char-5-gram LSH recalls every exact pair at j>=0.8") {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val sets = docs.select(col("doc_id"),
      GramHashExpressions.charNgramHashSet(norm, 5).as("sh"))
    val exact = exactJaccardPairs(sets, 0.8)
    val lsh = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.8)
      .select(col("id_l"), col("id_r")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture lost its planted near-dups — gate is vacuous")
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).take(5)} / emitted extra ${(lsh -- exact).take(5)}")
  }

  test("q52 gate: hyperplane LSH recalls every exact cosine pair at c>=0.95") {
    // q52's planted set: corpus + id-shifted exact copies
    val planted = emb.union(
      emb.select((col("vec_id") + lit(100000L)).as("vec_id"), col("embedding")))
    val l = planted.select(col("vec_id").as("id_l"), col("embedding").as("v_l"))
    val r = planted.select(col("vec_id").as("id_r"), col("embedding").as("v_r"))
    // brute force is the TEST's job only — the operator itself never cross-joins
    val exact = l.crossJoin(r).where(col("id_l") < col("id_r"))
      .where(vectors.cosine(col("v_l"), col("v_r")) >= 0.95)
      .select(col("id_l"), col("id_r")).as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairs(planted, "vec_id", "embedding",
      dim = 64, threshold = 0.95, tables = 4, bits = 12)
      .select(col("id_l"), col("id_r")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture lost its planted duplicates — gate is vacuous")
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).take(5)} / emitted extra ${(lsh -- exact).take(5)}")
  }
}
