package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Corpus reporting artifacts — the "data card" tables a dataset release
  * ships alongside the data: per-slice volume, quality and duplication
  * summaries computed from the same native signal expressions the pipeline
  * filters with (one expression tree — the card cannot drift from the
  * gates it reports on).
  */
object Report {

  /** Per-`groupCols` corpus summary: document and token volume, how many
    * docs pass the Gopher quality rules, and how many share their exact
    * text with ANY other document corpus-wide (not just within the group —
    * cross-source duplication is precisely what a per-source card must
    * surface).
    *
    * Returns `(groupCols..., n_docs, sum_tokens, n_quality_pass,
    * n_dup_docs)`.
    *
    * Scale: two shuffles — the corpus-wide duplicate-size aggregation on
    * md5(text) (joined back on the same key, so the exchange is reused)
    * and the final group aggregation (map-side combinable; #groups rows).
    * Quality and token signals are the codegen'd one-pass expressions
    * ([[graft.functions.text.gopherReasons]]/[[graft.functions.text.tokenCount]]).
    *
    * `tokenCounter` swaps the token accounting: the default is the
    * whitespace [[graft.functions.text.tokenCount]]; pass
    * `Some(text.bpeTokenCount(col(textCol), merges))` (or any int
    * expression over the row) and `sum_tokens` becomes tokenizer-exact —
    * the card then reports the same token currency the training run
    * spends (q156 oracles this end-to-end).
    */
  def dataCard(
      df: DataFrame, groupCols: Seq[String], textCol: String,
      minStopwords: Int = 1,
      tokenCounter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val tokens = tokenCounter.getOrElse(text.tokenCount(col(textCol)))
    val dupSizes = df.select(md5(col(textCol)).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__dn"))
    df.withColumn("__h", md5(col(textCol)))
      .join(dupSizes, "__h")
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("sum_tokens"),
        count(when(
            text.gopherReasons(col(textCol), minStopwords = minStopwords) === 0,
            1)).as("n_quality_pass"),
        count(when(col("__dn") > 1, 1)).as("n_dup_docs"))
  }

  /** Token-distribution DRIFT between two corpus slices — the monitoring
    * question "did yesterday's crawl change vocabulary?" answered as the
    * top-`k` drifted tokens by two-sample chi-square contribution:
    * `(token, n_a, n_b, chi2_term)` with
    * `chi2_term = (a - eA)^2/eA + (b - eB)^2/eB` under the homogeneity
    * expectation `eX = (a + b) * NX / (NA + NB)`. Chi-square (not KL/JSD)
    * deliberately: it needs no logarithm, so every term is per-row IEEE
    * double arithmetic over exact integer counts, rounded to 6 dp —
    * counts AND scores hash-match the SQL replay (q185); a JSD built on
    * these same counts would be libm-bound and spec-only (the q167
    * split). Tokens absent from one side contribute their full one-sided
    * term (a = 0 or b = 0 is the interesting drift case, never dropped).
    *
    * Scale: one map-side-combinable count aggregation per side (the two
    * vocabulary shuffles ARE the operator), a full outer join on token —
    * co-partitioned with the counts it joins — a broadcast of the 1-row
    * totals frame, and a per-partition-heap global top-k
    * (`TakeOrderedAndProject`), never a full sort.
    */
  def tokenDrift(
      corpusA: DataFrame, corpusB: DataFrame, textCol: String,
      k: Int): DataFrame = {
    def counts(df: DataFrame, name: String) = df
      .select(explode(text.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(name))
    tokenDriftFromCounts(counts(corpusA, "n_a"), counts(corpusB, "n_b"), k)
  }

  /** Per-dimension EMBEDDING centroid drift between two slices — feature
    * drift for vector pipelines ("did the encoder or the corpus move?"):
    * `(dim, mean_a, mean_b, d2)` with `d2 = (mean_a - mean_b)^2`; summing
    * `d2` gives the squared euclidean centroid distance, and the per-dim
    * frame says WHICH dimensions moved.
    *
    * Float parity: each component is cast `float -> decimal(20,8)` (both
    * engines round the same exact binary value) and summed as DECIMAL — a
    * raw float/double sum across rows is merge-order-dependent and would
    * hash-drift; the means and `d2` are then per-row IEEE doubles rounded
    * to 6 dp, so the whole frame sits under the hash oracle (q188).
    * Vectors of the wrong length are excluded (they would silently skew
    * the dimensions they do carry).
    *
    * Scale: one posexplode + map-side-combinable decimal sum per side —
    * exchanges carry `dims` rows per partition; the join is dims x dims
    * tiny.
    */
  def embeddingDrift(
      sliceA: DataFrame, sliceB: DataFrame, vecCol: String,
      dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    def sums(df: DataFrame, nm: String) = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy(col("dim"))
      .agg(sum(col("__v").cast("decimal(20,8)")).as(s"__s_$nm"),
        count(lit(1)).as(s"__n_$nm"))
    val ma = col("__s_a").cast("double") / col("__n_a")
    val mb = col("__s_b").cast("double") / col("__n_b")
    sums(sliceA, "a").join(sums(sliceB, "b"), Seq("dim"))
      .select(col("dim"),
        // + 0.0: per-dim embedding means sit near zero by construction
        // — a tiny negative rounds to -0.0 in DuckDB (q260 convention)
        (round(ma, 6) + lit(0.0)).as("mean_a"),
        (round(mb, 6) + lit(0.0)).as("mean_b"),
        round((ma - mb) * (ma - mb), 6).as("d2"))
  }

  /** [[tokenDrift]] over PRE-AGGREGATED count frames `(token, n_a)` /
    * `(token, n_b)` — the entry point when one side's counts already exist
    * (a frozen baseline vocabulary table, a streaming Complete-mode count
    * aggregation, a prior card run). Token counting is order-insensitive,
    * so counts accumulated any way — including across micro-batches —
    * yield the identical drift frame (q187 streams through here under
    * q185's oracle verbatim).
    */
  def tokenDriftFromCounts(
      countsA: DataFrame, countsB: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val joined = countsA
      .join(countsB, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(
      sum(col("n_a")).as("__na"), sum(col("n_b")).as("__nb"))
    val na = col("__na").cast("double")
    val nb = col("__nb").cast("double")
    val n = na + nb
    val ab = (col("n_a") + col("n_b")).cast("double")
    val eA = ab * na / n
    val eB = ab * nb / n
    val da = col("n_a").cast("double") - eA
    val db = col("n_b").cast("double") - eB
    joined.crossJoin(broadcast(totals))
      .withColumn("chi2_term", round(da * da / eA + db * db / eB, 6))
      .select(col("token"), col("n_a"), col("n_b"), col("chi2_term"))
      .orderBy(col("chi2_term").desc, col("token"))
      .limit(k)
  }

  /** Per-group boilerplate PREFIX report — the template-header detector:
    * the longest common prefix of every text in a group equals
    * `LCP(min(text), max(text))` under lexicographic order (any
    * difference inside the group surfaces in that extreme pair), so the
    * whole report is ONE min/max aggregation plus an O(prefix-length)
    * scan of two strings per group — never a cross-doc comparison.
    * Returns `(groupCol, n_docs, lcp_len, prefix)` with `prefix` capped
    * at `maxPrefix` chars. Groups with null-only texts report length 0.
    *
    * The position scan is a bounded explode over the two extreme strings
    * (rows = min(len) per group), chosen over a char-fold lambda because
    * both engines replay `substr(a, k, 1) <> substr(b, k, 1)` verbatim.
    */
  def boilerplatePrefix(
      df: DataFrame, groupCol: String, textCol: String,
      maxPrefix: Int = 40): DataFrame = {
    require(maxPrefix >= 1, "maxPrefix must be positive")
    // O(groups) rows, checkpointed — it feeds both the position scan and
    // the final join, and each would otherwise replay the corpus agg
    val ext = df.where(col(textCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        min(col(textCol)).as("__a"), max(col(textCol)).as("__b"))
      .withColumn("__ml", least(length(col("__a")), length(col("__b"))))
      .localCheckpoint()
    // first differing position per group; groups absent here (extremes
    // agree over the full min-length, or zero-length extremes) fall back
    // to __ml via the left join
    val firstDiff = ext
      .where(col("__ml") >= 1)
      .select(col(groupCol), col("__a"), col("__b"),
        explode(sequence(lit(1), col("__ml"))).as("__k"))
      .where(col("__a").substr(col("__k"), lit(1)) =!=
        col("__b").substr(col("__k"), lit(1)))
      .groupBy(col(groupCol))
      .agg(min(col("__k")).as("__fd"))
    ext.join(firstDiff, Seq(groupCol), "left")
      .withColumn("lcp_len",
        coalesce(col("__fd") - 1, col("__ml")).cast("long"))
      .select(col(groupCol), col("n_docs"), col("lcp_len"),
        expr(s"substring(__a, 1, least(lcp_len, $maxPrefix))").as("prefix"))
  }

  /** Corpus content manifest — the dataset-versioning fingerprint a
    * reproducible training run records next to its data card: documents
    * hash-shard by `id mod shards`, each shard's digest is
    * `md5(concat of member digests in id order)`, and a root row
    * (`shard = -1`) chains the shard digests in shard order. Two corpus
    * versions are byte-identical iff the roots match; a diff localizes
    * to the shards whose digests moved. Everything is md5 over strings —
    * reproducible in any engine, any partitioning.
    *
    * Returns `(shard, n_docs, n_bytes, digest)`; null text hashes as the
    * empty string (id still contributes, so presence changes the digest).
    *
    * Scale: per-doc digests are row-local; each shard's ordered
    * concatenation is ONE group collect bounded by shard size (pick
    * `shards` so corpus/shards fits an executor — the manifest's natural
    * granularity is thousands of shards at petabyte scale); the root
    * reduces |shards| rows.
    */
  def manifest(
      df: DataFrame, idCol: String, textCol: String,
      shards: Int = 16): DataFrame = {
    require(shards >= 1, "shards must be positive")
    val digests = df.select(
      pmod(col(idCol), lit(shards.toLong)).cast("long").as("shard"),
      col(idCol).as("__id"),
      md5(concat(col(idCol).cast("string"), lit(":"),
        coalesce(col(textCol), lit("")))).as("__dg"),
      coalesce(octet_length(col(textCol)), lit(0)).cast("long").as("__bytes"))
    // O(shards) rows, checkpointed so the root row does not replay the
    // full corpus digest pass a second time
    val perShard = digests.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__bytes")).as("n_bytes"),
        md5(concat_ws("", transform(
          sort_array(collect_list(struct(col("__id"), col("__dg")))),
          e => e.getField("__dg")))).as("digest"))
      .localCheckpoint()
    val root = perShard.groupBy()
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_bytes")).as("n_bytes"),
        md5(concat_ws("", transform(
          sort_array(collect_list(struct(col("shard"), col("digest")))),
          e => e.getField("digest")))).as("digest"))
      .select(lit(-1L).as("shard"), col("n_docs"), col("n_bytes"), col("digest"))
    perShard.unionByName(root)
  }

  /** Diff of two corpus [[manifest]]s — "what changed between dataset
    * versions, and where": per shard (root included), `same` / `changed`
    * / `added` / `removed`, with both sides' doc counts. The point of
    * the digest chain: a petabyte diff reads 2 x (shards + 1) rows, and
    * only the `changed` shards need a row-level investigation.
    */
  def manifestDiff(
      oldDf: DataFrame, newDf: DataFrame, idCol: String, textCol: String,
      shards: Int = 16): DataFrame = {
    val a = manifest(oldDf, idCol, textCol, shards)
      .select(col("shard"), col("n_docs").as("n_docs_old"),
        col("digest").as("__da"))
    val b = manifest(newDf, idCol, textCol, shards)
      .select(col("shard"), col("n_docs").as("n_docs_new"),
        col("digest").as("__db"))
    a.join(b, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_docs_old"), lit(0L)).as("n_docs_old"),
        coalesce(col("n_docs_new"), lit(0L)).as("n_docs_new"),
        when(col("__da").isNull, lit("added"))
          .when(col("__db").isNull, lit("removed"))
          .when(col("__da") === col("__db"), lit("same"))
          .otherwise(lit("changed")).as("status"))
  }
}
