package graft.io

import org.apache.spark.sql.DataFrame

/** Text-format interchange (CSV with RFC-4180 quoting, JSON Lines) — the
  * flat-file counterpart of [[ReadSql]]/[[WriteSql]]: the reference moves
  * tables across a DB boundary; real pipelines also move them through text
  * dumps, and the contract is the same — a write/read round trip must be
  * lossless given the schema.
  *
  * Both readers take an EXPLICIT schema (the reference's inferred-then-frozen
  * model, SURVEY §1.2, with the inference step made explicit): schema-on-read
  * inference over 100 TB means a full extra pass and type flapping between
  * runs; a declared StructType costs neither.
  */
object TextTables {

  /** Write `df` as headered CSV with RFC-4180 quoting (quotes doubled, not
    * backslash-escaped — the dialect every SQL COPY/spreadsheet agrees on),
    * then read it back with the SAME schema. Embedded newlines survive via
    * `multiLine`; note multiLine CSV files are not splittable (one task per
    * file), so the writer's partitioning decides read parallelism — fine
    * here, a consideration for 100 TB dumps (prefer many medium files).
    */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    // nullValue sentinel: bare CSV collapses NULL and "" into the same
    // empty field (the classic lossy case). With \N as the null marker,
    // empty strings keep their default quoted-empty encoding and the two
    // round-trip distinctly. (Do NOT override read-side emptyValue — it is
    // the VALUE substituted for parsed empty fields, not a marker.)
    // KNOWN EXCLUSION: a string field whose VALUE is exactly the sentinel
    // ("\N") reads back as NULL — Spark's parser compares nullValue to the
    // unquoted token, so even quoteAll cannot keep them distinct (verified:
    // quoted "\N" also parses to null). Data that can legitimately contain
    // \N needs the JSONL round trip, which has no in-band null marker.
    val common = Map(
      "header" -> "true", "escape" -> "\"", "nullValue" -> "\\N")
    df.write.mode("overwrite").options(common).csv(path)
    df.sparkSession.read.schema(df.schema)
      .options(common).option("multiLine", "true")
      .csv(path)
  }

  /** Write `df` as JSON Lines and read it back with the same schema. JSONL
    * stays line-splittable (JSON escapes newlines), so unlike multiline CSV
    * a single huge file still reads in parallel.
    */
  def jsonlRoundTrip(df: DataFrame, path: String): DataFrame = {
    // default timestampFormat truncates to milliseconds; TimestampType is
    // microsecond-precision, so spell out the 6-digit fraction
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    df.write.mode("overwrite").option("timestampFormat", tsFmt).json(path)
    df.sparkSession.read.schema(df.schema)
      .option("timestampFormat", tsFmt).json(path)
  }

  /** Columnar-interchange round trip through ORC (Spark's native
    * reader/writer — no extra dependency): schema-preserving and lossless
    * for every type in the battery, including microsecond timestamps and
    * doubles, so the oracle is the SOURCE table itself. The third
    * interchange face next to CSV (lossy corners documented above) and
    * JSONL (lossless text).
    */
  def orcRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }

  /** The explicit schema an external embedding dump enters under:
    * `(idCol bigint, vecCol array<float>)` — float32 on purpose (the
    * storage format embedding pipelines actually ship; doubling the
    * width on ingest would double 100 TB of vector bytes for no
    * information gain).
    */
  def embeddingSchema(
      idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField(idCol, LongType),
      StructField(vecCol, ArrayType(FloatType))))
  }

  /** Read an external embedding dump in JSONL form (`{"vec_id": 7,
    * "embedding": [0.1, ...]}` per line) under the explicit
    * [[embeddingSchema]] — the entry gate for embedding dumps produced
    * outside the engine. Float32 components survive EXACTLY: JSON
    * numbers written as shortest-round-trip decimals (Java
    * `Float.toString` guarantees re-parse identity) parse back to the
    * identical float bits, so the JSONL face is lossless for vectors,
    * unlike CSV (no array encoding) — the q96/q97 contract extended to
    * the vector column.
    *
    * Corrupt rows degrade to null, never fail the job (the multimodal
    * corrupt-input convention): a malformed JSON line nulls the whole
    * row (PERMISSIVE), a non-numeric array element nulls the vector,
    * and with `dim` set, a wrong-length vector nulls too (a silently
    * truncated dump must not feed half a vector to a cosine).
    */
  def readEmbeddingJsonl(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = spark.read.schema(embeddingSchema(idCol, vecCol)).json(path)
    // an EXPLICIT JSON null element is schema-valid under array<float>
    // (containsNull), so it would slip past a size-only guard and feed a
    // null coordinate to downstream dots/cosines (silent mis-ranking) —
    // null the whole vector, the same fate as a non-numeric element
    val noNullElems = when(
      !exists(col(vecCol), e => e.isNull), col(vecCol))
    val cleaned = raw.withColumn(vecCol, noNullElems)
    dim match {
      case Some(k) => cleaned.withColumn(vecCol,
        when(size(col(vecCol)) === k, col(vecCol)))
      case None => cleaned
    }
  }

  /** Write an embedding frame as JSONL and read it back under the
    * explicit schema — the lossless-dump proof for the vector column
    * (the [[jsonlRoundTrip]] contract with [[readEmbeddingJsonl]] as the
    * read side, so the round trip exercises the exact code path an
    * external dump enters through).
    */
  def embeddingJsonlRoundTrip(
      df: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    df.select(df.col(idCol), df.col(vecCol))
      .write.mode("overwrite").json(path)
    readEmbeddingJsonl(df.sparkSession, path, idCol, vecCol)
  }

  /** Deterministic scratch dir for a round-trip artifact, keyed by the
    * source dir so scale factors never alias. `salt` folds extra identity
    * into the key — e.g. the source file's (size, mtime) for consumers that
    * SKIP rewriting when the dir exists, so regenerated fixture data at the
    * same path can never serve a stale layout.
    */
  def scratchDir(prefix: String, sourceDir: String, salt: String = ""): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((sourceDir + "\u0000" + salt)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_${prefix}_$digest"
  }

  /** A (size, mtime) fingerprint of a file or directory tree root — the
    * `salt` ingredient for [[scratchDir]] consumers with skip-if-exists
    * semantics.
    */
  def sourceFingerprint(path: String): String = {
    val f = new java.io.File(path)
    s"${f.length}:${f.lastModified}"
  }
}
