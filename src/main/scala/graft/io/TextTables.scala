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
