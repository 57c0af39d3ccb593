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
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(path)
    df.sparkSession.read.schema(df.schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
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

  /** Deterministic scratch dir for a round-trip artifact, keyed by the
    * source dir so scale factors never alias.
    */
  def scratchDir(prefix: String, sourceDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sourceDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_${prefix}_$digest"
  }
}
