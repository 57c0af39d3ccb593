package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data-quality expectations — the validation half of an ETL
  * boundary. The reference validates implicitly (type coercion at the ffdf
  * boundary, `stopifnot` guards, `R/ffsql.R:979-980`); a 100 TB pipeline
  * needs the explicit form: declare named predicates, tag every row with
  * the rules it fails, and route clean rows onward while quarantining the
  * rest WITH their reasons — reject-and-continue, not fail-the-job.
  *
  * Scale: evaluation is one codegen'd projection per row (a `when` chain
  * inside `array_compact`) — row-local, no shuffle, no UDF; checking 1000
  * rules costs one pass. Cross-row expectations (uniqueness, referential
  * integrity) are aggregation problems, not row tags — use
  * [[graft.ext.Dedup.exact]] / anti-joins for those.
  */
object Expectations {

  /** One named expectation: `predicate` must hold for the row to pass.
    * A NULL predicate counts as a VIOLATION — under three-valued logic a
    * null-ridden row would otherwise pass every check silently, which is
    * the opposite of what a quality gate is for.
    */
  final case class Rule(name: String, predicate: Column)

  /** Append `outCol`: the array of failed rule names, in rule order (empty
    * array = clean row).
    */
  def check(df: DataFrame, rules: Seq[Rule],
      outCol: String = "violations"): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique")
    val tags = rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name)))
    df.withColumn(outCol, array_compact(array(tags: _*)))
  }

  /** Split into (pass, quarantine): pass rows have every rule holding (and
    * no extra column); quarantine rows carry their failed rule names in
    * `outCol`.
    */
  def split(df: DataFrame, rules: Seq[Rule],
      outCol: String = "violations"): (DataFrame, DataFrame) = {
    val checked = check(df, rules, outCol)
    (checked.where(size(col(outCol)) === 0).drop(outCol),
      checked.where(size(col(outCol)) > 0))
  }
}
