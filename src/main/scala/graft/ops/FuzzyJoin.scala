package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage by edit distance — the approximate face of
  * [[MatchMerge]] (the reference's `matchmerge`, `R/matchmerge.R:21-58`,
  * joins on exact keys; dirty reference data needs tolerance to a typo).
  *
  * Blocking is the SymSpell deletion neighborhood (Garbe 2012; also the
  * candidate scheme of FastSS, Bocek et al. 2007): every string generates
  * itself plus its deletion variants up to `maxEdits` deletions, and two
  * strings at Levenshtein distance <= maxEdits ALWAYS share a variant.
  * The guarantee is the alignment decomposition: each substitution in an
  * optimal alignment deletes one char on BOTH sides, each insert/delete
  * deletes one char on ONE side — so <= maxEdits edits never needs more
  * than `maxEdits` deletions per side, and the shared interleaving string
  * sits in both neighborhoods. The converse does not hold ("ab" and "ba"
  * share variants at distance 2), so candidates are verified with the
  * exact `levenshtein` before emission — the LSH candidates+verify
  * pattern the dedup family uses. Because blocking is exact for
  * distance <= maxEdits, the verified output equals the brute-force
  * cross join's (which is how the q146/q153 oracles state it) without
  * ever planning one.
  *
  * Scale: variants explode row-locally (~L+1 rows per record at
  * maxEdits=1, ~L²/2 at maxEdits=2 — the standard SymSpell space trade),
  * the candidate stage is an EQUI-join on the variant string — bucketed,
  * shuffle-parallel, never all-pairs — and verification is a row-local
  * codegen'd `levenshtein` on the distinct candidate pairs, behind a
  * length-difference prune (`|len_l - len_r| <= maxEdits` is necessary,
  * and cuts the O(n·m) verify on obviously-far pairs). Variant blocks
  * are capped with `maxBlock` (the Dedup.maxBucket guard): a variant
  * that would emit more than `maxBlock` candidate pairs is dropped from
  * BOTH sides — a stop-gram in edit-distance space; at web scale a
  * handful of boilerplate names would otherwise produce a quadratic
  * block. Capped matches are MISSED matches (documented recall trade,
  * exactly Dedup.maxBucket's): raise the cap or pre-clean the hot value
  * when that matters.
  */
object FuzzyJoin {

  private def del1(s: Column): Column =
    transform(sequence(lit(1), length(s)), i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))

  /** `s` plus each distinct string at up to `maxEdits` (1 or 2)
    * single-character deletions.
    */
  private[graft] def delVariants(c: Column, maxEdits: Int): Column = {
    val d1 = del1(c)
    val base = concat(array(c), d1)
    val all =
      if (maxEdits == 1) base
      else concat(base, flatten(transform(d1, v =>
        // guard: sequence(1, 0) DESCENDS — an empty first-level variant
        // (1-char input) must not fabricate junk second-level entries
        when(length(v) === 0, array().cast("array<string>"))
          .otherwise(del1(v)))))
    array_distinct(all)
  }

  /** Variants whose left-count x right-count candidate volume exceeds
    * `maxBlock`: `(__fz_variant, __n_l, __n_r)`.
    */
  private def hotVariants(
      lv: DataFrame, rv: DataFrame, maxBlock: Int): DataFrame =
    lv.groupBy(col("__fz_variant")).agg(count(lit(1)).as("__n_l"))
      .join(rv.groupBy(col("__fz_variant")).agg(count(lit(1)).as("__n_r")),
        Seq("__fz_variant"))
      .where(col("__n_l") * col("__n_r") > maxBlock)

  /** Cap telemetry for the `maxBlock` stop-gram guard: the variants
    * [[symspellJoin]] drops under the SAME parameters, as
    * `(variant, n_left, n_right, candidates_dropped)` —
    * `candidates_dropped` is the candidate volume that block would have
    * joined (an upper bound on missed matches through it; a true pair
    * sharing a SURVIVING variant is still found). Empty output = the cap
    * cost nothing. The audit is the join's own guard aggregation
    * returned instead of anti-joined away — strictly cheaper than the
    * join it audits.
    */
  def symspellJoinAudit(
      left: DataFrame, idL: String, valL: String,
      right: DataFrame, idR: String, valR: String,
      maxEdits: Int = 1,
      maxBlock: Int = 1000): DataFrame = {
    require(maxEdits == 1 || maxEdits == 2, "maxEdits must be 1 or 2")
    def side(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(id), col(v))
        .where(col(v).isNotNull && length(col(v)) > 0)
        .select(col(id),
          explode(delVariants(col(v), maxEdits)).as("__fz_variant"))
    hotVariants(side(left, idL, valL), side(right, idR, valR), maxBlock)
      .select(col("__fz_variant").as("variant"),
        col("__n_l").as("n_left"), col("__n_r").as("n_right"),
        (col("__n_l") * col("__n_r")).as("candidates_dropped"))
  }

  /** Distance-(<=maxEdits) pairs `(leftId, leftVal, rightId, rightVal,
    * edit_distance)` between `left(idL, valL)` and `right(idR, valR)`.
    * `maxEdits` must be 1 or 2 (2 is the SymSpell standard for dirty-key
    * linkage; beyond 2 the neighborhood blow-up stops paying).
    * Null or EMPTY strings never match: nulls are filtered before the
    * variant explode, and empties are filtered too — without the filter an
    * empty string's deletion variant set is {""}, which every 1-char string
    * also generates, so "" would match "a" at distance 1 against the
    * contract.
    */
  def symspellJoin(
      left: DataFrame, idL: String, valL: String,
      right: DataFrame, idR: String, valR: String,
      maxEdits: Int = 1,
      maxBlock: Int = 1000): DataFrame = {
    require(idL != idR, "left and right id columns must have distinct names")
    require(maxEdits == 1 || maxEdits == 2, "maxEdits must be 1 or 2")
    def side(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(id), col(v))
        .where(col(v).isNotNull && length(col(v)) > 0)
        .select(col(id), col(v),
          explode(delVariants(col(v), maxEdits)).as("__fz_variant"))
    val lv = side(left, idL, valL)
    val rv = side(right, idR, valR)
    // stop-gram cap: variants whose total membership exceeds maxBlock
    // are dropped before the join (bounded agg, broadcast to both sides)
    val hot = hotVariants(lv, rv, maxBlock).select(col("__fz_variant"))
    val cand = lv.join(broadcast(hot), Seq("__fz_variant"), "left_anti")
      .join(rv.join(broadcast(hot), Seq("__fz_variant"), "left_anti"),
        Seq("__fz_variant"))
      .select(col(idL), col(valL), col(idR), col(valR))
      .distinct()
    cand
      // necessary condition, far cheaper than the O(n*m) levenshtein
      .where(abs(length(col(valL)) - length(col(valR))) <= maxEdits)
      .withColumn("edit_distance", levenshtein(col(valL), col(valR)))
      .where(col("edit_distance") <= maxEdits)
  }
}
