package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage by edit distance — the approximate face of
  * [[MatchMerge]] (the reference's `matchmerge`, `R/matchmerge.R:21-58`,
  * joins on exact keys; dirty reference data needs tolerance to a typo).
  *
  * Blocking is the SymSpell deletion neighborhood (Garbe 2012; also the
  * candidate scheme of FastSS, Bocek et al. 2007): every string generates
  * itself plus its `length` single-character-deletion variants, and two
  * strings at Levenshtein distance <= 1 ALWAYS share a variant (a
  * substitution shares the both-sides deletion, an insert/delete shares
  * the shorter string itself). The converse does not hold ("ab" and "ba"
  * share variants at distance 2), so candidates are verified with the
  * exact `levenshtein` before emission — the LSH candidates+verify
  * pattern the dedup family uses. Because the blocking guarantee is
  * exact for distance <= 1, the verified output equals the brute-force
  * cross join's (which is how q146's oracle states it) without ever
  * planning one.
  *
  * Scale: variants explode row-locally (length+1 rows per record), the
  * candidate stage is an EQUI-join on the variant string — bucketed,
  * shuffle-parallel, never all-pairs — and verification is a row-local
  * codegen'd `levenshtein` on the distinct candidate pairs. Variant
  * blocks are capped with `maxBlock` (the Dedup.maxBucket guard): a
  * variant that would emit more than `maxBlock` candidate pairs is
  * dropped from BOTH sides — a stop-gram in edit-distance space; at web
  * scale a handful of boilerplate names would otherwise produce a
  * quadratic block. Capped matches are MISSED matches (documented
  * recall trade, exactly Dedup.maxBucket's): raise the cap or pre-clean
  * the hot value when that matters.
  */
object FuzzyJoin {

  /** `s` plus each single-deletion of `s`, distinct. */
  private[graft] def delVariants(c: Column): Column =
    array_distinct(concat(array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c))))))

  /** Distance-(<=1) pairs `(leftId, leftVal, rightId, rightVal,
    * edit_distance)` between `left(idL, valL)` and `right(idR, valR)`.
    * Null or EMPTY strings never match: nulls are filtered before the
    * variant explode, and empties are filtered too — without the filter an
    * empty string's deletion variant set is {""}, which every 1-char string
    * also generates, so "" would match "a" at distance 1 against the
    * contract.
    */
  def symspellJoin(
      left: DataFrame, idL: String, valL: String,
      right: DataFrame, idR: String, valR: String,
      maxBlock: Int = 1000): DataFrame = {
    require(idL != idR, "left and right id columns must have distinct names")
    def side(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(id), col(v))
        .where(col(v).isNotNull && length(col(v)) > 0)
        .select(col(id), col(v),
          explode(delVariants(col(v))).as("__fz_variant"))
    val lv = side(left, idL, valL)
    val rv = side(right, idR, valR)
    // stop-gram cap: variants whose total membership exceeds maxBlock
    // are dropped before the join (bounded agg, broadcast to both sides)
    val hot = lv.groupBy(col("__fz_variant")).agg(count(lit(1)).as("__n_l"))
      .join(rv.groupBy(col("__fz_variant")).agg(count(lit(1)).as("__n_r")),
        Seq("__fz_variant"))
      .where(col("__n_l") * col("__n_r") > maxBlock)
      .select(col("__fz_variant"))
    val cand = lv.join(broadcast(hot), Seq("__fz_variant"), "left_anti")
      .join(rv.join(broadcast(hot), Seq("__fz_variant"), "left_anti"),
        Seq("__fz_variant"))
      .select(col(idL), col(valL), col(idR), col(valR))
      .distinct()
    cand
      .withColumn("edit_distance", levenshtein(col(valL), col(valR)))
      .where(col("edit_distance") <= 1)
  }
}
