package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the task
  * holding that key becomes the straggler. Salting splits each hot key's
  * rows across `saltFactor` sub-keys: the left (skewed) side gets a
  * deterministic salt derived from its row content, the right side is
  * replicated `saltFactor` times so every salted left row still finds its
  * match. AQE's runtime skew-join handles many cases automatically; explicit
  * salting remains the tool when a single key exceeds what one task can hold
  * even after AQE splitting, and for deterministic plans in tests.
  *
  * The salt is `xxhash64` of ALL left columns (mod saltFactor) — content-
  * derived, so re-runs produce identical partitioning (no `rand()`).
  */
object SkewJoin {

  def salted(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
    require(saltFactor > 1, "saltFactor must be > 1")
    // Replicating the right side is only sound for join types that never
    // emit an unmatched RIGHT row — a right/full outer would surface each
    // unmatched right row once per salt replica.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "_")),
      s"salted join supports inner/left/left_semi/left_anti, not $joinType")

    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(c => col(s"`$c`")): _*), lit(saltFactor))
        .cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))

    val cond: Column = (leftKeys.zip(rightKeys).map { case (a, b) =>
      saltedLeft(s"`$a`") === saltedRight(s"`$b`")
    } :+ (saltedLeft("_salt") === saltedRight("_salt"))).reduce(_ && _)

    saltedLeft.join(saltedRight, cond, joinType)
      .drop(saltedLeft("_salt")).drop(saltedRight("_salt"))
  }
}
