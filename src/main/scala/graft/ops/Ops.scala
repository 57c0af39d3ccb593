package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MetadataBuilder, StringType}

/** DataFrame-level equivalents of the reference's column utilities.
  *
  * Reference semantics (ETLUtils v1.5, studied behaviorally):
  *  - `renameColumns` — reference `R/utils.R:71-80`
  *  - `recoder`       — reference `R/utils.R:24-32`
  *  - `factorise`     — reference `R/utils.R:101-137`; dictionary (factor)
  *    maintenance as in `R/ffsql.R:311-316` / `:1200-1207`
  *
  * The column transforms are thin, Catalyst-optimizable compositions of
  * built-in functions — no UDFs, no custom expressions. [[factorLevels]] is
  * the one driver-side action here (dictionary collect, cardinality-guarded).
  */
object Ops {

  /** Rename columns `from(i)` -> `to(i)`; all other columns untouched.
    * Reference: `R/utils.R:71-80` (length check at `:75-77`).
    */
  def renameColumns(df: DataFrame, from: Seq[String], to: Seq[String]): DataFrame = {
    require(from.length == to.length, "from and to should have the same length")
    val missing = from.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not found: ${missing.mkString(", ")}")
    df.withColumnsRenamed(from.zip(to).toMap)
  }

  /** Value-recode a column: values in `from` map to the corresponding `to`;
    * unseen values pass through unchanged (identity extension); null stays
    * null. Type-generic like the reference — `from`/`to` accept any literal
    * type (string, numeric, date, ...), matching `to[match(x, from)]` on an
    * arbitrary vector. Reference: `R/utils.R:24-32` (identity extension
    * `:25-30`, `match` probe `:31`).
    *
    * Implementation: a literal map + `element_at` + `coalesce` — a constant
    * hash lookup inside whole-stage codegen, no shuffle, no UDF.
    */
  def recode(c: Column, from: Seq[Any], to: Seq[Any]): Column = {
    require(from.length == to.length, "from and to should have the same length")
    if (from.isEmpty) c
    else {
      val m = map(from.zip(to).flatMap { case (f, t) => Seq(lit(f), lit(t)) }: _*)
      coalesce(element_at(m, c), c)
    }
  }

  /** recode, applied in place to a named column of a DataFrame. */
  def recodeCol(df: DataFrame, colName: String, from: Seq[Any], to: Seq[Any]): DataFrame =
    df.withColumn(colName, recode(col(colName), from, to))

  /** Distinct dictionary ("levels") of a string column, sorted.
    *
    * The reference's factor levels are first-seen ordered
    * (`R/ffsql.R:311-316`); a distributed engine has no deterministic
    * "first seen", so our canonical level order is lexicographic (stable
    * under any partitioning). The dictionary is assumed bounded (same
    * assumption the reference makes for factors).
    */
  def factorLevels(df: DataFrame, colName: String, maxLevels: Int = 65536): Seq[String] = {
    // The dictionary is collected to the driver, so an unbounded-cardinality
    // column (ids, free text) must fail fast instead of OOMing the driver at
    // scale: fetch maxLevels+1 and error if the extra row shows up.
    val rows = df.select(col(colName).cast(StringType)).where(col(colName).isNotNull)
      .distinct().orderBy(colName).limit(maxLevels + 1).collect()
    require(rows.length <= maxLevels,
      s"factorLevels('$colName'): over $maxLevels distinct values — not a " +
        "factor-shaped column; raise maxLevels only for a truly bounded dictionary")
    rows.map(_.getString(0)).toIndexedSeq
  }

  /** First-seen-ordered factor levels — the reference's level order
    * (`R/ffsql.R:311-316`), made distributed-deterministic by requiring an
    * explicit `orderCol` that defines "seen" (the reference's implicit row
    * order does not survive partitioning). Ties on `orderCol` break
    * lexicographically. Same driver-side cardinality guard as
    * [[factorLevels]].
    */
  def factorLevelsFirstSeen(
      df: DataFrame, colName: String, orderCol: String,
      maxLevels: Int = 65536): Seq[String] = {
    val rows = df.where(col(colName).isNotNull)
      .groupBy(col(colName).cast(StringType).as("value"))
      .agg(min(col(orderCol)).as("first_seen"))
      .orderBy(col("first_seen"), col("value"))
      .limit(maxLevels + 1).collect()
    require(rows.length <= maxLevels,
      s"factorLevelsFirstSeen('$colName'): over $maxLevels distinct values — " +
        "not a factor-shaped column")
    rows.map(_.getString(0)).toIndexedSeq
  }

  /** Attach factor ("dictionary") semantics to string columns via column
    * metadata, without changing the physical type (Parquet/Tungsten already
    * dictionary-encode strings physically).
    *
    * Reference: `factorise` `R/utils.R:101-137` — all character columns, plus
    * logical columns when `logicals=true` (`:117-123`); `levelsOverride`
    * mirrors the `levels` argument of the readers (`R/ffsql.R:191-200`);
    * `ordered` mirrors `colClasses="ordered"` (`R/ffsql.R:224-228`).
    */
  def factorise(
      df: DataFrame,
      cols: Seq[String] = Nil,
      logicals: Boolean = false,
      ordered: Boolean = false,
      levelsOverride: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val targets: Seq[String] =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect {
        case f if f.dataType == StringType => f.name
        case f if logicals && f.dataType == org.apache.spark.sql.types.BooleanType => f.name
      }.toIndexedSeq
    val projected = df.columns.map { name =>
      if (targets.contains(name)) {
        val levels = levelsOverride.getOrElse(name, factorLevels(df, name))
        val md = new MetadataBuilder()
          .putStringArray("graft.factor.levels", levels.toArray)
          .putBoolean("graft.factor.ordered", ordered)
          .build()
        col(name).cast(StringType).as(name, md)
      } else col(name)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Read back the factor levels attached by [[factorise]], if any. */
  def levelsOf(df: DataFrame, colName: String): Option[Seq[String]] = {
    val md = df.schema(colName).metadata
    if (md.contains("graft.factor.levels"))
      Some(md.getStringArray("graft.factor.levels").toIndexedSeq)
    else None
  }

  /** Ordered-factor comparison rank: position of the value in the level
    * sequence (1-based; null / unseen -> null). Enables `<`/`>` on ordered
    * factors as the reference does via ordered factor class
    * (`R/ffsql.R:224-228`). Pure `array_position` — codegen'd.
    */
  def levelRank(c: Column, levels: Seq[String]): Column = {
    val arr = array(levels.map(lit): _*)
    val pos = array_position(arr, c)
    when(pos === 0, lit(null)).otherwise(pos)
  }

  /** Top-`k` rows per group by `orderCols` (make the order TOTAL — add a
    * unique tiebreak column — or ranks are nondeterministic across runs).
    * Adds a 1-based `rnk` column.
    *
    * Scale: one row_number window partitioned on the group keys — a single
    * hash shuffle, per-group sort, maximally parallel. Spark has no
    * per-group TakeOrdered physical operator; for tiny k over huge groups
    * the window still sorts each whole group, which is the documented cost
    * of the declarative form (AQE splits skewed partitions).
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }
}
