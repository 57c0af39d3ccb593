package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture resampling for training-data pipelines: downsample sources so
  * the surviving rows approach target mixture weights (e.g. 60% web, 30%
  * code, 10% reference) without replacement and without an RNG.
  *
  * Rates: with per-source counts `n_s` and normalized targets `w_s`, the
  * largest feasible total is `T = min_s(n_s / w_s)` (the binding source is
  * kept whole); source s keeps `w_s * T` rows. Row selection is the same
  * deterministic content-hash filter as [[Splits]] — keep iff the key's
  * 32-bit md5 falls under `rate_s * 2^32` — so the sample is reproducible
  * across runs/engines and consistent for duplicate content.
  *
  * Scale: one count-by-source aggregation (bounded by the number of
  * sources), then a single codegen'd hash+compare pass — no shuffle of the
  * data itself, no sampling coordination.
  */
object Mixtures {

  /** Keep a deterministic subset of `df` whose source mix approaches
    * `targetWeights` (missing sources are ignored; sources absent from the
    * map are dropped). `keyCol` drives the hash selection.
    */
  def sampleToMixture(
      df: DataFrame, sourceCol: String, keyCol: String,
      targetWeights: Map[String, Double]): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ > 0),
      "targetWeights must be non-empty and positive")
    val wNorm = {
      val tot = targetWeights.values.sum
      targetWeights.map { case (s, w) => s -> w / tot }
    }
    // cast to string so a non-string source column (int shard ids, enums)
    // keys the same map the string targetWeights use; null-source rows have
    // no target weight and are dropped below (threshold stays -1)
    val counts = df.groupBy(col(sourceCol).cast("string").as("__src")).count()
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    val present = wNorm.filter { case (s, _) => counts.contains(s) }
    require(present.nonEmpty, "no targetWeights source present in the data")
    // binding source kept whole; thresholds exact over the 32-bit space
    val total = present.map { case (s, w) => counts(s) / w }.min
    val space = 1L << 32
    val thresholds = present.map { case (s, w) =>
      s -> math.min(space, math.round(w * total / counts(s) * space))
    }
    val h = conv(substring(md5(col(keyCol)), 1, 8), 16, 10).cast("long")
    // null-source rows fall through every branch to the -1 default and are
    // dropped (h >= 0 always) — same fate as sources absent from the map
    val threshold: Column = thresholds.foldLeft(lit(-1L): Column) {
      case (acc, (s, t)) => when(col(sourceCol).cast("string") === s, lit(t)).otherwise(acc)
    }
    df.where(h < threshold)
  }

  /** Temperature-scaled source weights — the `p^alpha` sampling of
    * multilingual/multi-source LM training: with per-source counts `n_s`,
    * weight `w_s = n_s^alpha / sum(n^alpha)` (alpha < 1 flattens the
    * mixture toward low-resource sources), and an integer allocation of
    * `budget` rows per source via `round(budget * w_s)`.
    *
    * Returns `(sourceCol, n, weight, alloc)` — one row per source.
    *
    * Scale: ONE map-side-combinable count aggregation; every subsequent
    * operation runs on the aggregated frame (rows = #sources, which does
    * not grow with data volume), joined to the 1-row normalizer by
    * broadcast. Nothing per-document happens after the count.
    *
    * `alpha = 0.5` routes through `sqrt`, which IEEE 754 requires to be
    * correctly rounded — bit-identical across engines, so the output is
    * exactly oracle-able. General `pow` is only faithfully rounded and may
    * differ in the last ulp between libm implementations. The normalizer
    * `z = sum(n^alpha)` is summed as DECIMAL (the repo's `dsum`
    * convention): a raw double sum is merge-order-dependent, so two runs —
    * or two engines — could disagree by an ulp and flip a `round`.
    */
  def temperatureWeights(
      df: DataFrame, sourceCol: String, alpha: Double,
      budget: Long, mass: Option[Column] = None): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    require(budget > 0, "budget must be positive")
    def tempered(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else if (alpha == 1.0) c.cast("double")
      else pow(c, alpha)
    // `mass` swaps the size currency: None = rows; Some(c) = sum(c) —
    // pass a token-count expression (e.g. text.bpeTokenCount) and n,
    // weight and alloc all become token-denominated, still ONE
    // map-side-combinable aggregation
    val counts = df.groupBy(col(sourceCol)).agg(
      mass.fold(count(lit(1)))(m => sum(m.cast("long"))).as("n"))
    temperedAllocation(counts, sourceCol, tempered(col("n")), budget)
  }

  /** The weight/alloc projection shared by [[temperatureWeights]] and
    * every [[annealSchedule]] phase — ONE body, so the oracle-critical
    * normalizer/rounding formulas (exact decimal z sum, 6-dp weight,
    * 0-dp long alloc) cannot drift between the two operators. `leading`
    * prepends literal columns (the schedule's phase/alpha_q).
    */
  private def temperedAllocation(
      counts: DataFrame, sourceCol: String, tempered: Column,
      budget: Long, leading: Seq[Column] = Nil): DataFrame = {
    val z = counts.agg(
      sum(tempered.cast("decimal(28,6)")).cast("double").as("__z"))
    counts.crossJoin(broadcast(z))
      .select(leading ++ Seq(col(sourceCol), col("n"),
        round(tempered / col("__z"), 6).as("weight"),
        round(lit(budget) * tempered / col("__z"), 0)
          .cast("long").as("alloc")): _*)
  }

  /** Multi-phase ANNEALED mixture schedule — the data curriculum modern
    * pretraining runs ship (start near natural proportions, flatten
    * toward a tempered mix as training anneals; the per-phase reweighting
    * face of data-curriculum work a la DoReMi and the miniCPM-style decay
    * recipes): phase `p` of `phases` applies temperature
    * `alpha_p = quarters_p / 4`, with `quarters_p` the rounded linear
    * interpolation from `startQuarters` to `endQuarters`, and allocates
    * `budgetPerPhase` units under that phase's weights.
    *
    * Alphas are restricted to QUARTERS (1.0, 0.75, 0.5, 0.25) on
    * purpose: `n^(q/4)` factors into sqrt chains (`n^(3/4) =
    * sqrt(n)*sqrt(sqrt(n))`), and IEEE sqrt/multiply are correctly
    * rounded — so the tempered masses are bit-identical in any engine,
    * where an arbitrary `pow(n, 0.63)` is libm-dependent and would break
    * the oracle (the q86 sqrt convention, extended). The phase
    * interpolation itself is exact integer arithmetic.
    *
    * Returns `(phase, alpha_q, sourceCol, n, weight, alloc)` — one row
    * per (phase, source); `alpha_q` is the quarter count (4 = natural
    * proportions). Scale: ONE map-side-combinable aggregation for the
    * per-source masses; each phase is a projection over that O(sources)
    * frame against its broadcast normalizer — the corpus is scanned
    * once regardless of `phases`.
    */
  def annealSchedule(
      df: DataFrame, sourceCol: String, phases: Int,
      budgetPerPhase: Long, startQuarters: Int = 4, endQuarters: Int = 2,
      mass: Option[Column] = None): DataFrame = {
    require(phases >= 1, "phases must be positive")
    require(budgetPerPhase > 0, "budgetPerPhase must be positive")
    Seq(startQuarters, endQuarters).foreach(q =>
      require(q >= 1 && q <= 4, "quarters must be in 1..4"))
    val counts = df.groupBy(col(sourceCol)).agg(
      mass.fold(count(lit(1)))(m => sum(m.cast("long"))).as("n"))
      .localCheckpoint() // O(sources); each phase projects from it
    def tempered(c: Column, q: Int): Column = q match {
      case 4 => c.cast("double")
      case 3 => sqrt(c) * sqrt(sqrt(c))
      case 2 => sqrt(c)
      case 1 => sqrt(sqrt(c))
    }
    val rows = (1 to phases).map { p =>
      // rounded linear interpolation, exact integer arithmetic:
      // HALF_UP((start*(phases-p) + end*(p-1)) / (phases-1))
      val q =
        if (phases == 1) startQuarters
        else {
          val num = startQuarters.toLong * (phases - p) +
            endQuarters.toLong * (p - 1)
          val den = phases - 1L
          ((2 * num + den) / (2 * den)).toInt
        }
      temperedAllocation(counts, sourceCol, tempered(col("n"), q),
        budgetPerPhase, Seq(lit(p).as("phase"), lit(q).as("alpha_q")))
    }
    rows.reduce(_ unionByName _)
  }

  /** Capped proportional allocation with surplus redistribution — the
    * "waterfill" a data-constrained training run needs (Muennighoff et
    * al. 2023, arXiv:2305.16264: repeating a source beyond ~4 epochs
    * stops paying, so every source gets a hard cap): allocate `budget`
    * tokens across sources proportionally to `massCol`, but no source
    * beyond `capCol`; the surplus a capped source cannot absorb is
    * redistributed proportionally among the uncapped — recursively,
    * until nothing saturates. The classic exact solution: sort by
    * `cap/mass` ascending and walk; a source saturates iff its ratio is
    * at most the running `remaining_budget / remaining_mass`, and the
    * first non-saturating source freezes the water level `λ`; everyone
    * after gets `floor(mass * λ)`.
    *
    * Every comparison and division is EXACT BigInt arithmetic (rational
    * compares by cross-multiplication, floors by integer division) — no
    * double ever enters, so the allocation is bit-reproducible and
    * SQL-replayable at any magnitude (token masses at the 100 TB scale
    * overflow an i64 product; BigInt does not care). Equal-ratio ties
    * are walk-order-independent (the level never drops below a ratio it
    * already passed), broken deterministically by the key's string form.
    *
    * Input is the per-source summary frame (one row per source — e.g.
    * the output of [[temperatureWeights]] with a cap column added), NOT
    * the corpus: the walk is O(#sources) on the driver, the
    * [[applyTemperature]] bounded-collect pattern. Returns the input
    * columns plus `allocName`. Guarantees: `alloc <= cap` everywhere,
    * `sum(alloc) <= budget`, and `sum(alloc)` is the maximum achievable
    * under the caps (up to the per-source floors).
    */
  def capWaterfill(
      perSource: DataFrame, keyCol: String, massCol: String, capCol: String,
      budget: Long, allocName: String = "alloc"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val rows = perSource.select(
        col(keyCol).cast("string"), col(massCol).cast("long"),
        col(capCol).cast("long"))
      .collect().map { r =>
        require(!r.isNullAt(0), s"$keyCol must be non-null")
        require(!r.isNullAt(1) && r.getLong(1) > 0,
          s"$massCol must be positive for source '${r.getString(0)}'")
        require(!r.isNullAt(2) && r.getLong(2) >= 0,
          s"$capCol must be non-negative for source '${r.getString(0)}'")
        (r.getString(0), r.getLong(1), r.getLong(2))
      }
    require(rows.nonEmpty, "no sources found (empty input?)")
    require(rows.map(_._1).distinct.length == rows.length,
      s"$keyCol must be unique per row (aggregate to one row per source first)")
    // exact rational sort: cap_i/mass_i < cap_j/mass_j by cross-multiply
    val sorted = rows.sortWith { case ((ka, ma, ca), (kb, mb, cb)) =>
      val cmp = (BigInt(ca) * mb).compare(BigInt(cb) * ma)
      if (cmp != 0) cmp < 0 else ka < kb
    }
    var b = BigInt(budget)
    var w = sorted.map(x => BigInt(x._2)).sum
    var level: Option[(BigInt, BigInt)] = None // frozen (B*, W*) at frontier
    val alloc = sorted.map { case (k, m, c) =>
      k -> (level match {
        case Some((bs, ws)) => (BigInt(m) * bs / ws).toLong.min(c)
        case None =>
          if (BigInt(c) * w <= b * m) { b -= c; w -= m; c }
          else { level = Some((b, w)); (BigInt(m) * b / w).toLong.min(c) }
      })
    }.toMap
    val allocDf = perSource.sparkSession
      .createDataFrame(alloc.toSeq.map(x => (x._1, x._2)))
      .toDF("__wf_key", allocName)
    perSource.join(broadcast(allocDf),
        col(keyCol).cast("string") === col("__wf_key"), "left")
      .drop("__wf_key")
  }

  /** Materialize the TRAINING ORDER of a weighted mixture as a
    * deterministic low-discrepancy interleave — stride scheduling
    * (Waldspurger & Weihl, OSDI 1995) over sources: source s with integer
    * weight `w_s` emits its i-th row (in `keyCol` order) at virtual time
    * `(i - 1/2) / w_s`, and the schedule is all rows sorted by that time.
    * Every prefix of the output then holds source shares within one row
    * of the target weights — the "don't front-load one source" property an
    * epoch shuffle only delivers in expectation, here guaranteed, with no
    * RNG and no engine dependence.
    *
    * All integer math: times are scaled by `2 * lcm(weights)` to
    * `ord = (2i - 1) * (L / w_s)` (exact BIGINT), so the schedule is
    * SQL-replayable and sits under the hash oracle (q180). Ties (two
    * sources on the same tick) break by (source, key). Sources absent
    * from `weights` are dropped — the [[sampleToMixture]] contract. A
    * source that runs out of rows simply stops appearing (the
    * data-constrained tail; pair with [[capWaterfill]] to budget it).
    * Within-source order is `keyCol` ascending — pass a content-hash
    * column as the key to get a deterministic shuffle, or a curriculum
    * score to get ordered sampling.
    *
    * Scale: one per-source window for the rank (the single data shuffle;
    * a skewed giant source would swap this for the [[graft.ops.Ordinals]]
    * two-pass), then a range sort on `ord` — the sort IS the deliverable
    * (a total training order) and range partitioning spreads it; the
    * ordinal stamp is the partition-parallel [[graft.ops.Ordinals]] pass,
    * never a single-partition window. `lcm(weights)` is capped at 2^20 so
    * `ord` stays exact past 4e12 rows per source — express weights in
    * lowest terms.
    */
  def strideInterleave(
      df: DataFrame, sourceCol: String, keyCol: String,
      weights: Map[String, Long], posName: String = "pos"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    require(!df.columns.contains("__rn") && !df.columns.contains("__ord"),
      "input must not already have __rn/__ord columns")
    val L = weights.values.map(BigInt(_))
      .foldLeft(BigInt(1))((a, b) => a * b / a.gcd(b))
    require(L <= (1L << 20),
      s"lcm of weights is $L (cap 2^20) — express weights in lowest terms")
    val stride = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (s, w)) =>
        when(col(sourceCol).cast("string") === s, lit((L / w).toLong))
          .otherwise(acc)
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(keyCol))
    val ordered = df
      .where(col(sourceCol).cast("string").isin(weights.keys.toSeq: _*))
      .withColumn("__rn", row_number().over(win).cast("long"))
      .withColumn("__ord", (lit(2L) * col("__rn") - 1L) * stride)
      .orderBy(col("__ord"), col(sourceCol), col(keyCol))
    graft.ops.Ordinals.withRowOrdinal(ordered, posName, startAt = 1L)
      .drop("__rn", "__ord")
  }

  /** Materialize [[temperatureWeights]]: keep exactly `alloc_s` rows per
    * source, chosen by deterministic content-hash order (md5 of `keyCol` —
    * the same cross-engine hash as [[Splits]]), ranked 1..alloc_s in
    * `rankName`.
    *
    * Repetition contract (`upsample = true`): a source whose allocation
    * EXCEEDS its size — the main practical use of alpha < 1, where a
    * low-resource source is boosted above its row count — delivers its
    * shortfall by epoch-style repetition, the standard practice for
    * low-resource LM sources: every row appears `floor(alloc/n)` times and
    * the hash-order-first `alloc mod n` rows once more, tagged 0-based in
    * `epochName`, so exactly `alloc_s` rows come out per source and the
    * partial final epoch is a deterministic hash-order prefix (no RNG, no
    * engine dependence). Downsampled sources are unchanged by the flag
    * (every kept row is epoch 0). With `upsample = false` (the default,
    * and the pre-existing behavior) over-allocated sources silently
    * deliver only their `n_s` rows and no epoch column is added.
    *
    * Scale: the allocation table is #sources rows (collected once, bounded)
    * and broadcasts; row selection runs through the native
    * [[graft.plans.GroupTopK]] heap operator with k = max allocation, so a
    * giant source costs O(n log k) heap maintenance and the post-partial
    * shuffle carries at most k rows per (source, partition) — never a full
    * per-source sort. The epoch expansion is a row-local explode AFTER the
    * top-k (output rows = sum of allocations, never more). Requires
    * [[graft.GraftExtensions]] on the session.
    */
  def applyTemperature(
      df: DataFrame, sourceCol: String, keyCol: String, alpha: Double,
      budget: Long, rankName: String = "rnk", upsample: Boolean = false,
      epochName: String = "epoch"): DataFrame = {
    require(!df.columns.contains("__hk") && !df.columns.contains("__alloc") &&
        !df.columns.contains("__n"),
      "input must not already have __hk/__alloc/__n columns")
    // the allocation table is one row per source — collect it ONCE (the
    // heap size k must be a literal anyway) and rebroadcast the local rows,
    // instead of paying the count aggregation twice
    val tw = temperatureWeights(df, sourceCol, alpha, budget)
      .select(col(sourceCol), col("n"), col("alloc"))
    val allocRows = tw.collect()
    require(allocRows.nonEmpty, "no sources found (empty input?)")
    val maxAlloc = allocRows.map(_.getLong(2)).max
    require(maxAlloc > 0 && maxAlloc <= Int.MaxValue,
      s"max per-source allocation $maxAlloc outside (0, Int.MaxValue]")
    val allocs = df.sparkSession
      .createDataFrame(java.util.Arrays.asList(allocRows: _*), tw.schema)
      .withColumnRenamed("n", "__n").withColumnRenamed("alloc", "__alloc")
    val hashed = df.withColumn("__hk", md5(col(keyCol).cast("string")))
    val ranked = graft.plans.GroupTopK(hashed, Seq(sourceCol),
      Seq("__hk" -> true, keyCol -> true), k = maxAlloc.toInt, rankName)
      .join(broadcast(allocs), Seq(sourceCol))
    if (!upsample)
      ranked.where(col(rankName) <= col("__alloc"))
        .drop("__hk", "__alloc", "__n")
    else {
      // per-row epoch count: full epochs floor(alloc/n) for everyone, plus
      // one for the hash-order-first (alloc mod n) rows. Downsampled
      // sources land on 0-or-1 via the same formula (floor = 0, remainder
      // = alloc), so one expression covers both regimes and per-source
      // output is exactly alloc. The long/long `/` would be double
      // division; `div` keeps it integral and exact.
      val eRow = (expr("__alloc div __n") +
        when(col(rankName) <= col("__alloc") % col("__n"), lit(1L))
          .otherwise(lit(0L))).cast("int")
      ranked.withColumn("__epochs", eRow)
        .where(col("__epochs") > 0)
        .withColumn(epochName,
          explode(sequence(lit(0), col("__epochs") - 1, lit(1))))
        .drop("__hk", "__alloc", "__n", "__epochs")
    }
  }
}
