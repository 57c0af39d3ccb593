package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics over an immutable event log — the funnel /
  * cohort / transition reports a product pipeline runs nightly over the
  * same `(user, ts, type)` shape the reference's chunked DB reads feed
  * (`/root/reference/R/ffsql.R:108` reads exactly such logs; the reference
  * stops at loading them — these are the queries users load them FOR).
  *
  * Scale notes (all three): the only real shuffle is the per-user hash
  * exchange; every downstream aggregation either reuses that partitioning
  * (groupBy on the window's partition key plans with NO second exchange)
  * or reduces to a tiny stage-count/cohort-count frame. Nothing here is
  * proportional to users x stages on the wire — per-event work is one
  * sorted pass inside the user partition.
  */
object Behavior {

  /** Strictly-ordered funnel: for each prefix of `stages`, how many users
    * completed it IN ORDER — an event counts for stage k only if some
    * qualifying stage-(k-1) event happened strictly earlier in the user's
    * total event order `(ts, event_id)`. Ties in `ts` are broken by
    * `event_id`, so the result is deterministic and replayable in any
    * engine with the same window spec.
    *
    * Returns one row per stage: `(stage_idx, stage, n_users,
    * conv_from_first, conv_from_prev)`, conversions rounded to 6 dp.
    *
    * One user-partition window pass computes every stage's
    * "reached-strictly-before" running minimum (chained conditional mins
    * over the same `(partitionBy user, orderBy ts, id)` spec — one sort,
    * one exchange); the per-user reach flags then aggregate on the SAME
    * user key (no second exchange) and the stage summary is a 1-row
    * frame exploded tall, the [[Profile]] shape.
    */
  def funnel(
      events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val perUser = funnelReachTimes(events, stages, userCol, typeCol, tsCol, idCol)
    val counts = perUser.agg(
      count(when(col("__r0").isNotNull, 1)).as("__n0"),
      stages.indices.drop(1)
        .map(k => count(when(col(s"__r$k").isNotNull, 1)).as(s"__n$k")): _*)
    val tall = stages.zipWithIndex.map { case (st, k) =>
      struct(lit(k).cast("int").as("stage_idx"), lit(st).as("stage"),
        col(s"__n$k").as("n_users"),
        round(col(s"__n$k").cast("double") / col("__n0"), 6)
          .as("conv_from_first"),
        round(col(s"__n$k").cast("double") /
          col(s"__n${math.max(k - 1, 0)}"), 6).as("conv_from_prev"))
    }
    counts.select(explode(array(tall: _*)).as("f")).select("f.*")
  }

  /** Per-user earliest IN-ORDER reach timestamp of each stage
    * (`(userCol, __r0..__rN)`, null = never reached in order) — the
    * chained strictly-before window minima shared by [[funnel]] and
    * [[funnelLatency]].
    */
  private def funnelReachTimes(
      events: DataFrame, stages: Seq[String], userCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    val ord = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    // __qK = this event's ts if it advances stage K (right type AND stage
    // K-1 already reached strictly before); __pK = earliest qualifying
    // stage-K ts strictly before the current row (the chain carrier).
    var cur = events
    stages.zipWithIndex.foreach { case (st, k) =>
      val qualifies =
        if (k == 0) col(typeCol) === lit(st)
        else col(typeCol) === lit(st) && col(s"__p${k - 1}").isNotNull
      cur = cur.withColumn(s"__q$k", when(qualifies, col(tsCol)))
      if (k < stages.size - 1)
        cur = cur.withColumn(s"__p$k", min(col(s"__q$k")).over(before))
    }
    cur.groupBy(col(userCol))
      .agg(min(col("__q0")).as("__r0"),
        stages.indices.drop(1).map(k => min(col(s"__q$k")).as(s"__r$k")): _*)
  }

  /** Stage-to-stage conversion LATENCY: for users who completed stage k
    * in order, the seconds between their stage k-1 and stage k reach
    * times — count, decimal-exact mean and interpolated median per
    * transition: `(from_stage, to_stage, n_users, mean_sec, p50_sec)`,
    * doubles rounded to 6 dp. Shares [[funnel]]'s reach-time pass (one
    * user exchange); the latency aggregation is |stages|-1 branches over
    * the per-user frame.
    */
  def funnelLatency(
      events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(stages.size >= 2, "latency needs at least two stages")
    val perUser = funnelReachTimes(events, stages, userCol, typeCol, tsCol, idCol)
    val branches = (1 until stages.size).map { k =>
      perUser.where(col(s"__r$k").isNotNull)
        .select(lit(stages(k - 1)).as("from_stage"), lit(stages(k)).as("to_stage"),
          (unix_timestamp(col(s"__r$k")) - unix_timestamp(col(s"__r${k - 1}")))
            .as("__dur"))
    }
    branches.reduce(_ unionByName _)
      .groupBy(col("from_stage"), col("to_stage"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("__dur").cast("decimal(18,0)")).cast("double") /
          count(lit(1)), 6).as("mean_sec"),
        round(expr("percentile(__dur, 0.5)"), 6).as("p50_sec"))
  }

  /** Weekly cohort retention: users grouped by the epoch-aligned week of
    * their first event (`floor(epoch_sec / 604800)` — integer weeks, no
    * engine-specific week-start convention), counted as retained in every
    * later week they appear in. Returns `(cohort_week, week_offset,
    * n_users, retention)` with retention = n / cohort size at offset 0,
    * rounded to 6 dp.
    *
    * First-week is a per-user window min (one user exchange), the
    * `(user, offset)` de-dup is a distinct whose dominant key is the same
    * user hash, and the final count aggregates a frame bounded by
    * cohorts x weeks — tiny. The offset-0 denominator joins back by a
    * single-column window over that tiny frame, never over events.
    */
  def cohortRetention(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val week = (unix_timestamp(col(tsCol)) / lit(604800L)).cast("long")
    val perUserWeek = events
      .select(col(userCol).as("u"), week.as("w"))
      .withColumn("cohort_week", min(col("w")).over(Window.partitionBy(col("u"))))
      .select(col("u"), col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .distinct()
    val counts = perUserWeek.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = Window.partitionBy(col("cohort_week"))
    counts
      .withColumn("retention",
        round(col("n_users").cast("double") /
          max(when(col("week_offset") === 0, col("n_users"))).over(base), 6))
  }

  /** Rolling `windowDays`-day active users: for every epoch day `w`,
    * the number of distinct users active in `[w - windowDays + 1, w]` —
    * the sliding-window distinct (WAU/MAU) report. Returns
    * `(window_day, n_active)` for every window a user activity touches.
    *
    * The anti-pattern here is a per-day distinct over a range self-join;
    * the scale shape is: distinct `(user, day)` (one exchange, map-side
    * combined), explode each activity day into the `windowDays` windows
    * it serves (bounded x`windowDays` growth of the ALREADY-distinct
    * frame, not of events), de-dup `(user, window)`, count per window.
    */
  def rollingActive(
      events: DataFrame, windowDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, "windowDays must be at least 1")
    val day = (unix_timestamp(col(tsCol)) / lit(86400L)).cast("long")
    events.select(col(userCol).as("u"), day.as("d")).distinct()
      .select(col("u"),
        explode(sequence(col("d"), col("d") + (windowDays - 1))).as("window_day"))
      .distinct()
      .groupBy(col("window_day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Session-level co-occurrence LIFT between event types — the
    * market-basket report over behavioral sessions:
    * `lift(a,b) = P(a,b) / (P(a) P(b))` with probabilities over sessions,
    * computed as the exact integer ratio `n_ab * N / (n_a * n_b)` (no
    * logs, so the whole frame is engine-exact). Returns
    * `(type_a, type_b, n_ab, lift)` for `type_a < type_b`, lift rounded
    * to 6 dp.
    *
    * Sessions come from the same gap rule as the q30 family
    * ([[graft.streaming.EventStreams.withSessionIds]]), so lift and
    * sessionization can never diverge. The self-join is per session on
    * the DISTINCT (session, type) frame — at most |types| rows per
    * session — and the type totals broadcast back into the
    * |types|^2-row pair frame.
    */
  def sessionLift(
      events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val st = graft.streaming.EventStreams.withSessionIds(events, gapMinutes)
      .select(col("user_id"), col("session_id"), col("event_type"))
      .distinct()
    val total = st.select(col("user_id"), col("session_id")).distinct()
      .agg(count(lit(1)).as("__N"))
    val typeCounts = st.groupBy(col("event_type")).agg(count(lit(1)).as("__nt"))
    val pairs = st.select(col("user_id"), col("session_id"),
        col("event_type").as("type_a"))
      .join(st.select(col("user_id"), col("session_id"),
        col("event_type").as("type_b")), Seq("user_id", "session_id"))
      .where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(typeCounts.select(col("event_type").as("type_a"),
        col("__nt").as("__na"))), Seq("type_a"))
      .join(broadcast(typeCounts.select(col("event_type").as("type_b"),
        col("__nt").as("__nb"))), Seq("type_b"))
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        round(col("n_ab").cast("double") * col("__N") /
          (col("__na") * col("__nb")), 6).as("lift"))
  }

  /** CUSUM change-point report per group: over the daily totals of
    * `valCol`, the day where the cumulative deviation from the group mean
    * `S_i = sum_{j<=i}(x_j) - i * mean` peaks in magnitude — the classic
    * level-shift detector for metric monitoring. Returns one row per
    * group: `(groupCols..., n_days, change_day, s_at_change, daily_mean)`
    * with doubles rounded to 6 dp.
    *
    * Exactness: daily totals and their running cumulative are DECIMAL
    * (merge-order-free); `S_i` is one fixed double expression over the
    * exact cumulative, the exact total and the integer day index —
    * engine-reproducible, including the argmax (|S| desc, day tie-break).
    * Scale: one events-sized aggregation down to (group, day); every
    * window runs on that tiny daily frame.
    */
  def cusumChangePoint(
      events: DataFrame, groupCols: Seq[String], valCol: String,
      tsCol: String = "ts", scale: Int = 4): DataFrame =
    cusumFromDaily(dailyTotals(events, groupCols, valCol, tsCol, scale),
      groupCols)

  /** Decimal-exact daily totals of `valCol` per group — additive, so a
    * Complete-mode streaming aggregation accumulates the SAME frame (the
    * q209 streamed-monitor path).
    */
  def dailyTotals(
      events: DataFrame, groupCols: Seq[String], valCol: String,
      tsCol: String = "ts", scale: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val day = (unix_timestamp(col(tsCol)) / lit(86400L)).cast("long")
    events.where(col(valCol).isNotNull)
      .groupBy(groupCols.map(col) :+ day.as("d"): _*)
      .agg(sum(col(valCol).cast(s"decimal(18,$scale)")).as("x"))
  }

  /** The CUSUM scoring half of [[cusumChangePoint]] over a `(groupCols...,
    * d, x)` daily frame (batch-built or streamed): windows run on this
    * tiny frame only.
    */
  def cusumFromDaily(daily: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("d"))
    val wAll = Window.partitionBy(g: _*)
      .orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = daily
      .withColumn("__cum", sum(col("x")).over(wOrd))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__tot", sum(col("x")).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__mean", col("__tot").cast("double") / col("__n"))
      .withColumn("__s",
        col("__cum").cast("double") - col("__i") * col("__mean"))
    val ranked = scored.withColumn("__rn",
      row_number().over(Window.partitionBy(g: _*)
        .orderBy(abs(col("__s")).desc, col("d"))))
    ranked.where(col("__rn") === 1)
      .select(g ++ Seq(col("__n").as("n_days"), col("d").as("change_day"),
        // + 0.0 normalizes signed zero (flat series -> tiny negative S
        // rounds to -0.0 in DuckDB, +0.0 here; the q260 convention)
        (round(col("__s"), 6) + lit(0.0)).as("s_at_change"),
        round(col("__mean"), 6).as("daily_mean")): _*)
  }

  /** Two-variant A/B conversion readout: users split by `variantCol`
    * (exactly two values expected), conversion = the share of users with
    * at least one event satisfying the `conversion` predicate, and the
    * two-proportion z statistic
    * `(p_a - p_b) / sqrt(p(1-p)(1/n_a + 1/n_b))` with pooled `p` — the
    * standard experiment significance readout. Returns ONE row:
    * `(variant_a, n_a, conv_a, p_a, variant_b, n_b, conv_b, p_b,
    * p_diff, z_score)`, doubles rounded to 6 dp.
    *
    * Exactness: every count is an integer aggregate; the z statistic is
    * one fixed IEEE double tree over them — engine-reproducible, no
    * statistics library involved. One per-user aggregation (map-side
    * combined) and a two-row pivot; nothing else touches events.
    */
  def abTest(
      events: DataFrame, variantCol: String, conversion: Column,
      userCol: String = "user_id"): DataFrame = {
    val perUser = events.groupBy(col(userCol), col(variantCol).as("__v"))
      .agg(max(when(conversion, 1L).otherwise(0L)).as("__c"))
    val byVariant = perUser.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__k"))
    // bounded driver-side pivot: one row per DISTINCT VARIANT (and a
    // fail-fast if the split column doesn't have exactly two)
    val two = byVariant.orderBy(col("__v")).collect()
    require(two.length == 2, s"abTest needs exactly two variants, got ${two.length}")
    val spark = events.sparkSession
    import spark.implicits._
    val (va, na, ka) = (two(0).get(0).toString, two(0).getLong(1), two(0).getLong(2))
    val (vb, nb, kb) = (two(1).get(0).toString, two(1).getLong(1), two(1).getLong(2))
    // the z tree runs ON THE ENGINE over the literal counts so the double
    // expression is the same Catalyst evaluation the oracle replays
    Seq((va, na, ka, vb, nb, kb))
      .toDF("variant_a", "n_a", "conv_a", "variant_b", "n_b", "conv_b")
      .withColumn("p_a", col("conv_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("conv_b").cast("double") / col("n_b"))
      .withColumn("__p",
        (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b")))
      // + 0.0 normalizes signed zero on the two sign-capable readouts
      // (near-equal conversion rates round to -0.0 in DuckDB, +0.0 in
      // Spark's BigDecimal HALF_UP round; the q260 convention)
      .withColumn("p_diff", round(col("p_a") - col("p_b"), 6) + lit(0.0))
      // degenerate experiment (pooled p of 0 or 1): the z statistic is
      // undefined — report null rather than divide by a zero sqrt (which
      // ANSI mode correctly refuses to do silently)
      .withColumn("z_score",
        when(col("__p") * (lit(1.0) - col("__p")) === 0.0,
          lit(null).cast("double"))
          .otherwise(round((col("p_a") - col("p_b")) /
            sqrt(col("__p") * (lit(1.0) - col("__p")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6) +
            lit(0.0)))
      .select(col("variant_a"), col("n_a"), col("conv_a"), round(col("p_a"), 6).as("p_a"),
        col("variant_b"), col("n_b"), col("conv_b"), round(col("p_b"), 6).as("p_b"),
        col("p_diff"), col("z_score"))
  }

  /** CUPED-adjusted experiment readout (Deng, Xu, Kohavi & Walker, WSDM
    * 2013): per-user pre-period metric `x` (value sum before
    * `cutoffEpoch`) and post-period metric `y`; the pooled regression
    * `theta = cov(x,y)/var(x)` de-noises `y` into
    * `y' = y - theta*(x - xbar)`, and per-variant means of both are
    * reported side by side — the variance-reduction readout every
    * experimentation platform runs next to the raw one.
    *
    * Numeric contract: the per-user sums and all five pooled moments are
    * EXACT decimals; `theta`/`xbar` are one fixed double tree over them
    * (the [[graft.ops.Profile.trendOls]] convention); each user's
    * adjustment is per-row double math rounded to 6 dp; the per-variant
    * totals are decimal sums of those rounded values. Every stage
    * replays verbatim in SQL. Zero pre-period variance degenerates to
    * `theta = 0` (no adjustment) instead of a divide-by-zero.
    *
    * Scale: one user-level aggregation (map-side combinable), one
    * five-number moment row broadcast back, one variant-level
    * aggregation, then a bounded two-row pivot (the [[abTest]] shape).
    */
  def abTestCuped(
      events: DataFrame, variantCol: String, valCol: String,
      cutoffEpoch: Long, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val dec = "decimal(18,4)"
    val es = unix_timestamp(col(tsCol))
    val perUser = events.where(col(valCol).isNotNull)
      .groupBy(col(userCol), col(variantCol).as("variant"))
      .agg(
        sum(when(es < cutoffEpoch, col(valCol).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__x"),
        sum(when(es >= cutoffEpoch, col(valCol).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__y"))
    val m = perUser.agg(count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum((col("__x") * col("__x")).cast("decimal(38,8)")).as("sxx"),
      sum((col("__x") * col("__y")).cast("decimal(38,8)")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val n = col("n").cast("double")
    val varxn = n * d("sxx") - d("sx") * d("sx")
    val scal = m.select(
      when(varxn === 0.0, lit(0.0))
        .otherwise((n * d("sxy") - d("sx") * d("sy")) / varxn).as("__theta"),
      (d("sx") / n).as("__xbar"))
    val byVariant = perUser.crossJoin(broadcast(scal))
      .withColumn("__yadj", round(col("__y").cast("double") -
        col("__theta") * (col("__x").cast("double") - col("__xbar")), 6))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("nu"),
        // + 0.0 on every sign-capable rounded readout (generic valCol
        // can be negative; theta near zero for an uncorrelated covariate)
        (round(sum(col("__y")).cast("double") / count(lit(1)), 6) +
          lit(0.0)).as("mean_y"),
        (round(sum(col("__yadj").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6) + lit(0.0)).as("mean_adj"),
        (round(max(col("__theta")), 6) + lit(0.0)).as("th"))
    val two = byVariant.orderBy(col("variant")).collect()
    require(two.length == 2, s"abTestCuped needs exactly two variants, got ${two.length}")
    val spark = events.sparkSession
    import spark.implicits._
    Seq((two(0).get(0).toString, two(0).getLong(1), two(0).getDouble(2),
        two(0).getDouble(3),
        two(1).get(0).toString, two(1).getLong(1), two(1).getDouble(2),
        two(1).getDouble(3), two(0).getDouble(4)))
      .toDF("variant_a", "n_a", "mean_y_a", "mean_adj_a",
        "variant_b", "n_b", "mean_y_b", "mean_adj_b", "theta")
  }

  /** Top onboarding paths: the `topK` most common sequences of each
    * user's FIRST `k` event types (in `(ts, event_id)` order), joined
    * with `" > "` — the "how do users actually start" report. Users with
    * fewer than `k` events contribute their shorter path. Returns
    * `(path, n)` ordered by count desc, path asc.
    *
    * One user-window pass truncated to `k` rows per user, then a
    * fixed-width conditional pivot (`max(when(rn = i))` — codegen, no
    * per-user array building) and a paths-sized count.
    */
  def topPaths(
      events: DataFrame, k: Int = 3, topK: Int = 10,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(k >= 1 && topK >= 1, "k and topK must be positive")
    val ord = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val firstK = events.withColumn("__rn", row_number().over(ord))
      .where(col("__rn") <= k)
    val slots = (1 to k).map(i =>
      max(when(col("__rn") === i, col(typeCol))).as(s"__p$i"))
    firstK.groupBy(col(userCol)).agg(slots.head, slots.tail: _*)
      .select(concat_ws(" > ", (1 to k).map(i => col(s"__p$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(topK)
  }

  /** Daily bounce rate: of the sessions STARTING each epoch day, the
    * share that contain exactly one event. Returns `(day, n_sessions,
    * n_bounce, bounce_rate)` with the rate an exact integer ratio rounded
    * to 6 dp. Sessions come from the shared q30 gap rule; the summary is
    * one aggregation over the (user, session) frame.
    */
  def bounceRate(
      events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val sessions = graft.streaming.EventStreams
      .withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("__n"),
        (unix_timestamp(min(col("ts"))) / lit(86400L)).cast("long").as("day"))
    sessions.groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("__n") === 1, 1)).as("n_bounce"))
      .withColumn("bounce_rate",
        round(col("n_bounce").cast("double") / col("n_sessions"), 6))
  }

  /** Superhuman-rate screen over behavioral logs: users whose busiest
    * single minute holds more than `threshold` events — the cheap bot /
    * instrumentation-bug signal every log pipeline runs before trusting
    * per-user metrics. Returns `(userCol, peak_minute, n_peak)` for
    * offenders, peak chosen deterministically (highest count, then
    * earliest minute).
    *
    * One (user, minute) aggregation (map-side combined), then a per-user
    * struct-max on that already-collapsed frame — no window over events.
    */
  def rateAnomalies(
      events: DataFrame, threshold: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(threshold >= 1, "threshold must be at least 1")
    val minute = (unix_timestamp(col(tsCol)) / lit(60L)).cast("long")
    events.groupBy(col(userCol), minute.as("minute"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(userCol))
      .agg(max(struct(col("n"), (-col("minute")).as("negm"))).as("__pk"))
      .select(col(userCol),
        (-col("__pk.negm")).as("peak_minute"), col("__pk.n").as("n_peak"))
      .where(col("n_peak") > threshold)
  }

  /** Robust per-group outlier report: exact median and MAD (median
    * absolute deviation), and the count of values beyond
    * `cutoff * 1.4826 * MAD` of the median (1.4826 = the normal-
    * consistency constant, so `cutoff` reads in sigma units). The
    * median/MAD rule survives the very outliers a mean/stddev z-score is
    * skewed by — the standard robust screen for metric monitoring.
    * Returns `(groupCols..., n, median, mad, n_outliers)`, median/mad
    * rounded to 6 dp.
    *
    * Three passes over the input (median, MAD, outlier count), each ONE
    * map-side-combinable-or-percentile aggregation on O(groups) keys,
    * with the tiny per-group stats joined back by broadcast — no events-
    * sized shuffle beyond the three group exchanges. Exact `percentile`
    * holds a group's values in the aggregation buffer; for sketch-bounded
    * state at extreme group sizes use the [[graft.ext.Sketches]] quantile
    * path instead (the q37-vs-q154 tradeoff).
    */
  def madOutliers(
      df: DataFrame, groupCols: Seq[String], valCol: String,
      cutoff: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(cutoff > 0, "cutoff must be positive")
    val v = col(valCol)
    val base = df.where(v.isNotNull)
    val med = base.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valCol, 0.5)").as("__med"))
    val dev = base.join(broadcast(med), groupCols)
      .withColumn("__ad", abs(v - col("__med")))
    val mad = dev.groupBy(groupCols.map(col): _*)
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(max(col("__med")), 6).as("median"),
        round(max(col("__mad")), 6).as("mad"),
        count(when(col("__ad") > lit(cutoff) * lit(1.4826) * col("__mad"), 1))
          .as("n_outliers"))
  }

  /** First-order Markov transition report: counts and row-normalized
    * probabilities of `prev_type -> next_type` over each user's event
    * sequence in `(ts, event_id)` order. Returns `(prev_type, next_type,
    * n, prob)`, prob rounded to 6 dp; a user's first event has no
    * predecessor and contributes nothing.
    *
    * One lag window on the user exchange, then a map-side-combinable
    * count on at most |types|^2 keys; the row normalizer is a window over
    * that tiny frame.
    */
  def transitions(
      events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val ord = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(ord))
      .where(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("prob",
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))), 6))
  }
}
