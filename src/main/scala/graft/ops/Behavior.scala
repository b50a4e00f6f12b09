package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort/path analytics over an event log — with [[Funnel]], the
  * product-analytics staples a user of the reference's seven use cases
  * reaches for next. Both are pure aggregate shapes that scale: no
  * driver loops, no per-user collections.
  */
object Behavior {

  /** Weekly cohort retention: users cohort by the ISO week of their
    * first `anchorType` event; a cohort member is retained in relative
    * week w if ANY event of theirs falls in [cohort_week + w weeks,
    * cohort_week + w+1 weeks). Output one row per (cohort_week,
    * week_n) with the active count, cohort size, and their ratio —
    * the classic retention triangle.
    *
    * Shape: one min-aggregate for the anchors (shuffle on user), one
    * broadcast-eligible join back to the events, two count-distinct
    * aggregates — work ∝ events, state ∝ users + cohort cells. Week
    * arithmetic is integer epoch math (floor of the second delta /
    * 604800), deterministic across engines; date_trunc('week') is ISO
    * Monday in both Spark and DuckDB.
    */
  def cohortRetention(events: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, anchorType: String): DataFrame = {
    val e = events.select(col(userCol).as("user_id"),
      col(typeCol).as("step"), col(tsCol).as("ts"))
    val anchors = e.filter(col("step") === anchorType)
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = anchors.groupBy(col("cohort_week"))
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    val active = e.join(anchors, "user_id")
      .withColumn("week_n",
        floor((unix_timestamp(col("ts")) - unix_timestamp(col("cohort_week")))
          / 604800L))
      .filter(col("week_n") >= 0)
      .groupBy(col("cohort_week"), col("week_n"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    active.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_n"), col("active_users"),
        col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 6)
          .as("retention_rate"))
  }

  /** First-order event-type transition counts (the Markov/path-analysis
    * matrix): per user, events ordered by (ts, idCol) — the id breaks
    * timestamp ties deterministically — adjacent pairs counted over the
    * whole log. One window (hash shuffle on user + per-partition sort;
    * Spark spills the sort, no per-user buffering) + one hash
    * aggregate.
    */
  def transitionCounts(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"), col(tsCol), col(idCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The gap-rule session-id stage shared by [[sessionSequences]] and
    * [[bounceRate]] (ONE copy of the boundary rule — the
    * transitionPairs single-edge-contract discipline): a session
    * starts where the floored-epoch gap to the previous event exceeds
    * `gapS` (strictly — a gap of exactly gapS stays in-session).
    * Expects (user_id, ts, eid, …); appends `s_id`.
    */
  private def withSessionIds(rows: DataFrame, gapS: Long): DataFrame = {
    require(gapS > 0, "gapS must be positive")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("eid"))
    rows
      .withColumn("_new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_timestamp(col("ts")) -
            unix_timestamp(lag(col("ts"), 1).over(w)) > gapS, 1L)
          .otherwise(0L))
      .withColumn("s_id", sum(col("_new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_s")
  }

  /** Behavior log → SEQUENTIAL training data: one row per (user,
    * session) with the session's item sequence in event order — the
    * assembly step for next-item-prediction / session-based
    * recommendation corpora (and the bridge from the reference's
    * behavior analytics to the training-data side of this engine).
    * Sessions split on inactivity gaps > `gapS` seconds (computed on
    * floored epoch seconds so any engine reproduces the boundary);
    * events order by (`tsCol`, `idCol`) — a total order, so sequences
    * are engine-deterministic.
    *
    * Shape: two Windows over the per-user partition (gap flag via lag,
    * session id via running sum — user_id is high-cardinality, so the
    * partition sort distributes; this is the q76 cost class, NOT the
    * low-cardinality WindowExec trap) + one hash aggregate whose
    * in-row array_sort builds the sequence (a session's events fit a
    * row by construction — sessions are gap-bounded).
    *
    * Output: (user_id, s_id, session_start_s, n_items, item_seq).
    */
  def sessionSequences(events: DataFrame, userCol: String, itemCol: String,
                       tsCol: String, idCol: String,
                       gapS: Long = 1800L): DataFrame = {
    withSessionIds(
      events
        .filter(col(itemCol).isNotNull)
        .select(col(userCol).as("user_id"), col(tsCol).as("ts"),
          col(idCol).as("eid"), col(itemCol).as("item")),
      gapS)
      .groupBy(col("user_id"), col("s_id"))
      .agg(min(unix_timestamp(col("ts"))).as("session_start_s"),
        count(lit(1)).as("n_items"),
        expr("""array_join(transform(
               |  array_sort(collect_list(named_struct('ts', ts, 'eid', eid, 'item', item))),
               |  s -> cast(s.item as string)), ' ')""".stripMargin)
          .as("item_seq"))
  }

  /** Item-affinity LIFT (market-basket over the behavior log — the
    * "users who touched A also touched B" staple): for item pairs
    * co-touched by ≥ `minBoth` distinct users,
    * lift = N·n_ab / (n_a·n_b) — >1 means the items co-occur more
    * than independence predicts. Pure integer counts with ONE rounded
    * division, so the whole frame replays relationally.
    *
    * Scale shape: everything reduces to the DISTINCT (user, item)
    * frame first; pair generation is a self-equi-join on user, so
    * cost ∝ Σ per-user items² — the LSH-bucket cost class. Users
    * touching more than `maxItemsPerUser` distinct items (bots,
    * crawlers — the same degenerate mass that breaks every
    * market-basket job) are EXCLUDED before pairing, bounding the
    * quadratic term; totals and N are computed on the same post-cap
    * frame so lift stays internally consistent. The cap is OBSERVABLE,
    * not silent (the lshOversizedBuckets rule): [[itemLiftCappedUsers]]
    * lists exactly who the cap dropped and how big they were, so a cap
    * change is a measured decision.
    */
  def itemLift(events: DataFrame, userCol: String, itemCol: String,
               minBoth: Long = 2, maxItemsPerUser: Int = 1000): DataFrame = {
    require(minBoth >= 1, "minBoth must be >= 1")
    require(maxItemsPerUser >= 2, "maxItemsPerUser must be >= 2")
    val ui0 = events.select(col(userCol).as("u"), col(itemCol).as("item"))
      .filter(col("item").isNotNull).distinct()
    val keep = ui0.groupBy(col("u")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxItemsPerUser).select(col("u"))
    val ui = ui0.join(keep, Seq("u"), "left_semi")
    val totals = ui.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val nu = ui.agg(countDistinct(col("u")).as("n_users"))
    val pairs = ui.select(col("u"), col("item").as("item_a"))
      .join(ui.select(col("u"), col("item").as("item_b")), Seq("u"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minBoth)
    pairs
      .join(totals.select(col("item").as("item_a"), col("n").as("n_a")),
        "item_a")
      .join(totals.select(col("item").as("item_b"), col("n").as("n_b")),
        "item_b")
      .crossJoin(broadcast(nu)) // 1-row scalar broadcast (the q63 shape)
      .select(col("item_a"), col("item_b"), col("n_both"), col("n_a"),
        col("n_b"),
        round(col("n_both").cast("double") * col("n_users").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("lift"))
  }

  /** The observability companion of [[itemLift]]'s bot cap (the
    * lshOversizedBuckets pattern — an invisible cap is a silent
    * result change): the users the cap EXCLUDES, with their
    * distinct-item counts. Run it with the production cap to audit
    * what the lift numbers are blind to.
    */
  def itemLiftCappedUsers(events: DataFrame, userCol: String,
                          itemCol: String,
                          maxItemsPerUser: Int = 1000): DataFrame =
    events.select(col(userCol).as("user_id"), col(itemCol).as("item"))
      .filter(col("item").isNotNull).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > maxItemsPerUser)

  /** Conversion ATTRIBUTION over the behavior log (the analytics
    * staple adjacent to the reference's channel-marketing jobs,
    * market-analysis/.../AdStatisticsByGeo.scala:52-60 /
    * AppMarketingByChannel.scala): each conversion credits the
    * marketing touch that preceded it within a lookback window —
    * LAST-touch (the latest touch at-or-before, the q41 as-of
    * semantics with a horizon) and FIRST-touch (the earliest inside
    * the window) in one pass. Ties on touch timestamp break by touch
    * id (max for last, min for first — deterministic, the as-of
    * dedupe convention); conversions with no touch in the window
    * attribute to "(none)" with touch id −1.
    *
    * Shape: one equi-join on the user key (the window predicate
    * filters inside the join — per-user touch lists bound the fan-out,
    * NOT a cross join), then ONE hash aggregate taking both argmaxes
    * as max/min(struct(ts, id, channel)) — no Window, no per-user
    * sort, so the plan survives a 100 TB event log; the left join
    * back re-admits zero-touch conversions.
    *
    * `convs`: (keyCol, convIdCol, convTsCol); `touches`: (keyCol,
    * touchIdCol, touchTsCol, channelCol).
    */
  def attribution(convs: DataFrame, touches: DataFrame, keyCol: String,
                  convIdCol: String, convTsCol: String, touchIdCol: String,
                  touchTsCol: String, channelCol: String,
                  windowSec: Long): DataFrame = {
    require(windowSec > 0, "lookback window must be positive")
    val c = convs.select(col(keyCol), col(convIdCol).as("conv_id"),
      col(convTsCol).as("conv_ts"))
    val t = touches.select(col(keyCol), col(touchIdCol).as("_tid"),
      col(touchTsCol).as("_tts"), col(channelCol).as("_ch"))
    val agg = c.join(t, keyCol)
      .filter(col("_tts") <= col("conv_ts") &&
        col("_tts") >= col("conv_ts") - expr(s"INTERVAL $windowSec SECOND"))
      .groupBy(col(keyCol), col("conv_id"), col("conv_ts"))
      .agg(count(lit(1)).as("n_touches"),
        max(struct(col("_tts"), col("_tid"), col("_ch"))).as("_lt"),
        min(struct(col("_tts"), col("_tid"), col("_ch"))).as("_ft"))
    c.join(agg, Seq(keyCol, "conv_id", "conv_ts"), "left")
      .select(col(keyCol), col("conv_id"), col("conv_ts"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("_lt._ch"), lit("(none)")).as("last_channel"),
        coalesce(col("_lt._tid"), lit(-1L)).as("last_touch_id"),
        coalesce(col("_ft._ch"), lit("(none)")).as("first_channel"),
        coalesce(col("_ft._tid"), lit(-1L)).as("first_touch_id"))
  }

  /** The window predicate every attribution form shares — also the
    * time-range half of the STREAMING pairs join condition, so batch
    * and stream cannot disagree on what "inside the window" means.
    */
  private def inWindow(windowSec: Long): Column =
    col("touch_ts") <= col("conv_ts") &&
      col("touch_ts") >= col("conv_ts") -
        expr(s"INTERVAL $windowSec SECOND")

  /** The (conv, touch) PAIR frame every multi-touch attribution form
    * rolls up from: equi-join on the user key with the window
    * predicate inside the join (per-user touch lists bound the
    * fan-out — never a cross join). Batch body; the streaming twin is
    * [[attributionPairsStream]] (same predicate, same output schema),
    * and the per-form rollups ([[linearRollup]]/[[positionRollup]]/
    * [[decayRollup]]) are shared verbatim by both.
    */
  def attributionPairs(convs: DataFrame, touches: DataFrame,
                       keyCol: String, convIdCol: String,
                       convTsCol: String, touchIdCol: String,
                       touchTsCol: String, channelCol: String,
                       windowSec: Long): DataFrame = {
    require(windowSec > 0, "lookback window must be positive")
    val c = convs.select(col(keyCol), col(convIdCol).as("conv_id"),
      col(convTsCol).as("conv_ts"))
    val t = touches.select(col(keyCol), col(touchIdCol).as("touch_id"),
      col(touchTsCol).as("touch_ts"), col(channelCol).as("channel"))
    c.join(t, keyCol).filter(inWindow(windowSec))
      .select(col("conv_id"), col("conv_ts"), col("touch_id"),
        col("touch_ts"), col("channel"))
  }

  /** STREAMING pairs producer — the stream-stream interval join form
    * of [[attributionPairs]]: conversions and touches arrive as two
    * event streams, the window predicate rides IN the join condition
    * (Spark derives the state-cleanup bound from it — touch state
    * older than the conversion watermark minus the window drops), and
    * matched pairs emit append-only with the exact batch schema.
    * Accumulate them in a store (foreachBatch / any append sink) and
    * run the SAME rollup bodies over the accumulated pairs — the
    * warehouse posture of every other store family, so streamed and
    * batch attribution cannot drift (StreamingSpec pins all three
    * forms pair-for-pair and rollup-for-rollup).
    */
  def attributionPairsStream(convs: DataFrame, touches: DataFrame,
                             keyCol: String, convIdCol: String,
                             convTsCol: String, touchIdCol: String,
                             touchTsCol: String, channelCol: String,
                             windowSec: Long,
                             watermark: String): DataFrame = {
    require(windowSec > 0, "lookback window must be positive")
    val c = convs.select(col(keyCol).as("_ckey"),
        col(convIdCol).as("conv_id"), col(convTsCol).as("conv_ts"))
      .withWatermark("conv_ts", watermark)
    val t = touches.select(col(keyCol).as("_tkey"),
        col(touchIdCol).as("touch_id"), col(touchTsCol).as("touch_ts"),
        col(channelCol).as("channel"))
      .withWatermark("touch_ts", watermark)
    c.join(t, col("_ckey") === col("_tkey") && inWindow(windowSec))
      .select(col("conv_id"), col("conv_ts"), col("touch_id"),
        col("touch_ts"), col("channel"))
  }

  /** LINEAR attribution rollup — [[attribution]]'s multi-touch
    * sibling: every touch inside a conversion's lookback window earns
    * an equal 1/n share of that conversion's credit, summed per
    * channel. Credit is integer MICRO-credit (10⁶ div n per touch —
    * the integer-scaled-arithmetic rule): a float 1/n fold would sum
    * in engine- and partition-dependent order and break cross-engine
    * replay; integer sums are order-independent, so the rollup is
    * hash-exact. The div floor loses < 1 micro-credit per touch —
    * monitoring-grade precision with exactness where it matters.
    *
    * Same join shape as [[attribution]] (equi-join on key, window
    * filter inside, hash aggregates only); two aggregates — per-conv
    * touch counts, then the channel rollup.
    */
  def linearAttribution(convs: DataFrame, touches: DataFrame,
                        keyCol: String, convIdCol: String,
                        convTsCol: String, touchIdCol: String,
                        touchTsCol: String, channelCol: String,
                        windowSec: Long): DataFrame =
    linearRollup(attributionPairs(convs, touches, keyCol, convIdCol,
      convTsCol, touchIdCol, touchTsCol, channelCol, windowSec))

  /** The linear credit arithmetic over a pair frame — shared verbatim
    * by batch ([[linearAttribution]]) and streamed-store reads.
    */
  def linearRollup(pairs: DataFrame): DataFrame = {
    val j = pairs.select(col("conv_id"), col("touch_id"), col("channel"))
    val n = j.groupBy(col("conv_id")).agg(count(lit(1)).as("_nt"))
    j.join(n, "conv_id")
      .select(col("channel"), col("conv_id"),
        expr("1000000 div _nt").as("_micro"))
      .groupBy(col("channel"))
      .agg(countDistinct(col("conv_id")).as("n_convs"),
        count(lit(1)).as("n_touches"),
        sum(col("_micro")).as("credit_micro"))
  }

  /** POSITION-BASED (U-shaped) attribution — the industry-standard
    * 40/20/40 split: first and last touch get 40% each, middles share
    * the remaining 20% evenly; a single touch takes 100%, a pair
    * splits 50/50. Same integer micro-credit arithmetic as
    * [[linearAttribution]] (400 000 / 500 000 / 200 000 div (n − 2) —
    * no float folds), first/last identified by the same (ts, id)
    * struct argmin/argmax tie-break as [[attribution]], so all the
    * family's models agree on which touch is "first"/"last".
    */
  def positionAttribution(convs: DataFrame, touches: DataFrame,
                          keyCol: String, convIdCol: String,
                          convTsCol: String, touchIdCol: String,
                          touchTsCol: String, channelCol: String,
                          windowSec: Long): DataFrame =
    positionRollup(attributionPairs(convs, touches, keyCol, convIdCol,
      convTsCol, touchIdCol, touchTsCol, channelCol, windowSec))

  /** The 40/20/40 credit arithmetic over a pair frame — shared
    * verbatim by batch ([[positionAttribution]]) and streamed-store
    * reads.
    */
  def positionRollup(pairs: DataFrame): DataFrame = {
    val j = pairs.select(col("conv_id"), col("touch_id").as("_tid"),
      col("touch_ts").as("_tts"), col("channel"))
    val ends = j.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("_nt"),
        min(struct(col("_tts"), col("_tid"))).as("_f"),
        max(struct(col("_tts"), col("_tid"))).as("_l"))
      .select(col("conv_id"), col("_nt"),
        col("_f._tid").as("_first_tid"), col("_l._tid").as("_last_tid"))
    j.join(ends, "conv_id")
      .select(col("channel"), col("conv_id"),
        when(col("_nt") === 1, lit(1000000L))
          .when(col("_nt") === 2, lit(500000L))
          .when(col("_tid") === col("_first_tid") ||
            col("_tid") === col("_last_tid"), lit(400000L))
          .otherwise(expr("200000 div (_nt - 2)")).as("_micro"))
      .groupBy(col("channel"))
      .agg(countDistinct(col("conv_id")).as("n_convs"),
        count(lit(1)).as("n_touches"),
        sum(col("_micro")).as("credit_micro"))
  }

  /** TIME-DECAY attribution: a touch's weight halves for every full
    * day between it and the conversion — weight = 10⁶ >> age_days,
    * the one decay schedule that is pure INTEGER arithmetic (a
    * 2^(−age/λ) float would need exp(), which is not cross-engine
    * reproducible — the HLL small-range lesson). Absolute decayed
    * weight sums per channel (not normalized shares, whose float
    * division would reintroduce order dependence); age capped by the
    * window, so the shift amount is bounded.
    */
  def decayAttribution(convs: DataFrame, touches: DataFrame,
                       keyCol: String, convIdCol: String,
                       convTsCol: String, touchIdCol: String,
                       touchTsCol: String, channelCol: String,
                       windowSec: Long): DataFrame =
    decayRollup(attributionPairs(convs, touches, keyCol, convIdCol,
      convTsCol, touchIdCol, touchTsCol, channelCol, windowSec))

  /** The halving-weight arithmetic over a pair frame — shared
    * verbatim by batch ([[decayAttribution]]) and streamed-store
    * reads.
    */
  def decayRollup(pairs: DataFrame): DataFrame =
    pairs
      .select(col("channel"), col("conv_id"),
        // JVM shifts mask the count to 6 bits, so an unclamped
        // age ≥ 64 days would WRAP to full weight; ≥ 63 days is
        // weight 0 either way, so clamp the shift there
        call_function("shiftright", lit(1000000L),
          least(((unix_timestamp(col("conv_ts")) -
            unix_timestamp(col("touch_ts"))) /
            lit(86400L)).cast("int"), lit(63))).as("_w"))
      .groupBy(col("channel"))
      .agg(countDistinct(col("conv_id")).as("n_convs"),
        count(lit(1)).as("n_touches"),
        sum(col("_w")).as("weight_micro"))

  /** Traffic-spike detection over the event log — the ops-analytics
    * staple: hourly counts per series key, each bucket compared to its
    * TRAILING window (`trailing` prior buckets, rows-based — missing
    * hours simply don't occupy a row, identically on every engine),
    * flagged when `cnt > threshold × trailing mean`. The comparison is
    * the integer cross-multiply `cnt · n > threshold · Σ` — no
    * division, no floats, so the flag is hash-exact; the trailing
    * n/sum ride along as witnesses (the observable-cap rule: a reader
    * can re-derive every flag). Buckets with no history (n = 0) are
    * never spikes — one hour of data is not evidence.
    *
    * 100 TB shape: the ONLY full pass is the pre-aggregation to
    * (series, hour) counts — one hash aggregate; the trailing Window
    * then runs on the dimension-scale series frame (a year of hourly
    * buckets is 8 760 rows per series), partitioned by series key.
    */
  def trafficSpikes(events: DataFrame, typeCol: String, tsCol: String,
                    trailing: Int = 24, threshold: Long = 2L): DataFrame =
    spikeFlags(hourCounts(events, typeCol, tsCol), Seq("series"),
      trailing, threshold)

  /** SEASONAL-baseline spike detection — [[trafficSpikes]] with the
    * trailing window running over the SAME HOUR OF DAY on prior days
    * (partition (series, hour-of-day), order by bucket): Monday 9am
    * compares to previous mornings, not to 3am — the baseline every
    * diurnal metric actually needs (a flat trailing-24h window calls
    * every morning ramp a spike). Same pre-aggregate, same integer
    * cross-multiply, same witnesses; `trailing` counts prior
    * same-hour buckets (days).
    */
  def seasonalSpikes(events: DataFrame, typeCol: String, tsCol: String,
                     trailing: Int = 7, threshold: Long = 2L): DataFrame =
    spikeFlags(
      hourCounts(events, typeCol, tsCol)
        .withColumn("hod", hour(col("bucket")).cast("long")),
      Seq("series", "hod"), trailing, threshold)

  /** The (series, hour) count pre-aggregate — the ONLY full-log pass
    * of the spike family; shared by both baselines so they cannot
    * disagree on what a bucket is.
    */
  private def hourCounts(events: DataFrame, typeCol: String,
                         tsCol: String): DataFrame =
    events.groupBy(col(typeCol).as("series"),
        date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Hourly-count WAREHOUSE slices — the exact-counter member of the
    * store families (counts are the simplest sum-mergeable state):
    * each slice aggregates its own events to (slice, series, bucket,
    * cnt), [[hourCountMerge]] folds any subset back, and an hour whose
    * events arrive across several slices sums to what one pass would
    * see. STREAMING: call per micro-batch inside foreachBatch with
    * slice = batch id (StreamingSpec pins merge ≡ batch
    * [[trafficSpikes]] on the shared read body).
    */
  def hourCountSlices(events: DataFrame, typeCol: String, tsCol: String,
                      sliceCol: String): DataFrame =
    events.groupBy(col(sliceCol).as("slice"), col(typeCol).as("series"),
        date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold stored count slices back to the (series, bucket, cnt) frame
    * [[trafficSpikesFromCounts]] reads.
    */
  def hourCountMerge(slices: DataFrame): DataFrame =
    slices.groupBy(col("series"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The spike read over a stored count frame — the SAME body batch
    * [[trafficSpikes]] uses, so warehouse reads cannot drift from the
    * one-shot pass.
    */
  def trafficSpikesFromCounts(counts: DataFrame, trailing: Int = 24,
                              threshold: Long = 2L): DataFrame =
    spikeFlags(counts, Seq("series"), trailing, threshold)

  /** Gap-filled hourly series with last-observation-carried-forward —
    * the read that turns a sparse count log into the dense grid every
    * downstream chart/model joins against: per series, every hour
    * between that series' first and last observed bucket gets a row;
    * missing hours carry the last observed count forward and are
    * marked `observed = false` (the witness — a reader can tell fill
    * from fact). The first bucket is observed by construction, so no
    * leading-null case exists.
    *
    * Shape: the same single full-log pass as the spike family
    * ([[hourCounts]]), then a per-series bounds aggregate, a
    * `sequence(min, max, 1h)` explode (grid rows ∝ series × hours —
    * dimension scale), and ONE per-series ordered Window for the
    * carry. Nothing global, nothing driver-side.
    */
  def gapFill(events: DataFrame, typeCol: String, tsCol: String): DataFrame =
    gapFillFromCounts(hourCounts(events, typeCol, tsCol))

  /** The gap-fill read over a STORED count frame (series, bucket, cnt)
    * — the same body [[gapFill]] uses (one shared code path, the
    * trafficSpikesFromCounts rule), so the hourly-count warehouse
    * ([[hourCountSlices]]/[[hourCountMerge]]) serves dense LOCF grids
    * without re-scanning events.
    */
  def gapFillFromCounts(counts: DataFrame): DataFrame = {
    val grid = counts.groupBy(col("series"))
      .agg(min(col("bucket")).as("_mn"), max(col("bucket")).as("_mx"))
      .select(col("series"),
        explode(sequence(col("_mn"), col("_mx"),
          expr("interval 1 hour"))).as("bucket"))
    val w = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(counts, Seq("series", "bucket"), "left")
      .select(col("series"), col("bucket"),
        last(col("cnt"), ignoreNulls = true).over(w).as("cnt"),
        col("cnt").isNotNull.as("observed"))
  }

  /** The trailing-window cross-multiply flag, shared by the flat and
    * seasonal baselines.
    */
  private def spikeFlags(counts: DataFrame, partCols: Seq[String],
                         trailing: Int, threshold: Long): DataFrame = {
    require(trailing >= 1, "need at least one trailing bucket")
    require(threshold >= 1L, "threshold multiplier must be >= 1")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("bucket")).rowsBetween(-trailing, -1)
    counts.select(partCols.map(col) ++ Seq(col("bucket"), col("cnt"),
        count(col("cnt")).over(w).as("trailing_n"),
        coalesce(sum(col("cnt")).over(w), lit(0L)).as("trailing_sum")): _*)
      .withColumn("is_spike", col("trailing_n") > 0 &&
        col("cnt") * col("trailing_n") >
          lit(threshold) * col("trailing_sum"))
  }

  /** Week-over-week TOP MOVERS — the leaderboard-delta read: the
    * current and prior period's top-`k` items by event count, joined,
    * each item tagged entered/left/up/down/flat. The anchor is the
    * log's max timestamp (a 1-row aggregate — deterministic at every
    * SF, no wall-clock); rank 0 means "outside that period's top-k"
    * (the observable-absence convention).
    *
    * Shape: ONE full-log pass — both periods' item counts fold as
    * conditional aggregates (`count(when(period…))`) in a single
    * filtered hash aggregate over the two-period window (two filtered
    * passes would scan the log twice for the same answer — a full
    * extra pass at 100 TB); the shared counts frame is lineage-pinned
    * (it feeds both boards) and each board is a SORT-LIMIT on it
    * (`orderBy(...).limit(k)` plans as TakeOrderedAndProject —
    * per-partition top-k then one k-row merge, never a single-task
    * global Window over the item dimension); the rank Window then
    * runs on ≤ k rows. Full tie-break (count desc, item asc) makes
    * the limit deterministic.
    */
  def topMovers(events: DataFrame, itemCol: String, tsCol: String,
                k: Int, periodSec: Long = 604800L,
                checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(periodSec > 0, "period must be positive")
    val anchor = events.agg(
      max(unix_timestamp(col(tsCol))).as("anchor"))
    val counts = Checkpoints.pin(
      events
        .select(col(itemCol).as("item"),
          unix_timestamp(col(tsCol)).as("_s"))
        .crossJoin(broadcast(anchor)) // 1 row
        .filter(col("_s") > col("anchor") - 2L * periodSec &&
          col("_s") <= col("anchor"))
        .groupBy(col("item"))
        .agg(
          count(when(col("_s") > col("anchor") - periodSec, 1))
            .as("cur_cnt"),
          count(when(col("_s") <= col("anchor") - periodSec, 1))
            .as("prev_cnt")),
      checkpointDir, eager = false)
    def board(pfx: String): DataFrame = {
      val c = counts.filter(col(s"${pfx}_cnt") > 0)
        .select(col("item"), col(s"${pfx}_cnt"))
      c.orderBy(col(s"${pfx}_cnt").desc, col("item").asc).limit(k)
        .withColumn(s"${pfx}_rank",
          row_number().over(Window.orderBy(col(s"${pfx}_cnt").desc,
            col("item").asc)).cast("long"))
    }
    val cur = board("cur")
    val prev = board("prev")
    cur.join(prev, Seq("item"), "full_outer")
      .select(col("item"),
        coalesce(col("cur_rank"), lit(0L)).as("cur_rank"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"),
        coalesce(col("prev_rank"), lit(0L)).as("prev_rank"),
        coalesce(col("prev_cnt"), lit(0L)).as("prev_cnt"))
      .withColumn("status",
        when(col("prev_rank") === 0, "entered")
          .when(col("cur_rank") === 0, "left")
          .when(col("cur_rank") < col("prev_rank"), "up")
          .when(col("cur_rank") > col("prev_rank"), "down")
          .otherwise("flat"))
  }

  /** Time-weighted average of a value series — the TWAP/monitoring
    * read: each observation holds until the next one (step
    * interpolation), so its weight is its holding duration in seconds
    * and `twap = Σ value·Δt / Σ Δt` per series; the last observation
    * has no duration and drops (emitted in neither sum — the
    * right-open convention). The weighted sum folds as
    * DECIMAL(28,10)·seconds (order-independent — the q14/q200 rule;
    * a double fold would be partition-ordered), and the ONLY float op
    * is the final correctly-rounded division of the decimal-exact
    * numerator by the integer denominator — cross-engine
    * bit-identical. Σ Δt and the observation count ride along as
    * witnesses.
    *
    * Shape: one user/series-partitioned Window (a single lead — the
    * journeyPaths posture), one hash aggregate to the series frame.
    */
  def twap(events: DataFrame, seriesCol: String, tsCol: String,
           tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("series"))
      .orderBy(col("_ts"), col("_tie"))
    events
      .select(col(seriesCol).as("series"), col(tsCol).as("_ts"),
        col(tieCol).as("_tie"), col(valueCol).as("_v"))
      .withColumn("_dur",
        unix_timestamp(lead(col("_ts"), 1).over(w)) -
          unix_timestamp(col("_ts")))
      .filter(col("_dur").isNotNull)
      .groupBy(col("series"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("_dur")).as("total_sec"),
        // (18,6) not (28,10): DuckDB types the decimal×BIGINT product
        // at p1+18 digits, which must stay ≤ 38 for the oracle
        sum(col("_v").cast("decimal(18,6)") * col("_dur")).as("_sw"))
      .select(col("series"), col("n_obs"), col("total_sec"),
        round(col("_sw").cast("double") /
          col("total_sec").cast("double"), 6).as("twap"))
  }

  /** Top-k THREE-step journeys — the Sankey/path-analysis read over
    * the item-event log: per user, consecutive (ordered by ts with a
    * unique tie-break column) item triples, counted corpus-wide,
    * ranked by frequency (ties break lexicographically on the path).
    * [[transitionCounts]]'s single step answers "what follows X";
    * this answers "which flows dominate".
    *
    * Shape: one user-partitioned Window (two leads — per-user
    * sequences are bounded, the sessionSequences posture), one hash
    * aggregate to path counts (path-cardinality scale), then the
    * top-k as `orderBy().limit(k)` → TakeOrderedAndProject with the
    * rank Window on the ≤ k survivors only — the path dimension is
    * item³-cardinality, so a global rank Window here would funnel
    * every distinct triple through one task (never a single-task
    * global Window over an item dimension). The sort carries a full
    * tie-break, so rk is identical to the global form's.
    */
  def journeyPaths(events: DataFrame, userCol: String, itemCol: String,
                   tsCol: String, tieCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val tri = events
      .select(col(userCol), col(itemCol).as("step1"), col(tsCol),
        col(tieCol))
      .withColumn("step2", lead(col("step1"), 1).over(w))
      .withColumn("step3", lead(col("step1"), 2).over(w))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
    val cnt = tri.groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
    TopN.globalRanked(cnt, k, col("n_paths").desc, col("step1").asc,
      col("step2").asc, col("step3").asc)
  }

  /** RFM customer segmentation — the classic recency / frequency /
    * monetary scoring over an order log, the first segmentation a
    * commerce analytics user builds after the reference's seven use
    * cases. Each customer gets three 1..`buckets` quintile scores
    * (5 = most recent / most frequent / highest spend) and a coarse
    * segment label; output is the (r, f, m) segment rollup with
    * customer counts and revenue.
    *
    * Shape: the order log reduces FIRST to one row per customer (one
    * hash aggregate — the only pass over the full log), then the
    * three ntiles run on that dimension-scale frame via
    * [[Quantiles.exactNtileGlobal]]'s range-partitioned PrefixSum —
    * never a single-task global Window even when "dimension-scale" is
    * 150M customers at SF100k. Ties break on the customer key (the
    * deterministic-order rule); spend sums as DECIMAL(28,10) so the
    * fold is order-independent (the q14 rule). The per-customer frame
    * is lineage-pinned ([[Checkpoints.pin]], eager = false) so the
    * order-log aggregate materializes ONCE, not once per ntile.
    */
  def rfmSegments(orders: DataFrame, custCol: String, tsCol: String,
                  amountCol: String, buckets: Int = 5,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val per = Checkpoints.pin(
      orders.groupBy(col(custCol).as("cust"))
        .agg(max(col(tsCol)).as("last_ts"), count(lit(1)).as("freq"),
          sum(col(amountCol).cast("decimal(28,10)")).as("money")),
      checkpointDir, eager = false)
    def score(orderCol: String, as: String): DataFrame =
      Quantiles.exactNtileGlobal(per, Seq(orderCol, "cust"), buckets,
        checkpointDir = checkpointDir)
        .select(col("cust"), col("bucket").as(as))
    val hi = buckets - 1 // top-two-bucket threshold at the default 5
    per.select(col("cust"), col("money"))
      .join(score("last_ts", "r_score"), "cust")
      .join(score("freq", "f_score"), "cust")
      .join(score("money", "m_score"), "cust")
      .withColumn("segment",
        when(col("r_score") >= hi && col("f_score") >= hi, "champions")
          .when(col("r_score") >= hi, "recent")
          .when(col("f_score") >= hi, "at_risk")
          .otherwise("hibernating"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("money")), 2).cast("double").as("revenue"))
  }

  /** A/B experiment read-out over the event log: users assign to
    * variant 0/1 by salted md5₆₀ hash (deterministic, uniform, and
    * REPLAYABLE — the same user lands in the same arm on every engine
    * and every re-run, the property ad-hoc `rand()` splits lose), a
    * user converts if `convType` makes up MORE than 1/`shareDenom` of
    * their events (an SF-stable metric: "has ≥ 1 purchase" saturates
    * to 100% as per-user history grows, the degenerate se = 0 case —
    * found at the sf0.001 gate where all 15 users had purchased), and
    * the output is one row: per-arm exposure/conversion counts,
    * rates, and the two-proportion z statistic with its |z| > 1.96
    * flag. A saturated read-out (0% or 100% pooled) reports z = 0,
    * not significant — identical rates carry no evidence.
    *
    * Cross-engine exactness: the conversion test is an integer
    * cross-multiply; the rates and z are IEEE doubles built ONLY
    * from +, −, ×, ÷, sqrt — all correctly rounded operations, so an
    * oracle writing the SAME expression tree reproduces them
    * bit-for-bit (the no-ln/exp rule: those are libm-dependent,
    * these are not). The significance flag compares the
    * FULL-precision z so it cannot disagree with the rounded display
    * value's band.
    *
    * Shape: one hash aggregate to the per-user frame (the only pass
    * over the log), one 2-row aggregate, one broadcast self-pair —
    * the read-out costs a scan at any scale.
    */
  def abTest(events: DataFrame, userCol: String, typeCol: String,
             convType: String, shareDenom: Int = 5,
             salt: String = "ab"): DataFrame = {
    require(shareDenom >= 2, "shareDenom must be >= 2")
    val users = events
      .select(col(userCol).as("user_id"),
        // lowercase BOTH sides — a mixed-case convType argument must
        // not silently measure zero conversions
        (lower(col(typeCol)) ===
          convType.toLowerCase(java.util.Locale.ROOT)).cast("long")
          .as("_c"))
      .groupBy(col("user_id"))
      .agg((sum(col("_c")) * shareDenom > count(lit(1))).as("_conv"))
      .select(col("user_id"), col("_conv"),
        (graft.functions.Hashing.md5Long(
          concat(lit(s"$salt:"), col("user_id").cast("string"))) % 2)
          .as("variant"))
    val arms = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("_conv").cast("long")).as("x"))
    val a0 = arms.filter(col("variant") === 0)
      .select(col("n").as("n_control"), col("x").as("conv_control"))
    val a1 = arms.filter(col("variant") === 1)
      .select(col("n").as("n_treat"), col("x").as("conv_treat"))
    a0.crossJoin(broadcast(a1)) // two 1-row frames
      .withColumn("rate_control",
        round(col("conv_control").cast("double") /
          col("n_control").cast("double"), 6))
      .withColumn("rate_treat",
        round(col("conv_treat").cast("double") /
          col("n_treat").cast("double"), 6))
      .withColumn("_z",
        // CASE branches evaluate lazily, so the saturated case (pooled
        // rate 0 or 1 ⇒ se = 0) never reaches the division
        when(col("conv_control") + col("conv_treat") === 0 ||
          col("conv_control") + col("conv_treat") ===
            col("n_control") + col("n_treat"), lit(0.0))
          .otherwise(
            (col("conv_treat").cast("double") / col("n_treat").cast("double") -
              col("conv_control").cast("double") / col("n_control").cast("double")) /
              sqrt(((col("conv_control") + col("conv_treat")).cast("double") /
                (col("n_control") + col("n_treat")).cast("double")) *
                (lit(1.0) - (col("conv_control") + col("conv_treat")).cast("double") /
                  (col("n_control") + col("n_treat")).cast("double")) *
                (lit(1.0) / col("n_control").cast("double") +
                  lit(1.0) / col("n_treat").cast("double")))))
      .select(col("n_control"), col("conv_control"), col("n_treat"),
        col("conv_treat"), col("rate_control"), col("rate_treat"),
        round(col("_z"), 6).as("z_score"),
        (abs(col("_z")) > 1.96).as("significant"))
  }

  /** Daily growth accounting — the standard product-analytics
    * decomposition of every day's active base into new (first-ever
    * activity today), retained (also active yesterday), resurrected
    * (active before, but not yesterday), plus the churned count
    * (active yesterday, silent today), attributed to the day the user
    * went silent. `new + retained + resurrected = DAU(d)` and
    * `churned(d) = DAU(d−1) − retained(d)` hold by construction — the
    * growth identity dashboards reconcile against.
    *
    * Shape: ONE hash aggregate to the distinct (user, day) frame (the
    * distinct-frame-first rule — everything after runs at user-day
    * scale, not event scale), ONE user-partitioned window carrying
    * lag+lead together, a 1-row max-day broadcast to close the churn
    * range, one final hash aggregate. No global window, no join
    * against the event log; scales as the user-day frame.
    */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String,
                       checkpointDir: Option[String] = None): DataFrame = {
    // pinned: the frame feeds the window AND the max-day broadcast —
    // unpinned, a union shape re-derived the distinct 3× (q225 rule)
    val ud = Checkpoints.pin(
      events.select(col(userCol).as("user_id"),
          to_date(col(tsCol)).as("day"))
        .filter(col("user_id").isNotNull && col("day").isNotNull)
        .distinct(),
      checkpointDir, eager = false)
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    // ONE window pass; each row emits its active-status row plus, when
    // the user goes silent, the churn row for day+1 — explode instead
    // of a union so the window subtree exists once in the plan. A user
    // churns on day+1 when the next active day is absent or further
    // out; days past the observed range emit nothing (the last day's
    // silence is right-censored, not churn)
    val marked = ud
      .withColumn("_prev", lag(col("day"), 1).over(w))
      .withColumn("_next", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(ud.agg(max(col("day")).as("_max_day"))))
    marked.select(explode(array(
        struct(col("day"),
          when(col("_prev").isNull, lit("new"))
            .when(datediff(col("day"), col("_prev")) === 1,
              lit("retained"))
            .otherwise(lit("resurrected")).as("status")),
        struct(date_add(col("day"), 1).as("day"),
          when((col("_next").isNull ||
            datediff(col("_next"), col("day")) > 1) &&
            col("day") < col("_max_day"), lit("churned"))
            .otherwise(lit(null).cast("string")).as("status"))))
        .as("r"))
      .select(col("r.day").as("day"), col("r.status").as("status"))
      .filter(col("status").isNotNull)
      .groupBy(col("day"))
      .agg(
        count(when(col("status") === "new", lit(1))).as("new_users"),
        count(when(col("status") === "retained", lit(1)))
          .as("retained_users"),
        count(when(col("status") === "resurrected", lit(1)))
          .as("resurrected_users"),
        count(when(col("status") === "churned", lit(1)))
          .as("churned_users"))
  }

  /** DAU/WAU/MAU stickiness per day: exact trailing-window distinct
    * actives (WAU over the trailing `weekDays`, MAU over the trailing
    * `monthDays`, both inclusive of the day itself) and the DAU/MAU
    * ratio as integer parts-per-million — `dau * 1_000_000 div mau`,
    * integer division on exact counts, bit-identical cross-engine
    * (the no-float-folds rule).
    *
    * The trailing distinct is computed by EXPANSION, not a range
    * join: each (user, day) row contributes itself to the `monthDays`
    * future days it keeps the user "recently active" for, and one
    * count-distinct per day folds the overlap. The expansion is
    * `monthDays ×` the USER-DAY frame — dimension scale, never event
    * scale — and replaces a per-day range join over the log (the
    * shape that dies at 100 TB). Days before a full window have
    * partial (truthful) windows; only days with at least one active
    * user emit.
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
                 weekDays: Int = 7, monthDays: Int = 30,
                 checkpointDir: Option[String] = None): DataFrame = {
    require(weekDays >= 1 && monthDays >= weekDays,
      "need monthDays >= weekDays >= 1")
    // pinned: dau, the two trailing expansions and the max-day scalar
    // all read this frame — unpinned, the log is scanned and
    // distinct-shuffled four times (the q225 rule)
    val ud = Checkpoints.pin(
      events.select(col(userCol).as("user_id"),
          to_date(col(tsCol)).as("day"))
        .filter(col("user_id").isNotNull && col("day").isNotNull)
        .distinct(),
      checkpointDir, eager = false)
    val maxDay = ud.agg(max(col("day")).as("_max_day"))
    def trailing(nDays: Int, as: String): DataFrame = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), nDays - 1)))
          .as("day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("_max_day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as(as))
    val dau = ud.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    dau.join(trailing(weekDays, "wau"), "day")
      .join(trailing(monthDays, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000L div mau").as("stickiness_ppm"))
  }

  /** Consecutive same-user inter-event gaps in whole seconds,
    * attributed to the EARLIER event's type — the "time to next
    * action after X" frame behind dwell/latency dashboards. One
    * user-partitioned window ordered by (ts, idCol) (the
    * [[transitionCounts]] tie-break); each user's last event has no
    * successor and emits nothing. Gap arithmetic is whole-second
    * (`unix_timestamp` floors before subtracting — DuckDB replays it
    * as `floor(epoch(ts))`), so the frame feeds
    * [[Quantiles.guardedExactPercentiles]] cross-engine exactly.
    * Output: (event_type, gap_s).
    */
  def interEventGaps(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("_id"))
    events.select(col(userCol).as("user_id"),
        col(typeCol).as("event_type"), col(tsCol).as("ts"),
        col(idCol).as("_id"))
      .withColumn("_next_ts", lead(col("ts"), 1).over(w))
      .filter(col("_next_ts").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("_next_ts")) - unix_timestamp(col("ts")))
          .as("gap_s"))
  }

  /** Daily bounce rate: sessions (the [[sessionSequences]] gap rule —
    * a new session starts after `gapS` seconds of silence, boundaries
    * on floored epoch seconds so engines agree) bucketed by their
    * START day; a bounce is a single-event session. Emits per day
    * (n_sessions, n_bounces, bounce_ppm) with the rate as integer
    * parts-per-million (`div`, the no-float-folds rule).
    *
    * Shape: one lag window + one running-sum window per user
    * partition (the sessionSequences cost class), one session hash
    * aggregate, one day hash aggregate.
    */
  def bounceRate(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapS: Long = 1800L): DataFrame = {
    withSessionIds(
      events.select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        col(idCol).as("eid")),
      gapS)
      .groupBy(col("user_id"), col("s_id"))
      .agg(to_date(min(col("ts"))).as("day"),
        count(lit(1)).as("_n"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("_n") === 1L, lit(1))).as("n_bounces"))
      .select(col("day"), col("n_sessions"), col("n_bounces"),
        expr("n_bounces * 1000000L div n_sessions").as("bounce_ppm"))
  }

  /** Decayed trending top-k — "what is hot right now, with yesterday
    * counting half": each event contributes `2^20 >> age_days` units
    * (age from the corpus's max day; halving per day), summed per
    * item, top-k by (weight desc, item asc). The shift count clamps
    * at 63 — JVM shifts mask the count to 6 bits, so an unclamped
    * 64-day age would wrap to FULL weight (the decayAttribution
    * lesson, spec'd there); everything is integer-exact, no exp().
    *
    * Shape: one 1-row max-day broadcast, one hash aggregate over the
    * log, a sort-limit top-k (TakeOrderedAndProject) — never a global
    * Window.
    */
  def trendingItems(events: DataFrame, itemCol: String, tsCol: String,
                    k: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // pinned: the frame feeds the weights AND the max-day broadcast —
    // unpinned, the log (plus any caller-side projection like the
    // props JSON extract) scans twice (the q225 rule)
    val e = Checkpoints.pin(
      events.select(col(itemCol).as("item"),
          to_date(col(tsCol)).as("day"))
        .filter(col("item").isNotNull),
      checkpointDir, eager = false)
    e.crossJoin(broadcast(e.agg(max(col("day")).as("_max_day"))))
      .select(col("item"),
        // SQL form: the Scala shiftright only takes a literal count
        expr("shiftright(1048576L, " +
          "cast(least(datediff(_max_day, day), 63) as int))").as("_w"))
      .groupBy(col("item"))
      .agg(sum(col("_w")).as("weight"), count(lit(1)).as("n_events"))
      .orderBy(col("weight").desc, col("item").asc)
      .limit(k)
  }

  /** [[trendingItems]] served from the hourly-count WAREHOUSE (the
    * gapFillFromCounts shared-read rule): decayed weights from stored
    * (series, bucket, cnt) rows — the event log never re-scans. Ages
    * derive from the store's own max bucket day, and an hourly
    * bucket's day IS its events' day, so warehouse-served trending ≡
    * log-computed trending whenever the store covers the log (the
    * q245 oracle recomputes from the raw log to pin exactly that).
    * Work ∝ the count store (series × active hours), not events.
    */
  def trendingFromCounts(counts: DataFrame, k: Int,
                         checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // same pin: the count store feeds the weights and the max-day
    val c = Checkpoints.pin(
      counts.select(col("series").as("item"),
        to_date(col("bucket")).as("day"), col("cnt")),
      checkpointDir, eager = false)
    c.crossJoin(broadcast(c.agg(max(col("day")).as("_max_day"))))
      .select(col("item"), col("cnt"),
        (col("cnt") * expr("shiftright(1048576L, " +
          "cast(least(datediff(_max_day, day), 63) as int))")).as("_w"))
      .groupBy(col("item"))
      .agg(sum(col("_w")).as("weight"), sum(col("cnt")).as("n_events"))
      .orderBy(col("weight").desc, col("item").asc)
      .limit(k)
  }

  /** Robust anomaly flags over the daily series counts — the
    * median/MAD detector ([[trafficSpikes]]' trailing mean is blind to
    * level shifts and poisoned by the outliers themselves; the
    * median/MAD pair is the standard robust alternative). The classic
    * rule |x − median| > 3·MAD evaluates as EXACT integers by scaling:
    * `med2 = 2·median(cnt)` and `mad4 = 2·median(|2·cnt − med2|)` are
    * integers (a median of integers is integral or half-integral, so
    * doubling is exact in the double the percentile returns, and the
    * long cast loses nothing), and the flag is the cross-multiply
    * `2·dev2 > 3·mad4` — no float folds, engine-exact. A constant
    * series has MAD = 0 and flags ANY deviation — the standard MAD
    * degeneracy, surfaced rather than smoothed.
    *
    * Shape: one hash aggregate to the daily counts (dimension scale),
    * two per-series percentile aggregates over that frame, two
    * broadcast-sized joins back; the daily and deviation frames are
    * pinned (each feeds two readers — the q225 rule).
    */
  def robustAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                      checkpointDir: Option[String] = None): DataFrame = {
    val daily = Checkpoints.pin(
      events.groupBy(col(typeCol).as("series"),
          to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("cnt")),
      checkpointDir, eager = false)
    val med = daily.groupBy(col("series"))
      .agg((percentile(col("cnt"), lit(0.5)) * 2).cast("long").as("med2"))
    val dev = Checkpoints.pin(
      daily.join(broadcast(med), "series")
        .withColumn("dev2", abs(col("cnt") * 2 - col("med2"))),
      checkpointDir, eager = false)
    val mad = dev.groupBy(col("series"))
      .agg((percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "series")
      .select(col("series"), col("day"), col("cnt"), col("med2"),
        col("dev2"), col("mad4"),
        (col("dev2") * 2 > col("mad4") * 3).as("is_anomaly"))
  }

  /** Next-item recommendation table from a consecutive-pair frame
    * (the shared transition edge source — same input contract as the
    * graph family, the q208 lesson: ops REUSE the pair stage, they
    * don't re-derive it): per `from` item, the top-`k` successors by
    * count with the transition probability as exact parts-per-million
    * (`cnt · 1e6 div row_total` — integer, the no-float-folds rule).
    * The "users who viewed X go to Y next" table a session-based
    * recommender serves.
    *
    * Shape: one hash aggregate to the transition counts, one
    * reaggregation for row totals, and a per-from rank that
    * WindowGroupLimit pre-prunes below the shuffle (the q04 shape —
    * hot head items ARE the skew).
    */
  def nextItemTable(pairs: DataFrame, fromCol: String, toCol: String,
                    k: Int): DataFrame =
    nextItemFromCounts(
      pairs.select(col(fromCol).as("from_item"), col(toCol).as("to_item"))
        .groupBy(col("from_item"), col("to_item"))
        .agg(count(lit(1)).as("cnt")),
      "from_item", "to_item", "cnt", k)

  /** The next-item read over an already-counted transition frame —
    * the body [[nextItemTable]] uses (one shared code path, the
    * trafficSpikesFromCounts rule), so the edge warehouse
    * ([[Graph.edgeSlices]]/[[Graph.edgeMerge]]) serves the
    * recommendation table without re-deriving transitions from the
    * raw log.
    */
  def nextItemFromCounts(counts: DataFrame, fromCol: String,
                         toCol: String, cntCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val trans = counts.select(col(fromCol).as("from_item"),
      col(toCol).as("to_item"), col(cntCol).as("cnt"))
    val totals = trans.groupBy(col("from_item"))
      .agg(sum(col("cnt")).as("row_total"))
    val wr = Window.partitionBy(col("from_item"))
      .orderBy(col("cnt").desc, col("to_item").asc)
    trans.withColumn("rk", row_number().over(wr).cast("long"))
      .filter(col("rk") <= k)
      .join(totals, "from_item")
      .select(col("from_item"), col("rk"), col("to_item"), col("cnt"),
        expr("cnt * 1000000L div row_total").as("p_ppm"))
  }
}
