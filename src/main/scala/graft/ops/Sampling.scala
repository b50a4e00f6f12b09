package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: results change with
  * partitioning, retries and engine version — useless for reproducible
  * corpus construction or cross-engine verification. These samplers
  * decide membership from a hash of a stable id, so the same row set
  * comes back on every run, on any cluster layout, and in any engine
  * that can compute the hash (the DuckDB oracle does). Selection is a
  * pure codegen'd filter — fully pushdown-friendly, no shuffle, no RNG
  * state; at 100 TB it costs exactly one scan.
  */
object Sampling {

  private val Granularity = 10000L

  /** Hash bucket of (salt, `idCol`) in [0, granularity). Built with the
    * Column DSL (not an expr() splice) so arbitrary salts (quotes,
    * backslashes) and column names needing backticks are handled by
    * Catalyst, never by string escaping. md5_long60 is non-negative
    * (top 60 bits), so % is a true mod.
    */
  private def bucket(df: DataFrame, idCol: String, salt: String): Column =
    bucketFull(df, idCol, salt) % Granularity

  /** Membership expression: stable hash of (salt, `idCol`) mod
    * granularity compared against floor(fraction * granularity).
    *
    * The salt decorrelates composed sampling stages: two unsalted
    * filters over the same id are the SAME coin flip, so a downstream
    * fraction f after an upstream g keeps min(f, g) of the original
    * (f/g of the survivors) instead of f of the survivors. Stages that
    * stack must use distinct salts.
    */
  private def keep(df: DataFrame, idCol: String, fraction: Column,
                   salt: String): Column =
    bucket(df, idCol, salt) < floor(fraction * Granularity)

  /** Uniform deterministic sample: keeps ~`fraction` of rows, chosen by
    * id hash (resolution 1/10000). Pass a distinct `salt` when stacking
    * multiple sampling stages on the same id.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(keep(df, idCol, lit(fraction), salt))

  /** Per-row-probability deterministic sample: keeps each row with
    * probability `weight` (an arbitrary per-row Column, clamped to
    * [0, 1]) decided by its id hash — quality-weighted corpus selection
    * (keep good docs more often) as a pure codegen'd filter, no RNG, no
    * shuffle, reproducible at any layout. Same salt rules as
    * [[hashSample]] when stacking stages.
    */
  def weightedHashSample(df: DataFrame, idCol: String, weight: Column,
                         salt: String = ""): DataFrame =
    df.filter(keep(df, idCol,
      least(greatest(weight, lit(0.0)), lit(1.0)), salt))

  /** Stratified deterministic sample: per-stratum fractions with a
    * default for unlisted strata. The fraction lookup is a broadcast-free
    * CASE expression (strata maps are dimension-sized); membership stays
    * a pure filter over the scan.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double,
                           salt: String = ""): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (elseCol, (value, f)) =>
        when(col(strataCol) === value, lit(f)).otherwise(elseCol)
    }
    df.filter(keep(df, idCol, frac, salt))
  }

  /** Deterministic dataset split: one pass labels every row with its
    * split ("train"/"val"/"test", …) by which band of the id-hash
    * space it falls in. Splits are DISJOINT and EXHAUSTIVE by
    * construction (the bands partition the hash range — no row is
    * dropped or double-assigned, unlike composing independent
    * samples), reproducible at any layout, and recomputable by any
    * engine with the hash (the q84 oracle). One narrow projection —
    * no shuffle, no RNG; downstream stages filter on the label, a
    * pushdown-friendly predicate. Fractions must sum to 1 (±1e-6);
    * band bounds round to the 1/10000 hash granularity with the LAST
    * split absorbing the rounding remainder.
    */
  def split(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
            salt: String = ""): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be distinct")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) <= 1e-6,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(!df.columns.exists(_.equalsIgnoreCase("split")),
      "input already has a 'split' column")
    val b = bucket(df, idCol, salt)
    // cumulative upper bounds for all but the last split
    val bounds = splits.init.scanLeft(0L) {
      case (acc, (_, f)) => acc + math.round(f * Granularity)
    }.tail
    val label = splits.init.map(_._1).zip(bounds)
      .foldRight(lit(splits.last._1): Column) {
        case ((name, bd), els) => when(b < bd, lit(name)).otherwise(els)
      }
    df.withColumn("split", label)
  }

  /** Deterministic FIXED-SIZE sample per stratum: exactly `n` rows from
    * each stratum (fewer when the stratum is smaller) — the fixed-N
    * eval/holdout set the fraction samplers can't pin (a fraction's
    * yield drifts with stratum size). Selection order is the salted id
    * hash with an id tie-break, so the same rows come back at any
    * layout and the DuckDB oracle reproduces them exactly; adding rows
    * to a stratum only evicts from the boundary.
    *
    * Shape: rank over (hash, id) per stratum. Strata are usually
    * LOW-cardinality (sources, languages) — the classic WindowExec
    * trap — but the rank<=n predicate plans as WindowGroupLimit, so
    * each partition pre-prunes to its own top-n BEFORE the exchange
    * (the q04 shape, PlanShapeSpec pins it): the shuffle moves ~n ×
    * partitions rows, never the corpus.
    */
  def fixedSizeSample(df: DataFrame, idCol: String, strataCol: String,
                      n: Int, salt: String = ""): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val rn = Iterator.iterate("_rank")(_ + "_")
      .find(c => !df.columns.exists(_.equalsIgnoreCase(c))).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(bucketFull(df, idCol, salt).asc, col(idCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n).drop(rn)
  }

  /** Full-width hash (no modulus) of (salt, `idCol`) — the selection
    * ORDER for [[fixedSizeSample]]; [[bucket]]'s 1/10000 granularity
    * would tie thousands of rows and push every decision to the id
    * tie-break (biasing selection toward low ids).
    */
  private def bucketFull(df: DataFrame, idCol: String, salt: String): Column =
    graft.functions.Md5Long60(df.sparkSession,
      concat(lit(salt), col(idCol).cast("string")).cast("binary"))

  /** Token-budget epoch allocation: how many FULL passes (epochs) of
    * each stratum a global token budget buys under integer weight
    * shares, plus a deterministic hash-picked remainder pass for the
    * fractional epoch — the "how many epochs of each domain" planning
    * step of a pre-training data mixture (weights in tokens, not rows,
    * unlike [[mixture]]). target_s = budget·w_s ÷ Σw (floor),
    * epochs_s = target_s ÷ avail_s, and the remainder
    * rem_s = target_s mod avail_s tokens are drawn by keeping each doc
    * iff hash(id)·avail_s < rem_s·2⁶⁰ — the cross-multiplied form of
    * hash/2⁶⁰ < rem/avail evaluated in DECIMAL(38,0), so every keep
    * decision is INTEGER-exact (no double threshold anywhere; headroom
    * holds to avail ≈ 10¹⁹ tokens, past any real corpus).
    *
    * Two passes over `df` (per-stratum totals, then the conditional
    * remainder aggregate); the allocation table is dimension-sized and
    * broadcast. Strata with zero tokens are dropped (an epoch of
    * nothing is undefined). Output: one row per stratum —
    * (stratum, wt, avail_tokens, target_tokens, epochs, rem_tokens,
    * rem_docs, rem_kept_tokens).
    */
  def epochAllocation(df: DataFrame, idCol: String, strataCol: String,
                      tokenCol: String, weights: Map[String, Long],
                      defaultWeight: Long, budget: Long,
                      salt: String = "epoch:",
                      checkpointDir: Option[String] = None): DataFrame = {
    require(budget >= 0 && defaultWeight >= 0 && weights.values.forall(_ >= 0))
    // budget·wt is the widest product computed in Long (targets/epochs
    // derive from it): fail fast instead of wrapping silently
    val maxW = (weights.values ++ Seq(defaultWeight)).max
    require(maxW == 0 || budget <= Long.MaxValue / maxW,
      s"budget * weight overflows Long (budget=$budget, max weight=$maxW)")
    val wt = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val base = df.select(col(strataCol).as("stratum"),
      col(tokenCol).cast("long").as("tok"),
      wt.cast("long").as("w"),
      bucketFull(df, idCol, salt).as("hb"))
    // the per-stratum totals are dimension-sized; pinned so the
    // sum_w / alloc consumers derive from them instead of each
    // replaying the corpus aggregate (6 scans instead of 2, unpinned)
    // weight 0 = "exclude this source" (the mixture convention for
    // unweighted strata); zero-token strata have no epoch to define.
    // Dropping them here also keeps sum_w strictly positive whenever
    // any stratum survives — no divide-by-zero path to a NULL row
    val avail = Checkpoints.pin(
      base.groupBy(col("stratum"))
        .agg(max(col("w")).as("wt"), sum(col("tok")).as("avail_tokens"))
        .filter(col("avail_tokens") > 0 && col("wt") > 0),
      checkpointDir, eager = false)
    val sumW = avail.agg(sum(col("wt")).as("sum_w"))
    val alloc = avail.crossJoin(broadcast(sumW))
      .select(col("stratum"), col("wt"), col("avail_tokens"),
        expr(s"(${budget}L * wt) div sum_w").as("target_tokens"))
      .withColumn("epochs", expr("target_tokens div avail_tokens"))
      .withColumn("rem_tokens", col("target_tokens") % col("avail_tokens"))
    val keep = expr(
      """cast(hb as decimal(38,0)) * avail_tokens <
        |cast(rem_tokens as decimal(38,0)) * cast(1152921504606846976 as decimal(38,0))""".stripMargin)
    base.join(broadcast(alloc), "stratum")
      .groupBy(col("stratum"), col("wt"), col("avail_tokens"),
        col("target_tokens"), col("epochs"), col("rem_tokens"))
      .agg(sum(when(keep, 1L).otherwise(0L)).as("rem_docs"),
        sum(when(keep, col("tok")).otherwise(0L)).as("rem_kept_tokens"))
  }

  /** Deterministic corpus mixture: subsample each stratum so the kept
    * rows realize `weights` as proportions, keeping as much data as
    * possible — the binding stratum (smallest count/share ratio) is
    * kept whole and every other stratum is hash-sampled down to match.
    * Strata without a weight are dropped. The only driver-side data is
    * the per-stratum count map (dimension-sized aggregate, standard for
    * mixture planning); membership remains a pure hash filter, so the
    * mixture is reproducible and layout-independent like the samplers
    * above. The classic pre-training data-mixing step (e.g. weighting
    * web/books/code sources).
    */
  def mixture(df: DataFrame, idCol: String, strataCol: String,
              weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().flatMap(r =>                  // null strata carry no weight
        Option(r.get(0)).map(_.toString -> r.getLong(1))).toMap
    val totalW = weights.values.sum
    val shares = weights.map { case (s, w) => s -> w / totalW }
    val present = shares.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no weighted stratum present in the data")
    // largest achievable mixture size: the binding stratum runs out first
    val binding = present.minBy { case (s, share) => counts(s) / share }._1
    val scale = counts(binding) / present(binding)
    val fractions = present.map { case (s, share) =>
      // exactly 1.0 for the binding stratum: share*scale/count can land
      // at 0.999... in double arithmetic and floor() would then drop the
      // last hash bucket of a stratum documented as kept whole
      s -> (if (s == binding) 1.0 else math.min(1.0, share * scale / counts(s)))
    }
    // distinct salt: a mixture stacked on an upstream (unsalted) sample
    // must draw an independent coin per row, or its fractions apply to
    // the original ids rather than the survivors
    stratifiedHashSample(df, idCol, strataCol, fractions,
      defaultFraction = 0.0, salt = "mixture:")
  }

  /** Recency-weighted (half-life) sampling with EXACT thresholds — the
    * time-decay a retrain-set assembly wants ("recent data matters
    * more") without `exp()`: the keep probability HALVES every
    * `halfLifeS` seconds of age, so the threshold is the integer
    * `10000 >> k` at the 1/10000 hash granularity (k = whole
    * half-lives of age, clamped to [0, 14] — beyond 14 the threshold
    * is 0 and the row drops; rows newer than the anchor keep
    * everything). Powers of two make every decision integer-exact and
    * engine-reproducible (the q147 oracle) where an exp(-age/τ)
    * threshold would hinge on libm rounding; for smoother decay,
    * shrink the half-life rather than interpolating.
    *
    * `anchorEpochS` is caller-supplied (a training cut is anchored at
    * its snapshot date, never wall clock), so the sample is
    * reproducible forever. Membership is a pure projection-and-filter
    * — no shuffle, no join, no RNG — like every sampler here.
    */
  def decayedSample(df: DataFrame, idCol: String, tsCol: String,
                    anchorEpochS: Long, halfLifeS: Long,
                    salt: String = "decay:"): DataFrame = {
    require(halfLifeS > 0, "halfLifeS must be positive")
    df.filter(bucket(df, idCol, salt) < expr(
      s"""shiftright(10000L, cast(least(greatest(
         |  (${anchorEpochS}L - unix_timestamp(`$tsCol`)) div ${halfLifeS}L,
         |  0L), 14L) as int))""".stripMargin))
  }

  /** Temperature-flattened mixture (the UniMax / multilingual-sampling
    * shape): target weights ∝ n_s^0.5 — big strata are down-weighted,
    * small strata up-weighted relative to natural proportions — then
    * the same keep-as-much-as-possible subsampling as [[mixture]]: the
    * binding stratum (smallest n/√n pressure) is kept whole and every
    * other stratum hash-samples down to realize the √-proportions.
    *
    * Unlike [[mixture]] (caller-supplied weights, double fractions),
    * the weights here are DERIVED from counts, so the arithmetic is
    * kept EXACT end-to-end: w_s = isqrt(n_s) (integer sqrt, corrected
    * floor), the binding stratum is the cross-multiplication argmin of
    * n_s/w_s (BigInt — no double ordering), and the per-stratum keep
    * threshold is the integer `min(10000, (w_s·n_b·10000) div
    * (w_b·n_s))` compared directly against the salted hash bucket — no
    * double ever enters, so the kept set hashes bit-for-bit in any
    * engine (the q135 oracle replays the same integers). Binding
    * stratum lands at exactly 10000 — kept whole with no special case.
    * Overflow bound: w_s·n_b·10000 < 2^63 ⇔ n < ~2e9 per stratum at
    * isqrt weights (the threshold math, not the data, is the limit).
    *
    * Exponents other than 0.5 don't have an exact integer form — for
    * those, compute weights upstream and call [[mixture]] (double
    * arithmetic, bit-exact only for power-of-two shares).
    *
    * Driver-side data: the per-stratum count map, as in [[mixture]].
    * Membership stays a pure pushdown-friendly hash filter.
    */
  def temperatureMixture(df: DataFrame, idCol: String,
                         strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.get(0)).map(_.toString -> r.getLong(1)))
      .toMap.filter(_._2 > 0L)
    require(counts.nonEmpty, "no non-null stratum present in the data")
    def isqrt(n: Long): Long = {
      var w = math.sqrt(n.toDouble).toLong
      while ((w + 1) * (w + 1) <= n) w += 1
      while (w * w > n) w -= 1
      w
    }
    val w = counts.map { case (s, n) => s -> isqrt(n) }
    // argmin of n_s/w_s by exact cross-multiplication, name-tie-broken
    val binding = counts.keys.toSeq.sortWith { (a, b) =>
      val l = BigInt(counts(a)) * w(b)
      val r = BigInt(counts(b)) * w(a)
      if (l != r) l < r else a < b
    }.head
    val (nb, wb) = (counts(binding), w(binding))
    val thresholds = counts.map { case (s, n) =>
      s -> math.min(10000L, w(s) * nb * 10000L / (wb * n))
    }
    val thr = thresholds.foldLeft(lit(0L)) { case (e, (v, t)) =>
      when(col(strataCol) === v, lit(t)).otherwise(e)
    }
    df.filter(bucket(df, idCol, "tmix:") < thr)
  }

  /** Epoch-deterministic GLOBAL training shuffle: every row gets a
    * 1-based `shuffle_rank` in the total order of
    * (md5₆₀("ord:&lt;epoch&gt;:" ‖ id), id) — a different, reproducible
    * permutation per epoch, no RNG, layout-independent (the salted-hash
    * sampling discipline applied to ORDER instead of membership). A
    * training job writes each epoch's corpus in rank order; resuming or
    * re-running any epoch yields byte-identical batches — the property
    * data-order-debugging (and loss-spike forensics) needs.
    *
    * Scale shape: rank assignment goes through the [[PrefixSum]]
    * range-partitioned core — `row_number() OVER (ORDER BY hash)`
    * would funnel the corpus through ONE task (the q40 WindowExec
    * trap); here it is a range shuffle + two scans, no global sort on
    * any single task (the oracle runs exactly that Window form,
    * proving the distributed ranks equal it).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   checkpointDir: Option[String] = None): DataFrame = {
    // collision-proof the helper key (the PrefixSum convention, r13
    // self-review): never clobber a user column, never leak the helper
    require(!df.columns.exists(_.equalsIgnoreCase("shuffle_rank")),
      "epochShuffle: input already has a shuffle_rank column")
    val key = Iterator.iterate("_skey")(_ + "_").find(k =>
      !df.columns.exists(_.equalsIgnoreCase(k))).get
    val keyed = df.withColumn(key,
      graft.functions.Hashing.md5Long(
        concat(lit(s"ord:$epoch:"), col(idCol).cast("string"))))
    PrefixSum.runningTotals(keyed, Nil, Seq(key, idCol),
      valueCol = None, runCol = "shuffle_rank",
      checkpointDir = checkpointDir)
      .drop(key)
  }
}
