package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension machinery — the temporal-warehouse
  * surface: build versioned dimension rows from a change log (SCD
  * type 2) and join facts to the version valid at fact time (the
  * point-in-time join every feature store and finance mart needs —
  * joining TODAY's dimension row to LAST YEAR's fact is the classic
  * leakage bug this op family exists to prevent).
  */
object Scd {

  /** SCD2 build from a change log: per key, ordered by (ts, tie),
    * consecutive rows with an UNCHANGED `stateCol` collapse (only
    * changes version), each version gets `valid_from` = its first ts,
    * `valid_to` = the next version's start (null = current, and
    * `is_current` says so), `version` = 1-based ordinal. Ties on ts
    * break by the unique `tieCol` (the engine-determinism rule).
    *
    * Shape: two passes over one user-partitioned Window ordering (lag
    * to detect change, lead over the filtered change rows for
    * valid_to) — per-key sequences are bounded (the sessionSequences
    * posture), nothing global.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col(tieCol))
    val marked = changes
      .select(col(keyCol), col(tsCol).as("valid_from"), col(tieCol),
        col(stateCol).as("state"))
      .withColumn("_prev", lag(col("state"), 1).over(w))
      // "no previous row" must be its own signal — a lag on the state
      // column conflates it with "previous state was null", dropping a
      // key whose FIRST change row carries a null state (the r16
      // review finding); lag of a constant is null exactly on row 1
      .withColumn("_first", lag(lit(1), 1).over(w).isNull)
      // first row per key always versions; NULL-safe compare after
      // that so a null state is itself a trackable value
      .filter(col("_first") || !(col("_prev") <=> col("state")))
    val wv = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col(tieCol))
    marked
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("version", row_number().over(wv).cast("long"))
      .select(col(keyCol), col("state"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("version"))
  }

  /** Point-in-time join: each fact row picks the dimension version
    * valid AT its timestamp — `valid_from <= fact_ts < valid_to`
    * (right-open; a null valid_to is the current version). Facts
    * before the key's first version keep a NULL state (left join —
    * the zero-touch convention): surface it, don't drop it.
    *
    * Shape: an equi-join on the key with the validity predicate
    * filtering inside (per-key version lists bound the fan-out — the
    * attribution join shape); at most one version matches per fact by
    * construction, so no dedup pass is needed.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCol: String,
                  factTsCol: String): DataFrame = {
    val d = dim.select(col(keyCol).as("_dkey"), col("state"),
      col("valid_from"), col("valid_to"))
    facts.join(d,
        col(keyCol) === col("_dkey") &&
          col("valid_from") <= col(factTsCol) &&
          (col("valid_to").isNull || col(factTsCol) < col("valid_to")),
        "left")
      .drop("_dkey", "valid_to")
  }

  /** Dedupe a quote/observation frame to ONE row per (key, ts) — the
    * `tieCol`-largest wins (one struct-argmax hash aggregate, the
    * [[cdcState]] shape). The preparation step that makes an as-of
    * join ([[StreamMatch.asofJoin]] or the native
    * [[graft.plans.AsofJoin]]) engine-deterministic: both contracts
    * want right rows unique per (key, ts), and DuckDB's ASOF leaves
    * equal-ts winners unspecified — this pins them.
    */
  def latestPerKeyTs(quotes: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, valCol: String): DataFrame =
    quotes.groupBy(col(keyCol), col(tsCol))
      .agg(max(struct(col(tieCol).as("tie"), col(valCol).as("v"))).as("_w"))
      .select(col(keyCol), col(tsCol), col("_w.v").as(valCol))

  /** Last-writer-wins row per key over a CDC log — ONE hash aggregate
    * taking the whole winning row as `max(struct(ts, tie, op, state))`
    * (ties on ts break by the unique `tieCol`, so op/state are never
    * consulted — the attribution argmax shape; no Window). Tombstones
    * (`op = 'delete'`) are RETAINED: the state artifact must remember
    * deletions or a later [[cdcApply]] merge against an older slice
    * would resurrect them (the reason every log-structured store keeps
    * tombstones until compaction). [[cdcServe]] is the read that drops
    * them.
    */
  def cdcState(log: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, stateCol: String, opCol: String): DataFrame =
    log.groupBy(col(keyCol))
      .agg(max(struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
        col(opCol).as("op"), col(stateCol).as("state"))).as("_w"))
      .select(col(keyCol), col("_w.ts").as("ts"), col("_w.tie").as("tie"),
        col("_w.op").as("op"), col("_w.state").as("state"))

  /** The serving read of a [[cdcState]] artifact: drop tombstones.
    * A NULL op is malformed state (every writer in the family stamps
    * one) and RAISES rather than null-filtering the row out silently —
    * the raise-loudly convention [[graft.ops.TextAnalysis.indexMergeSlices]]
    * set for the store families.
    */
  def cdcServe(state: DataFrame): DataFrame =
    state.filter(
      when(col("op").isNull,
        raise_error(lit("cdcServe: null op in CDC state — malformed row")))
        .otherwise(col("op") =!= lit("delete")))

  /** Incremental CDC merge: fold a raw change-log slice into an
    * existing [[cdcState]] artifact. Per key the newer of (stored row,
    * slice's last-writer row) wins by (ts, tie) — argmax is
    * associative, so `cdcApply(cdcState(pre), post) ≡ cdcState(pre ∪
    * post)` for ANY split of the log (no append-order contract needed;
    * q221 proves the identity against the one-shot oracle).
    * Shape: one hash aggregate over the slice plus one full-outer
    * key join against the artifact — work ∝ slice + touched keys.
    */
  def cdcApply(state: DataFrame, changes: DataFrame, keyCol: String,
               tsCol: String, tieCol: String, stateCol: String,
               opCol: String): DataFrame = {
    val s = state.select(col(keyCol), struct(col("ts"), col("tie"),
      col("op"), col("state")).as("_s"))
    val c = cdcState(changes, keyCol, tsCol, tieCol, stateCol, opCol)
      .select(col(keyCol), struct(col("ts"), col("tie"), col("op"),
        col("state")).as("_c"))
    s.join(c, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("_s").isNull, col("_c"))
          .when(col("_c").isNull, col("_s"))
          .when(col("_c") > col("_s"), col("_c"))
          .otherwise(col("_s")).as("_w"))
      .select(col(keyCol), col("_w.ts").as("ts"), col("_w.tie").as("tie"),
        col("_w.op").as("op"), col("_w.state").as("state"))
  }

  /** Incremental SCD2 maintenance: fold a NEW change-log slice into an
    * existing [[scd2]] dimension without rebuilding closed history.
    * Contract: the slice is an APPEND — every change ts must be later
    * than its key's current-version `valid_from`; a violation RAISES
    * (see below), it never silently rewrites history.
    *
    * Mechanics: each key's current version re-enters the [[scd2]] body
    * as a seed change row (tie = −1, which sorts before any real tie at
    * equal ts), unioned with the slice; the fresh versions renumber by
    * the key's prior current version − 1, so a first slice row with the
    * SAME state collapses into the seed (version and valid_from
    * unchanged — the no-op update) and a DIFFERENT state closes it.
    * Closed dimension rows pass through untouched — the incremental ≡
    * full-rebuild identity is q222's oracle. The guard: after
    * renumbering, the row holding the prior current version number must
    * still start at the prior `valid_from`; a slice row predating the
    * seed breaks exactly that and fires `raise_error` in the output
    * projection (zero extra passes).
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCol: String,
                tsCol: String, tieCol: String, stateCol: String): DataFrame = {
    val tieType = changes.schema(tieCol).dataType
    // the seed sentinel −1 must sort BEFORE every real change row at an
    // equal ts, which only holds for numeric non-negative ties ("-1" is
    // not minimal in string order, and a real tie of −5 would sort
    // before the seed and silently mis-version past the predating-slice
    // guard) — so the tie contract is ENFORCED, not assumed: numeric
    // type at plan time, tie ≥ 0 per row at run time (raise, the
    // observable-cap rule)
    require(tieType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"scd2Apply: tieCol '$tieCol' must be numeric (the seed rows sort " +
        s"with a -1 sentinel at equal ts); got $tieType")
    val cur = dim.filter(col("is_current"))
    val seeds = cur.select(col(keyCol), col("valid_from").as(tsCol),
      lit(-1).cast(tieType).as(tieCol), col("state").as(stateCol))
    val offsets = cur.select(col(keyCol), (col("version") - 1L).as("_voff"),
      col("valid_from").as("_cvf"))
    val unioned = seeds.unionByName(
      changes.select(col(keyCol), col(tsCol),
        when(col(tieCol).isNull || col(tieCol) < 0,
          raise_error(concat(lit("scd2Apply: tie must be a non-negative " +
            "number (the seed sentinel is -1) — got "),
            coalesce(col(tieCol).cast("string"), lit("null")),
            lit(" for key "), col(keyCol).cast("string"))))
          .otherwise(col(tieCol)).as(tieCol),
        col(stateCol)))
    val fresh = scd2(unioned, keyCol, tsCol, tieCol, stateCol)
      .join(offsets, Seq(keyCol), "left")
      .withColumn("version", col("version") + coalesce(col("_voff"), lit(0L)))
      .withColumn("valid_from",
        when(col("_cvf").isNotNull &&
          col("version") === coalesce(col("_voff"), lit(0L)) + 1L &&
          col("valid_from") =!= col("_cvf"),
          raise_error(concat(lit("scd2Apply: slice predates current " +
            "version of key "), col(keyCol).cast("string"))))
          .otherwise(col("valid_from")))
      .drop("_voff", "_cvf")
    dim.filter(!col("is_current")).unionByName(fresh)
  }
}
