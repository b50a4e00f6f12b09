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
      // first row per key (_prev null) always versions; NULL-safe
      // compare so a null state is itself a trackable value
      .filter(!(col("_prev") <=> col("state")))
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
}
