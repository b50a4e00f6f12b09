package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.Funnel

/** Streaming form of [[graft.ops.Funnel.windowFunnel]].
  *
  * A funnel depth is a whole-history aggregate per user — an event
  * arriving today can deepen a chain anchored weeks ago, so there is no
  * bounded-state incremental form with the aggregate's semantics (the
  * incremental route is [[graft.cep.CEP.detectStream]], whose NFA also
  * upgrades to any-start matching). The streaming shape for the
  * AGGREGATE semantics is therefore recompute-over-landed-events: each
  * micro-batch appends to an events table and the funnel is recomputed
  * over everything landed — exactly how a production pipeline runs
  * funnels (events land continuously; the report query re-runs), with
  * the same scale properties as the batch operator (per-step scans +
  * min-aggregates; the landed table is the only state).
  *
  * StreamingSpec asserts the final micro-batch output is identical to
  * batch windowFunnel over the full event set.
  */
object StreamingFunnel {

  /** Land one micro-batch idempotently: the store is partitioned by
    * batch_id and the write is a dynamic-partition overwrite, so it
    * replaces ONLY this batch's partition. foreachBatch is
    * at-least-once — a batch replayed after a failure re-lands the
    * same rows over itself instead of appending a second copy that
    * would permanently double-count every later funnel recomputation.
    */
  def land(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
           batchId: Long, storePath: String): Unit =
    df.select(col(userCol), col(typeCol), col(tsCol))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storePath)

  /** foreachBatch writer: land each micro-batch of `events` (must
    * carry `userCol`/`typeCol`/`tsCol`) into the batch_id-partitioned
    * parquet table at `storePath` ([[land]], idempotent under replay),
    * recompute the funnel over the whole table, and hand the result to
    * `sink`.
    */
  def writer(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String], horizon: String,
             storePath: String)(
             sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream.outputMode("append").foreachBatch {
      (df: DataFrame, batchId: Long) =>
        land(df, userCol, typeCol, tsCol, batchId, storePath)
        val landed = df.sparkSession.read.parquet(storePath)
        sink(Funnel.windowFunnel(landed, userCol, typeCol, tsCol,
          steps, horizon), batchId)
    }
}
