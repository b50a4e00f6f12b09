package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink-side utilities for the tagged-union output convention.
  *
  * The reference fans out via Flink side outputs
  * (`OutputTag`/`getSideOutput`, e.g. TxMatchDetect.scala:22-24,81-83);
  * our operators emit a single stream with a `tag` column (SURVEY.md
  * §7.4.2). This helper splits one streaming query into per-tag
  * destinations inside foreachBatch — one pass over the micro-batch,
  * N filtered writes, instead of N independent queries recomputing the
  * upstream plan.
  */
object Sinks {

  /** Route each micro-batch to per-tag writers. Tags not present in
    * `routes` are dropped (mirror of an unconsumed side output).
    */
  def fanOutByTag(df: DataFrame, tagCol: String = "tag")(
      routes: Map[String, DataFrame => Unit]): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try routes.foreach { case (tag, write) =>
        write(batch.filter(batch.col(tagCol) === tag))
      } finally batch.unpersist()
    }
}
