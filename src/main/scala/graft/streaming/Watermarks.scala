package graft.streaming

import org.apache.spark.sql.Dataset

/** Shared plan introspection for operators that need an event-time
  * watermark upstream (late tap, CEP `within` timeouts): one place to
  * keep the node-detection idiom so every call site fails at PLAN time
  * with the operator's own message, not at stream start.
  */
object Watermarks {
  def hasEventTimeWatermark(ds: Dataset[_]): Boolean =
    ds.queryExecution.logical.collect {
      case p if p.nodeName == "EventTimeWatermark" => p
    }.nonEmpty
}
