package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.ops.TopN

/** T1 streaming form (HotItems.scala:83-84,132-175).
  *
  * Ranking window functions are unsupported over update/append streams,
  * so the rank runs inside foreachBatch on the append-mode windowed-agg
  * output. Append mode emits each window exactly once — when the
  * watermark passes its end — which is precisely the reference's
  * "timer at windowEnd+1" firing condition (HotItems.scala:148), minus
  * its 1s emission sleep (a documented quirk, SURVEY.md Appendix A.4).
  */
object StreamingTopN {
  def writer(windowCounts: DataFrame, partitionCols: Seq[String],
             orderCol: String, tieBreakCols: Seq[String], n: Int)(
             sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    windowCounts.writeStream.outputMode("append").foreachBatch {
      (df: DataFrame, batchId: Long) =>
        sink(TopN.perGroup(df, partitionCols, orderCol, tieBreakCols, n), batchId)
    }
}
