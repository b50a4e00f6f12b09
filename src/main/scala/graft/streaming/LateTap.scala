package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

/** Late-data tap — the observable analog of Flink's
  * `allowedLateness` + `sideOutputLateData`
  * (hot-item-analysis HotItems.scala:80-81; SURVEY.md §2.5 W5).
  *
  * Spark's stateful operators silently DROP rows older than the
  * watermark; there is no built-in side output to observe them. This tap
  * restores observability: run it over the same watermarked stream as
  * the main pipeline and every row is re-emitted with a `tag` column —
  * `ontime` or `late` — where `late` means "older than the query's
  * current watermark, i.e. a downstream windowed aggregation would drop
  * (or has dropped) this row". Route the two tags to destinations with
  * [[Sinks.fanOutByTag]], or take just the late stream via [[lateRows]].
  *
  * How it works: `flatMapGroupsWithState` with `NoTimeout` does NOT
  * filter late input rows (only `EventTimeTimeout` does), while
  * `GroupState.getCurrentWatermarkMs()` still exposes the query
  * watermark — so a stateless pass through it can compare each row's
  * event time against exactly the threshold the engine evicts state
  * with. No state is ever stored; memory is O(1) per bucket.
  *
  * Scale: one hash shuffle into `buckets` groups (parallelism cap for
  * the tap, independent of key skew in the data — a hot user key does
  * not make a hot bucket because bucketing hashes the whole row).
  *
  * Boundary semantics: Spark filters late rows entering a stateful
  * operator with the watermark as of the PREVIOUS micro-batch, while
  * `getCurrentWatermarkMs` returns the current one (the state-eviction
  * threshold, one batch fresher). The late route is therefore a
  * SUPERSET of what a downstream aggregation drops: every genuinely
  * dropped row is tagged `late`, and a row racing the watermark within
  * one batch may be tagged `late` even though an aggregation in the
  * same batch still accepted it. For an audit stream that direction of
  * error is the safe one (no silent loss goes unobserved).
  */
object LateTap {

  val OnTimeTag = "ontime"
  val LateTag = "late"

  /** Re-emit every row of a watermarked stream with a `tagCol` of
    * `ontime`/`late` relative to the query watermark. Requires
    * `.withWatermark(tsCol, ...)` upstream (that is what defines the
    * threshold being audited).
    */
  def tagLate(df: DataFrame, tsCol: String = "ts", tagCol: String = "tag",
              buckets: Int = 64): DataFrame = {
    require(df.isStreaming, "LateTap.tagLate audits a streaming Dataset; " +
      "in batch there is no watermark and nothing is ever late")
    require(Watermarks.hasEventTimeWatermark(df),
      s"LateTap.tagLate: call .withWatermark(\"$tsCol\", ...) upstream — " +
        "the watermark is the late/on-time threshold being audited")
    val schema = df.schema
    val tsIdx = schema.fieldIndex(tsCol)
    require(schema(tsIdx).dataType == TimestampType,
      s"LateTap.tagLate: $tsCol must be TIMESTAMP, got ${schema(tsIdx).dataType}")
    val outSchema = StructType(
      schema.fields :+ StructField(tagCol, StringType, nullable = false))
    val nBuckets = buckets
    df.groupByKey(r => Math.floorMod(r.hashCode, nBuckets))(Encoders.scalaInt)
      .flatMapGroupsWithState[Int, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[Int]) =>
          val wm = state.getCurrentWatermarkMs()
          it.map { r =>
            val t = r.getTimestamp(tsIdx)
            val tag = if (t != null && t.getTime < wm) LateTag else OnTimeTag
            Row.fromSeq(r.toSeq :+ tag)
          }
      }(Encoders.scalaInt, Encoders.row(outSchema))
  }

  /** Just the late rows (original schema) — the direct analog of the
    * reference's `getSideOutput(lateTag)` stream.
    */
  def lateRows(df: DataFrame, tsCol: String = "ts"): DataFrame =
    tagLate(df, tsCol).filter(col("tag") === LateTag).drop("tag")
}
