package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for pretraining data prep — the concat-and-chunk
  * scheme: documents are concatenated in id order into one token
  * stream, which is cut into fixed `ctxLen` windows ("bins"); a
  * document's tokens land in the half-open global interval
  * [start, start+cnt), possibly spanning bins. Downstream writers read
  * off exactly which context windows a document feeds and at what
  * offset — the metadata a packed-batch writer needs.
  *
  * The global running sum is computed WITHOUT a single-partition
  * Window (the naive `sum over (order by id rows unbounded preceding)`
  * moves the whole table through one task): range-partition by id,
  * per-partition totals self-joined into prefix offsets (an
  * O(partitions²) frame of dust, never driver-collected), then a
  * streaming per-partition counter over the sorted pin — the same
  * two-pass shape as [[Quantiles.exactNtile]] (kept keyless and
  * self-contained here: exactNtile's per-group variant carries its
  * own collision-proofed columns and group joins; a future shared
  * prefix-sum core should absorb both). The pin is lazy — no collect,
  * no materialization pass; exactNtile's AQE construction caveat
  * applies ([[Checkpoints]] for the reliable-cluster mode).
  *
  * Output: (doc_id, token_cnt, start, first_bin, last_bin,
  * offset_in_first) — bins are `ctxLen`-sized, `div`/`%` integer math,
  * zero-token documents are excluded (they occupy no interval).
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, cntCol: String,
                    ctxLen: Int, partitions: Int = 0,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(ctxLen >= 1, "ctxLen must be >= 1")
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val parted = Checkpoints.pin(
      df.select(col(idCol).as("doc_id"), col(cntCol).cast("long").as("token_cnt"))
        .filter(col("token_cnt") > 0)
        .repartitionByRange(nParts, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .withColumn("_pid", spark_partition_id()),
      checkpointDir, eager = false)

    // pass 1: per-partition token totals → prefix offsets, distributed
    // via a self-join on the tiny totals frame (range partitions are
    // ordered by id, so the sum of lower-pid totals IS the partition's
    // global token offset)
    val totals = parted.groupBy(col("_pid")).agg(sum(col("token_cnt")).as("_tot"))
    val offsets = totals.select(col("_pid").as("_opid"))
      .crossJoin(totals.select(col("_pid").as("_bpid"), col("_tot")))
      .groupBy(col("_opid"))
      .agg(sum(when(col("_bpid") < col("_opid"), col("_tot")).otherwise(lit(0L)))
        .as("_off"))

    // pass 2: streaming per-partition running sum over the sorted pin
    val cntIdx = parted.schema.fieldIndex("token_cnt")
    val schema2 = parted.schema.add("_lsum", LongType, nullable = false)
    val summed = spark.createDataFrame(
      parted.rdd.mapPartitions { it =>
        var acc = 0L
        it.map { r =>
          acc += r.getLong(cntIdx)
          Row.fromSeq(r.toSeq :+ acc)
        }
      }, schema2)

    summed.join(broadcast(offsets), col("_pid") === col("_opid"))
      .withColumn("start", col("_off") + col("_lsum") - col("token_cnt"))
      .select(col("doc_id"), col("token_cnt"), col("start"),
        expr(s"start div $ctxLen").as("first_bin"),
        expr(s"(start + token_cnt - 1) div $ctxLen").as("last_bin"),
        expr(s"start % $ctxLen").as("offset_in_first"))
  }
}
