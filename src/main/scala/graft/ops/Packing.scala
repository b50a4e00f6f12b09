package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * moves the whole table through one task): it is the keyless form of
  * [[PrefixSum.runningTotals]] — range partition by id, lazy pin,
  * distributed two-pass prefix offsets (mechanics and the AQE
  * construction caveat documented there; [[Checkpoints]] for the
  * reliable-cluster mode).
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
    val proj = df
      .select(col(idCol).as("doc_id"), col(cntCol).cast("long").as("token_cnt"))
      .filter(col("token_cnt") > 0)
    // inclusive running token total over id order (keyless: one global
    // sequence); start = total minus own count
    PrefixSum.runningTotals(proj, groupCols = Nil, orderCols = Seq("doc_id"),
        valueCol = Some("token_cnt"), runCol = "_rsum",
        partitions = partitions, checkpointDir = checkpointDir)
      .withColumn("start", col("_rsum") - col("token_cnt"))
      .select(col("doc_id"), col("token_cnt"), col("start"),
        expr(s"start div $ctxLen").as("first_bin"),
        expr(s"(start + token_cnt - 1) div $ctxLen").as("last_bin"),
        expr(s"start % $ctxLen").as("offset_in_first"))
  }
}
