package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Behavior, Checkpoints, Graph, TextAnalysis}

/** The end-to-end "nightly ingest, all-day serving" topology as ONE
  * runnable job: a document stream and a transition-pair stream flow
  * CONCURRENTLY through the exact-index, positional-index,
  * collocation-count, and edge-warehouse ingest paths (foreachBatch,
  * slice = micro-batch id —
  * the same slice code paths the batch builders and [[graft.Stores]]
  * use, so a mid-stream read cannot drift from a batch build), while
  * q206/q209/q246-shaped serving reads answer from the live tables at
  * any moment between batches.
  *
  * This is the composition the per-family StreamingSpec ingest pins
  * prove piecewise; here it runs as one deployment-shaped unit and the
  * end-to-end pin asserts reads after batch N ≡ the same read bodies
  * over slices built from the first N batches' data.
  *
  * At 100 TB each ingest query is its own cluster job writing the
  * shared warehouse; the serving reads run in any number of separate
  * sessions against the same tables — nothing here assumes
  * single-process state beyond the catalog registration.
  */
object ServingWarehouse {

  /** The five live warehouse tables one serving deployment owns. */
  case class Tables(index: String, positional: String, edges: String,
                    colloc: String, chunks: String)

  /** Idempotence guard shared by every per-batch ingest: foreachBatch
    * is AT-LEAST-ONCE (a batch whose append commits but whose offset
    * commit is lost replays on restart), and a replayed append would
    * silently double every tf/weight the sum-merges serve (the
    * positional merge would raise on the duplicate positions — a
    * serving outage). The slice id (= batch id) already lives in
    * every store row, so the guard is one filtered existence probe:
    * a slice that landed is never appended twice. Spark's file commit
    * protocol makes the append itself all-or-nothing at job commit,
    * so "partially landed" slices cannot be observed.
    */
  private[graft] def ingestOnce(s: SparkSession, table: String, id: Long)
                              (write: => Unit): Unit = {
    s.catalog.refreshTable(table)
    if (s.table(table).filter(col("slice") === id).isEmpty) write
  }

  /** One document micro-batch through BOTH text stores — visible (not
    * an inline closure) so the idempotence pin can drive it directly.
    */
  private[graft] def ingestDocsBatch(batch: Dataset[Row], id: Long,
                                    t: Tables, buckets: Int): Unit = {
    val s = batch.sparkSession
    ingestOnce(s, t.index, id) {
      TextAnalysis.indexIngest(batch.withColumn("slice", lit(id)),
        "doc_id", "text", "slice", t.index, buckets)
    }
    ingestOnce(s, t.positional, id) {
      TextAnalysis.positionalIngest(batch.withColumn("slice", lit(id)),
        "doc_id", "text", "slice", t.positional, buckets)
    }
    ingestOnce(s, t.colloc, id) {
      TextAnalysis.collocIngest(batch.withColumn("slice", lit(id)),
        "text", "slice", t.colloc, buckets)
    }
    // chunk-level postings ride the SAME indexIngest path — a chunk
    // frame with composite cids IS a document frame to the index
    // machinery (the q282 posture, incremental form)
    ingestOnce(s, t.chunks, id) {
      TextAnalysis.indexIngest(
        TextAnalysis.chunkWords(batch, "doc_id", "text",
            chunkWords = 32, overlapWords = 8)
          .select((col("doc_id") * lit(100000L) + col("chunk_id"))
            .as("cid"), col("chunk"))
          .withColumn("slice", lit(id)),
        "cid", "chunk", "slice", t.chunks, buckets)
    }
  }

  /** One transition-pair micro-batch into the edge warehouse. */
  private[graft] def ingestPairsBatch(batch: Dataset[Row], id: Long,
                                     t: Tables, buckets: Int): Unit =
    ingestOnce(batch.sparkSession, t.edges, id) {
      Graph.edgeIngest(batch.withColumn("slice", lit(id)),
        "src", "dst", "slice", t.edges, buckets)
    }

  /** Start the two concurrent ingest queries over a document stream
    * (doc_id, text) and a transition-pair stream (src, dst). The
    * tables must already exist with matching bucket specs (the
    * bootstrap build — a nightly batch job or a first empty slice);
    * appends only add bucket files, never rewrite history, and a
    * replayed batch is skipped by the slice-id guard. Pass
    * `checkpointDir` in production so restarts resume from committed
    * offsets instead of replaying the source.
    */
  def start(docs: DataFrame, pairs: DataFrame, t: Tables,
            buckets: Int = 8,
            checkpointDir: Option[String] = None): Seq[StreamingQuery] = {
    def ck(w: org.apache.spark.sql.streaming.DataStreamWriter[Row],
           name: String) =
      checkpointDir.fold(w)(d => w.option("checkpointLocation", s"$d/$name"))
    Seq(
      ck(docs.writeStream.queryName(s"ingest_docs_${t.index}"), "docs")
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          ingestDocsBatch(batch, id, t, buckets)
        }.start(),
      ck(pairs.writeStream.queryName(s"ingest_pairs_${t.edges}"), "pairs")
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          ingestPairsBatch(batch, id, t, buckets)
        }.start())
  }

  /** The catalog's relation cache is SESSION-local and the ingest
    * queries write from their own (micro-batch-cloned) sessions, so a
    * long-lived serving session would otherwise keep answering from
    * the file listing it cached at its first read. Every serving read
    * refreshes first — the cost is a relisting of one table's bucket
    * files, the correctness is reads always seeing every landed slice
    * (exactly what a separate serving session against a shared
    * metastore does).
    */
  private def liveTable(s: SparkSession, name: String): DataFrame = {
    s.catalog.refreshTable(name)
    s.table(name)
  }

  /** q206-shaped read over the LIVE index table: two-term BM25 off
    * the capped merged postings; the corpus scalar (n_docs) derives
    * from the same merged frame, so the read is self-contained. The
    * merged frame feeds BOTH the capped postings and the n_docs
    * aggregate — pinned, or the slice-merge would execute twice per
    * read (the two-consumer rule).
    */
  def bm25Read(s: SparkSession, t: Tables, maxPostings: Int,
               k: Int): DataFrame = {
    val merged = Checkpoints.pin(
      TextAnalysis.indexMergeSlices(liveTable(s, t.index)),
      None, eager = false)
    TextAnalysis.bm25Query(
      TextAnalysis.cappedIndex(merged, maxPostings),
      merged.agg(countDistinct(col("doc_id")).as("n_docs")), k)
  }

  /** q209-shaped read over the LIVE positional table: exact-adjacency
    * phrase match for `terms` (a 1-row (w1, w2) frame); the store scan
    * is token-prefiltered before the position-set merge (the
    * storedPositional posture), so the aggregate touches only the
    * query terms' posting rows.
    */
  def phraseRead(s: SparkSession, t: Tables, terms: DataFrame,
                 k: Int): DataFrame = {
    val tokens = terms
      .select(explode(array(col("w1"), col("w2"))).as("token")).distinct()
    TextAnalysis.phraseQuery(
      TextAnalysis.positionalMergeSlices(
        liveTable(s, t.positional)
          .join(broadcast(tokens), Seq("token"), "left_semi")),
      terms, k)
  }

  /** q246-shaped read over the LIVE edge table: the per-item top-k
    * next-item recommendation table off the merged edge counts.
    */
  def nextItemRead(s: SparkSession, t: Tables, k: Int): DataFrame =
    Behavior.nextItemFromCounts(Graph.edgeMerge(liveTable(s, t.edges)),
      "src", "dst", "w", k)

  /** q264-shaped read over the LIVE index table: prefix autocomplete
    * off the term dictionary derived from the merged postings. The
    * dictionary is a DERIVED serving artifact (rebuilt per generation,
    * the cappedIndex posture), so the mid-stream form folds the landed
    * slices and prefix-ranks the result — new vocabulary becomes
    * suggestible the moment its slice lands.
    */
  def prefixRead(s: SparkSession, t: Tables, prefix: String,
                 k: Int): DataFrame =
    TextAnalysis.prefixSearch(
      TextAnalysis.termDictionary(
        TextAnalysis.indexMergeSlices(liveTable(s, t.index))),
      prefix, k)

  /** q278-shaped read over the LIVE collocation-count table: the
    * seed's expansion terms off the lift table derived from the
    * merged counts (the prefixRead posture — the dictionary is a
    * derived artifact, so the mid-stream form folds the landed count
    * slices and the statistics shift with every generation). The w1
    * bucketing keeps the (w1, w2) merge zero-Exchange.
    */
  def expansionRead(s: SparkSession, t: Tables, seed: String, e: Int,
                    minCount: Long): DataFrame =
    TextAnalysis.expandTerms(
      TextAnalysis.collocationTableFrom(
        TextAnalysis.collocMergeSlices(liveTable(s, t.colloc)),
        minCount),
      seed, e)

  /** q282-shaped read over the LIVE chunk-posting table: passage
    * retrieval (MaxP) off the capped view of the merged chunk
    * postings. Unlike the batch store pair (capped index + persisted
    * chunk count), the mid-stream form holds the UNCAPPED merged
    * slices, so the exact chunk count derives from them directly —
    * no chunk can be capped out of a distinct-count that runs before
    * the cap.
    */
  def passageRead(s: SparkSession, t: Tables, terms: DataFrame,
                  nTerms: Int, k: Int): DataFrame = {
    val merged = Checkpoints.pin(
      TextAnalysis.indexMergeSlices(liveTable(s, t.chunks)),
      None, eager = false) // two consumers: capped view + chunk count
    TextAnalysis.passageSearch(
      TextAnalysis.cappedIndex(merged, maxPostings = 1000),
      merged.agg(countDistinct(col("doc_id")).as("n_chunks")),
      terms, nTerms, k)
  }
}
