package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Graph, TextAnalysis}

/** Materialized serving stores over the driver's tables — the "index
  * built at ingest, queries read the store" posture every real engine
  * has (a search engine never rebuilds postings at query time; a graph
  * store never re-derives its edge list per query).
  *
  * Each store is a token/key-bucketed parquet table in the session
  * warehouse, built ONCE per JVM per source directory (memoized below)
  * through the SAME slice code path the incremental ingest uses
  * ([[TextAnalysis.indexSlices]] etc. — one code path, so a
  * store-backed read cannot drift from a corpus rescan; the q204
  * identity), then served to every query that needs the artifact. At
  * 100 TB the build is the ingest pipeline's job and runs once per
  * slice ever; here it runs once per process — the first query of a
  * family pays it, the rest read bucket files with pushed filters and
  * zero-Exchange merges.
  *
  * The memo key includes the source directory, so sf0.001 test runs
  * and sf0.1 bench runs in one JVM keep separate tables. Writes go
  * through `mode("overwrite")`, so a stale table from a previous
  * process is replaced, never trusted.
  */
object Stores {

  /** table-name → built flag; computeIfAbsent makes the build
    * exactly-once per JVM even under concurrent first readers.
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def key(dir: String): String =
    dir.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")

  private def serve(s: SparkSession, table: String)
                   (build: => Unit): DataFrame = {
    built.computeIfAbsent(table, _ => {
      // the default catalog is in-memory and dies with the JVM, but
      // managed-table FILES survive in the warehouse dir — a fresh
      // process would hit LOCATION_ALREADY_EXISTS on its first write.
      // An unregistered location is by definition stale (this memo is
      // the only writer): remove it, never trust it.
      if (!s.catalog.tableExists(table)) {
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), table)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      build
      java.lang.Boolean.TRUE
    })
    s.table(table)
  }

  /** Test/maintenance hook: forget the memo for `dir`'s stores so the
    * next read rebuilds (e.g. after a spec drops the tables).
    */
  private[graft] def invalidate(dir: String): Unit = {
    val k = key(dir)
    built.keySet.removeIf(_.endsWith(k))
  }

  /** The exact inverted-index store over `documents`: token-bucketed
    * (slice, token, doc_id, tf) posting slices written by
    * [[TextAnalysis.writeIndexStore]]; read by
    * [[TextAnalysis.indexMergeSlices]] → [[TextAnalysis.cappedIndex]]
    * with a zero-Exchange tf-sum merge (HashPartitioning(token)
    * satisfies the (token, doc_id) clustering).
    */
  def index(s: SparkSession, dir: String): DataFrame = {
    val t = s"graft_idx_${key(dir)}"
    serve(s, t) {
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          Tables.documents(s, dir).withColumn("slice", lit(0L)),
          "doc_id", "text", "slice"),
        table = t, buckets = 16)
    }
  }

  /** The POSITIONAL index store — the phrase/proximity serving
    * artifact: token-bucketed (slice, token, doc_id, tf, positions)
    * rows from [[TextAnalysis.positionalSlices]]; read through
    * [[TextAnalysis.positionalMergeSlices]] (zero-Exchange — the
    * bucket layout satisfies the (token, doc_id) clustering). Real
    * engines never rebuild postings at query time; before this store
    * the phrase/proximity reads posexploded the whole corpus per
    * query.
    */
  def positional(s: SparkSession, dir: String): DataFrame = {
    val t = s"graft_pidx_${key(dir)}"
    serve(s, t) {
      TextAnalysis.writeIndexStore(
        TextAnalysis.positionalSlices(
          Tables.documents(s, dir).withColumn("slice", lit(0L)),
          "doc_id", "text", "slice"),
        table = t, buckets = 16)
    }
  }

  /** The BM25 "norms file" beside the index: (doc_id, dl) — one narrow
    * projection of the corpus, persisted because the capped index
    * cannot recover document length (exactly why real engines store
    * norms separately).
    */
  def norms(s: SparkSession, dir: String): DataFrame = {
    val t = s"graft_norms_${key(dir)}"
    serve(s, t) {
      TextAnalysis.docNorms(Tables.documents(s, dir), "doc_id", "text")
        .write.mode("overwrite").format("parquet").saveAsTable(t)
    }
  }

  /** The transition-EDGE warehouse over `events`: src-bucketed
    * (slice, src, dst, w) slices from [[Graph.edgeSlices]] over the
    * shared [[SparkEntry.transitionPairs]] pair log. The per-user
    * ordering Window that derives transitions runs ONCE here (the
    * ingest-time transform); every graph read — PageRank, cohesion,
    * k-hop, next-item — folds the store through [[Graph.edgeMerge]]
    * (zero-Exchange on the src buckets) instead of re-scanning the
    * event log.
    */
  def edges(s: SparkSession, dir: String): DataFrame = {
    val t = s"graft_edges_${key(dir)}"
    serve(s, t) {
      Graph.edgeSlices(
          SparkEntry.transitionPairs(s, dir).withColumn("slice", lit(0L)),
          "item_id", "nxt", "slice")
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "src").sortBy("src").saveAsTable(t)
    }
  }
}
