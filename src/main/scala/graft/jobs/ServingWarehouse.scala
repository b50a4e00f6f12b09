package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Behavior, Checkpoints, Graph, TextAnalysis}

/** The end-to-end "nightly ingest, all-day serving" topology as ONE
  * runnable job: a document stream, a transition-pair stream, and an
  * optional embedding stream flow CONCURRENTLY through the
  * exact-index, positional-index, chunk-index, collocation-count,
  * dictionary-tier (df-delta + variant + trigram), edge-warehouse,
  * and PQ-code ingest paths (foreachBatch, slice = micro-batch id —
  * the same slice code paths the batch builders and [[graft.Stores]]
  * use, so a mid-stream read cannot drift from a batch build), while
  * q206/q209/q246/q264/q265/q266/q278/q282/q89/q92-shaped serving
  * reads answer from the live tables at any moment between batches.
  *
  * The full write-side lifecycle runs here too: [[forgetApply]]
  * lands an erasure request between batches (tombstones + the
  * id-addressed delete log through the same at-least-once guard) and
  * [[compact]] folds accumulated micro-batch slices into
  * target-sized generations — reads identical before/after both.
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

  /** The serving posting cap every mid-stream capped read shares —
    * one constant, so the passage and BM25 reads cannot silently
    * drift from each other or from the batch stores' 1000-posting
    * contract (ADVICE r18).
    */
  private[graft] val MaxPostings = 1000

  /** The live warehouse tables one serving deployment owns: the five
    * posting/count families, the three slice-derived dictionary-tier
    * stores (dict = (slice, token, d_df, d_cf) deltas; delneigh /
    * tgram = their variant/gram expansions — an ingest batch appends
    * batch-vocabulary-sized slices instead of rebuilding any of them),
    * the id-addressed delete log ([[forgetApply]] writes it;
    * [[phraseRead]] and the ANN reads anti-join it), and the vector
    * family (pq = the slice-tagged code table; pqcb / pqcoarse = the
    * train-once model tables every batch encodes at).
    */
  case class Tables(index: String, positional: String, edges: String,
                    colloc: String, chunks: String, dict: String,
                    delneigh: String, tgram: String, deletes: String,
                    pq: String, pqcb: String, pqcoarse: String,
                    bands: String)

  /** The vector family's fixed quantization regimen for one warehouse
    * — chosen once at [[trainVectorModel]]. Ingest batches and
    * serving reads DERIVE it from the written codebook table
    * ([[readModel]]) rather than trusting a caller-passed copy: two
    * factorizations of the same dimension (2×4 vs 4×2) would pass
    * every length check and silently mis-encode.
    */
  case class VectorModel(m: Int, subDim: Int)

  /** The model AS WRITTEN: m = number of subspaces in the codebook
    * table, subDim = its centroid length — one tiny aggregate over
    * the m×k* table, the single source of truth every ingest batch
    * and read resolves against.
    */
  def readModel(s: SparkSession, t: Tables): VectorModel = {
    val r = s.table(t.pqcb)
      .agg((max(col("sub")) + 1).cast("int"),
        max(size(col("c_vec"))).cast("int"))
      .head()
    VectorModel(r.getInt(0), r.getInt(1))
  }

  /** Train-once bootstrap of the vector family: PQ codebooks (a Lloyd
    * pass over `trainVecs`) and the coarse IVF centroid table are
    * WRITTEN as the warehouse's model tables, and the code table is
    * created empty with its centroid-bucketed spec fixed. Every later
    * ingest batch encodes at THESE fixed artifacts ([[Pq.pqIngest]]
    * — re-training is a store rewrite, everywhere), so mid-stream
    * reads and a one-shot encode of the same vectors cannot differ.
    */
  def trainVectorModel(s: SparkSession, t: Tables, trainVecs: DataFrame,
                       coarseIds: Seq[Long], initIds: Seq[Long],
                       model: VectorModel, buckets: Int,
                       path: Option[java.nio.file.Path] = None): Unit = {
    def p(name: String) = path.map(_.resolve(name).toString)
    def w(df: DataFrame, table: String, name: String): Unit = {
      val wr = df.write.mode("overwrite").format("parquet")
      p(name).fold(wr)(pp => wr.option("path", pp)).saveAsTable(table)
    }
    w(graft.ops.Pq.codebooks(trainVecs, "vec_id", "embedding",
        m = model.m, subDim = model.subDim, initIds = initIds,
        iters = 1, orderedMeans = true),
      t.pqcb, "pqcb")
    w(trainVecs.filter(col("vec_id").isin(coarseIds: _*))
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("c_vec")),
      t.pqcoarse, "pqcoarse")
    graft.ops.Bucketing.writeBucketed(
      graft.ops.Pq.codeRows(trainVecs.limit(0), "vec_id", "embedding",
          s.table(t.pqcb), s.table(t.pqcoarse),
          m = model.m, subDim = model.subDim)
        .withColumn("slice", lit(0L)),
      t.pq, Seq("centroid_id"), buckets, sortCols = Seq("centroid_id"),
      path = p("pq"))
  }

  /** One vector micro-batch into the code table — [[Pq.pqIngest]] at
    * the warehouse's fixed model, slice-tagged for the at-least-once
    * guard.
    */
  private[graft] def ingestVecsBatch(batch: Dataset[Row], id: Long,
                                     t: Tables, buckets: Int): Unit = {
    val s = batch.sparkSession
    val model = readModel(s, t) // the model AS WRITTEN — never a copy
    ingestOnce(s, t.pq, id) {
      graft.ops.Pq.pqIngest(batch, "vec_id", "embedding",
        s.table(t.pqcb), s.table(t.pqcoarse), t.pq, buckets,
        m = model.m, subDim = model.subDim, slice = Some(id))
    }
  }

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
    *
    * The probe alone does not survive COMPACTION: the nightly rewrite
    * re-tags folded slices to their bin's low generation id, so a
    * batch replayed across a compaction boundary would find no live
    * slice and double-apply. [[graft.Stores.compact]] records every
    * folded id in the table's `_wm` watermark sidecar before its swap
    * — the guard consults it first, so the durability contract holds
    * WITHOUT requiring compaction to run at a quiescent point.
    */
  private[graft] def ingestOnce(s: SparkSession, table: String, id: Long)
                              (write: => Unit): Unit = {
    if (graft.Stores.foldedSlices(s, table).contains(id)) return
    s.catalog.refreshTable(table)
    if (s.table(table).filter(col("slice") === id).isEmpty) write
  }

  /** One document micro-batch through BOTH text stores — visible (not
    * an inline closure) so the idempotence pin can drive it directly.
    *
    * Enforces the dictionary tier's ONE-SLICE-PER-DOC contract at the
    * door (ADVICE r19): [[TextAnalysis.dictSlices]] counts d_df once
    * per (slice, token, doc), so a doc re-sent or split across
    * micro-batches would inflate df in the dict/delneigh/tgram stores
    * WITHOUT tripping the merge consistency check (cf ≥ df still
    * holds) — silent statistical drift, the worst kind. The guard is
    * one existence probe: any batch doc_id already present in the
    * index store under a DIFFERENT slice raises (same slice = a
    * partial replay backfilling the remaining families — legal;
    * erased-then-re-ingested ids also land here, correctly: the
    * standing content tombstone would cancel the new ingest).
    * Cost: a broadcast semi-join over the store's two narrow id
    * columns per ingest batch — fine at micro-batch cadence; the
    * 100 TB variant keeps a doc_id-bucketed (slice, doc_id) sidecar
    * so the probe is bucket-pruned instead of a column scan.
    */
  /** The one-slice-per-doc guard's doc-id SIDECAR beside the index
    * store: doc_id-bucketed (slice, doc_id) rows, one per document per
    * ingest batch — so the per-batch duplicate probe reads a
    * doc-count-scale table with BUCKET PRUNING on the batch's ids
    * (SelectedBucketsCount in the plan) instead of scanning the index
    * store's posting-scale id columns every micro-batch (r20 verdict
    * item 3; the scaladoc's promised 100 TB variant). Maintained
    * through the same [[ingestOnce]] replay guard as the data
    * families; created lazily with a one-time backfill from the index
    * store, so a warehouse that predates the sidecar upgrades itself
    * on its next ingest batch.
    */
  private[graft] def docIdsSidecar(t: Tables): String = t.index + "_ids"

  /** The duplicate-doc probe over the sidecar, exposed for the plan
    * pin: batch ids arrive as LITERALS (micro-batch scale — the old
    * probe already broadcast the same set), so the bucketed scan
    * prunes to the ids' buckets. The planner's auto-bucketed-scan
    * heuristic would DISABLE the bucketed read here (no join/agg wants
    * the hash partitioning — it cannot see that pruning is the point),
    * so the plan is pinned under autoBucketedScan=false and the conf
    * restored before returning.
    */
  private[graft] def dupProbe(s: SparkSession, t: Tables,
                              batchIds: Seq[Long], id: Long): DataFrame = {
    // NOTE (ADVICE r21): mutating the session-global conf assumes the
    // single-threaded ingest loop this warehouse runs under — a
    // concurrent query planned in the same session during this window
    // would plan with bucketed scans disabled.
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = s.conf.getOption(conf)
    s.conf.set(conf, "false")
    try {
      // the limit(1) lives INSIDE the conf window (ADVICE r21): a
      // caller-side .limit(1) would build a NEW QueryExecution planned
      // AFTER the conf was restored, silently discarding the pruned
      // plan — collect() on the returned frame reuses the
      // QueryExecution forced here
      val df = s.table(docIdsSidecar(t))
        .filter(col("doc_id").isin(batchIds: _*) && col("slice") =!= id)
        .select(col("doc_id"))
        .limit(1)
      df.queryExecution.executedPlan // fix the bucket-pruned plan now
      df
    } finally saved match {
      case Some(v) => s.conf.set(conf, v)
      case None    => s.conf.unset(conf)
    }
  }

  private[graft] def ingestDocsBatch(batch: Dataset[Row], id: Long,
                                    t: Tables, buckets: Int): Unit = {
    val s = batch.sparkSession
    val sidecar = docIdsSidecar(t)
    val batchDocIds = batch.select(col("doc_id")).distinct()
    if (!graft.Stores.foldedSlices(s, t.index).contains(id)) {
      val dup =
        if (s.catalog.tableExists(sidecar)) {
          s.catalog.refreshTable(sidecar)
          // literal ids → bucket-pruned scan of the doc-scale sidecar.
          // A pathological mega-batch would build a mega-In filter;
          // past the cap, fall back to the semi-join form (still
          // sidecar-scale, just unpruned)
          val ids = batchDocIds.limit(100001).collect().map(_.getLong(0))
          if (ids.length <= 100000)
            dupProbe(s, t, ids.toIndexedSeq, id).collect()
          else
            s.table(sidecar).filter(col("slice") =!= id)
              .join(broadcast(batchDocIds), Seq("doc_id"), "left_semi")
              .select(col("doc_id")).limit(1).collect()
        } else {
          // pre-sidecar warehouse: one last posting-scale probe (the
          // backfill below upgrades it for every later batch)
          s.catalog.refreshTable(t.index)
          s.table(t.index).filter(col("slice") =!= id)
            .join(broadcast(batchDocIds), Seq("doc_id"), "left_semi")
            .select(col("doc_id")).limit(1).collect()
        }
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"ingestDocsBatch: doc_id ${dup.head.get(0)} in batch $id is "
            + "already ingested under another slice — the dictionary "
            + "tier requires each document to land wholly in ONE slice "
            + "(a re-send or split across micro-batches would silently "
            + "inflate df); dedup the feed upstream or erase the old "
            + "copy first")
    }
    ingestOnce(s, t.index, id) {
      TextAnalysis.indexIngest(batch.withColumn("slice", lit(id)),
        "doc_id", "text", "slice", t.index, buckets)
    }
    // the sidecar lands right after the index family under its OWN
    // replay guard: a crash between the two appends replays the batch
    // — the index skips, the sidecar backfills — so the probe's source
    // can lag by at most one in-flight batch and always heals. First
    // touch of a pre-sidecar warehouse creates it with a one-time
    // backfill of every landed (slice, doc_id) from the index store.
    if (!s.catalog.tableExists(docIdsSidecar(t))) {
      s.catalog.refreshTable(t.index)
      graft.ops.Bucketing.writeBucketed(
        s.table(t.index).select(col("slice"), col("doc_id")).distinct(),
        docIdsSidecar(t), Seq("doc_id"), buckets,
        sortCols = Seq("doc_id"))
    } else ingestOnce(s, docIdsSidecar(t), id) {
      graft.ops.Bucketing.appendBucketed(
        batchDocIds.withColumn("slice", lit(id))
          .select(col("slice"), col("doc_id")),
        docIdsSidecar(t), Seq("doc_id"), buckets,
        sortCols = Seq("doc_id"))
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
    // machinery (the q282 posture, incremental form). The cid
    // projection is [[graft.Stores.chunkCids]] — the ONE guarded
    // derivation the batch store build uses, so width/overlap/key-base
    // cannot desync between the two paths (ADVICE r18)
    ingestOnce(s, t.chunks, id) {
      TextAnalysis.indexIngest(
        graft.Stores.chunkCids(batch).withColumn("slice", lit(id)),
        "cid", "chunk", "slice", t.chunks, buckets)
    }
    // the dictionary TIER: df/cf deltas and their variant/gram
    // expansions, each derived from the batch's OWN posting slice
    // (work ∝ batch vocabulary — never a rebuild; the merge-on-read
    // folds make prefix/fuzzy/infix reads serve every landed slice)
    val dslice = TextAnalysis.dictSlices(
      TextAnalysis.indexSlices(batch.withColumn("slice", lit(id)),
        "doc_id", "text", "slice"))
    ingestOnce(s, t.dict, id) {
      graft.ops.Bucketing.appendBucketed(dslice, t.dict,
        Seq("token"), buckets, sortCols = Seq("token"))
    }
    ingestOnce(s, t.delneigh, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.delneighSlices(dslice), t.delneigh,
        Seq("variant"), buckets, sortCols = Seq("variant"))
    }
    ingestOnce(s, t.tgram, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.tgramSlices(dslice), t.tgram,
        Seq("gram"), buckets, sortCols = Seq("gram"))
    }
    // MinHash band rows — the near-dup family's ingest artifact: the
    // batch's shingle→minhash pipeline runs here ONCE; the dedup read
    // ([[nearDupRead]]) only probes buckets
    ingestOnce(s, t.bands, id) {
      graft.ops.Bucketing.appendBucketed(
        graft.ops.Dedup.minhashBands(batch, "doc_id", "text")
          .withColumn("slice", lit(id)),
        t.bands, Seq("band_hash"), buckets,
        sortCols = Seq("band_hash"))
    }
  }

  /** Drift MONITOR for the vector family — the [[retrain]] trigger: a
    * probe sample of current raw vectors encodes at the warehouse's
    * WRITTEN model and one row of reconstruction statistics comes
    * back: n, mean squared quantization error (‖v − decode(encode(v))‖²
    * — the quantity ADC's ranking quality decays with) and mean
    * squared distance to the assigned coarse centroid (list balance).
    * Trend it against the value recorded at train time: a rising
    * curve means the embedding distribution has drifted off the fixed
    * codebooks and recall is silently degrading (VERDICT r19 item 2).
    * Work ∝ the probe sample (broadcast codebook/centroid joins, one
    * narrow aggregate) — never the store.
    */
  def vectorModelAudit(s: SparkSession, t: Tables,
                       probe: DataFrame): DataFrame = {
    val model = readModel(s, t)
    graft.functions.VectorExprs.ensureRegistered(s)
    val cbs = s.table(t.pqcb)
    val sv = probe
      .select(col("vec_id"),
        explode(expr(s"sequence(0L, ${model.m - 1}L)")).as("sub"),
        col("embedding"))
      .select(col("vec_id"), col("sub"),
        expr(s"transform(slice(embedding, CAST(sub * ${model.subDim} + 1"
          + s" AS INT), ${model.subDim}), x -> CAST(x AS DOUBLE))")
          .as("v"))
    // DECIMAL partial sums (the q89 ADC convention): double addition
    // is not associative, so the per-vector m-term fold and the
    // probe-wide mean must be exact to stay engine- and
    // partitioning-reproducible — this audit is oracled (q299)
    val qerr = graft.ops.Pq.encode(probe, "vec_id", "embedding", cbs,
        m = model.m, subDim = model.subDim)
      .join(sv, Seq("vec_id", "sub"))
      .join(broadcast(cbs), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(expr(
        "CAST(round(array_sqdiff(v, c_vec), 6) AS DECIMAL(28,10))"))
        .as("sq"))
    val cerr = graft.ops.Similarity.assignWith(probe, "vec_id",
      "embedding", s.table(t.pqcoarse))
    qerr.join(cerr, Seq("vec_id"))
      .agg(count(lit(1)).as("n_probe"),
        sum(col("sq")).as("_sq"),
        sum(expr("CAST(round(dist * dist, 6) AS DECIMAL(28,10))"))
          .as("_cd"))
      .select(col("n_probe"),
        round(col("_sq").cast("double") / col("n_probe"), 6)
          .as("mse_quant"),
        round(col("_cd").cast("double") / col("n_probe"), 6)
          .as("mse_coarse"))
  }

  /** RETRAIN the vector family — the store-generation bump the
    * fixed-model contract requires once [[vectorModelAudit]] shows
    * drift: NEW codebooks and a new coarse table train on the
    * SURVIVING vectors (`rawVecs` minus the delete log — an erased
    * vector must not shape the replacement model either), and the
    * code table re-encodes from those survivors at the new model as
    * ONE fresh generation.
    *
    * Durability, in the [[graft.Stores.compact]] order:
    *   1. the new code rows materialize into a `_retraining` sibling
    *      BEFORE any live table is touched — a failure up to here
    *      changes nothing;
    *   2. every pre-retrain generation id lands in the code table's
    *      `_wm` watermark sidecar: the re-encode already contains
    *      those batches' vectors, so a pre-retrain batch replayed
    *      after the bump must be skipped (it would re-encode its
    *      vectors at the new model ON TOP of the rewrite — doubled
    *      rows under two generation tags);
    *   3. the model tables and the code table swap to the new
    *      artifacts (external locations preserved — the compaction
    *      lesson); a failure mid-swap leaves the sibling in place and
    *      the raise names it. The swap is three table writes, so a
    *      failure BETWEEN them leaves model and codes from different
    *      generations — reads in that window are inconsistent (ADC
    *      against mismatched codebooks ranks garbage, and `readModel`
    *      cannot detect it when m/subDim agree). RECOVERY IS A
    *      RE-RUN: retrain recomputes everything from `trainVecs` /
    *      `rawVecs` and the delete log, so running it again converges
    *      from any failure point (or restore just the code table from
    *      the sibling via `Stores.recoverCompacting(..., from =
    *      Some(tmp))` when the model tables already swapped). Serve
    *      reads from a quiescent point across the swap — at a real
    *      metastore the three writes become one versioned-table
    *      transaction.
    *
    * The delete log itself STAYS: erasures issued before the retrain
    * are physically absent from the rewritten store (and from the new
    * model's training set), and reads keep anti-joining the log for
    * erasures issued after. `readModel` keeps deriving the regimen
    * from the written codebooks, so every later [[ingestVecsBatch]]
    * encodes at the NEW model with no deployment-side coordination.
    */
  def retrain(s: SparkSession, t: Tables, trainVecs: DataFrame,
              rawVecs: DataFrame, coarseIds: Seq[Long],
              initIds: Seq[Long], model: VectorModel,
              buckets: Int): Unit = {
    def surviving(vecs: DataFrame) = graft.ops.Forget.rowErase(
      vecs.select(col("vec_id"), col("embedding")), "vec_id",
      liveTable(s, t.deletes))
    val live = surviving(rawVecs)
    // the m×k*-row codebook frame feeds BOTH the sibling encode and
    // the model-table swap — pinned so the Lloyd pass runs once
    val cbs = graft.ops.Checkpoints.pin(
      graft.ops.Pq.codebooks(surviving(trainVecs), "vec_id", "embedding",
        m = model.m, subDim = model.subDim, initIds = initIds,
        iters = 1, orderedMeans = true),
      None, eager = false)
    val coarse = live.filter(col("vec_id").isin(coarseIds: _*))
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("c_vec"))
    def keepLoc(table: String): Option[String] = {
      val meta = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      if (meta.tableType ==
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)
        Some(meta.location.toString)
      else None
    }
    // 1. write-aside the re-encoded code table at the new model. The
    //    generation listing is taken FIRST: it is both the watermark
    //    record and the baseline for the pre-swap concurrent-append
    //    check (the Stores.compact discipline)
    def pqIds(): Set[Long] = {
      s.catalog.refreshTable(t.pq)
      s.table(t.pq).select(col("slice").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
    }
    val snapshotIds = pqIds()
    val tmp = t.pq + "_retraining"
    try graft.ops.Bucketing.writeBucketed(
      graft.ops.Pq.codeRows(live, "vec_id", "embedding", cbs, coarse,
          m = model.m, subDim = model.subDim)
        .withColumn("slice", lit(0L)),
      tmp, Seq("centroid_id"), buckets, sortCols = Seq("centroid_id"))
    catch { case e: Throwable =>
      s.sql(s"DROP TABLE IF EXISTS $tmp"); throw e
    }
    // a vector batch that landed AFTER the re-encode materialized is
    // NOT inside the sibling — swapping would silently discard it
    // (its checkpoint offset is committed; nothing replays). Abort
    // loudly; everything is intact and a re-run converges.
    val appended = pqIds() -- snapshotIds
    if (appended.nonEmpty) {
      s.sql(s"DROP TABLE IF EXISTS $tmp")
      throw new IllegalStateException(
        s"ServingWarehouse.retrain: generation(s) "
          + s"${appended.toSeq.sorted.mkString(", ")} landed in ${t.pq} "
          + "during the re-encode — swapping would silently discard "
          + "them. Nothing was changed; stop the ingest (or re-run at "
          + "a quieter moment) and retrain again")
    }
    // 2. watermark the superseded generations (their vectors are in
    //    the re-encode whichever way the swap goes)
    graft.Stores.recordFolded(s, t.pq, snapshotIds.toIndexedSeq)
    // 3. swap: model tables first (small), then the code table from
    //    the sibling. Locations resolve BEFORE any entry is dropped.
    val pqLoc = keepLoc(t.pq)
    try {
      def w(df: DataFrame, table: String): Unit = {
        val wr = df.write.mode("overwrite").format("parquet")
        keepLoc(table).fold(wr)(p => wr.option("path", p))
          .saveAsTable(table)
      }
      w(cbs, t.pqcb)
      w(coarse, t.pqcoarse)
      graft.ops.Bucketing.writeBucketed(s.table(tmp), t.pq,
        Seq("centroid_id"), buckets, sortCols = Seq("centroid_id"),
        path = pqLoc)
    } catch { case e: Throwable =>
      val loc = pqLoc
      throw new IllegalStateException(
        s"ServingWarehouse.retrain: swap failed mid-way — model tables "
          + s"(${t.pqcb}, ${t.pqcoarse}) and code table (${t.pq}) may "
          + "now be from DIFFERENT generations; do not serve reads. "
          + "RE-RUN retrain to converge (it recomputes everything from "
          + s"its inputs and the delete log); the re-encoded codes "
          + s"also SURVIVE in $tmp — Stores.recoverCompacting(spark, "
          + s"\"${t.pq}\", Seq(\"centroid_id\"), $buckets, "
          + s"path = ${loc.map("Some(\"" + _ + "\")").getOrElse("None")}, "
          + s"from = Some(\"$tmp\")) restores just "
          + "the code table when the model tables already swapped", e)
    }
    s.sql(s"DROP TABLE IF EXISTS $tmp")
    s.catalog.refreshTable(t.pq)
    s.catalog.refreshTable(t.pqcb)
    s.catalog.refreshTable(t.pqcoarse)
  }

  /** q296-shaped read over the LIVE band table: a candidate document
    * frame (e.g. the next crawl slice, BEFORE ingesting it) computes
    * only its own bands and probes the standing corpus's buckets —
    * the admission-control dedup gate a streaming pipeline runs per
    * arrival batch. Erased docs drop via the shared delete log.
    */
  def nearDupRead(s: SparkSession, t: Tables, candidates: DataFrame,
                  maxBucketSize: Int = 10000): DataFrame =
    graft.ops.Dedup.nearDupAgainstStore(candidates, "doc_id", "text",
      graft.ops.Forget.rowErase(liveTable(s, t.bands), "doc_id",
        liveTable(s, t.deletes)),
      maxBucketSize)

  /** Right-to-be-forgotten applied to the LIVE warehouse — the WRITE
    * half of [[graft.ops.Forget.erase]]: one erasure request lands as
    * content tombstone slices appended to the index / chunk /
    * collocation / dictionary-tier tables (each through the same
    * at-least-once slice guard the ingest uses) plus the request's
    * ids appended to the positional delete log. Reads pick everything
    * up on their next merge — no table is rewritten, history files
    * stay untouched (the LSM posture), and a compaction that later
    * rewrites without the erased rows serves identical results.
    *
    * `docs` is the request's (doc_id, text) rows AS INGESTED (the
    * content-addressed tombstone contract). `id` is the request's
    * slice tag — use a NEGATIVE id (micro-batch ids are ≥ 0), and
    * NEVER REUSE one: the id is the request's idempotence key for its
    * whole lifetime — a replay of the same request MUST carry the
    * same id (skipped by the slice/watermark guard), and a NEW
    * request must carry a fresh one (a reused id is indistinguishable
    * from a replay and is silently skipped, even after compaction has
    * folded the original tombstone away — the `_wm` sidecar remembers
    * consumed ids forever).
    */
  def forgetApply(s: SparkSession, t: Tables, docs: DataFrame,
                  id: Long, buckets: Int): Unit = {
    require(id < 0,
      "forgetApply: use a negative slice id — micro-batch ids are >= 0 "
        + "and a collision would silently skip the erasure")
    val tagged = docs.withColumn("slice", lit(id))
    ingestOnce(s, t.index, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.indexTombstones(tagged, "doc_id", "text", "slice"),
        t.index, Seq("token"), buckets, sortCols = Seq("token"))
    }
    ingestOnce(s, t.colloc, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.collocTombstones(tagged, "text", "slice"),
        t.colloc, Seq("w1"), buckets, sortCols = Seq("w1"))
    }
    ingestOnce(s, t.chunks, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.indexTombstones(
          graft.Stores.chunkCids(tagged).withColumn("slice", lit(id)),
          "cid", "chunk", "slice"),
        t.chunks, Seq("token"), buckets, sortCols = Seq("token"))
    }
    // dictionary-tier tombstones: the SAME dictSlices derivation over
    // the negated posting slice — d_df/d_cf land negative and cancel
    // at merge (vocabulary extinction included)
    val dtomb = TextAnalysis.dictSlices(
      TextAnalysis.indexTombstones(tagged, "doc_id", "text", "slice"))
    ingestOnce(s, t.dict, id) {
      graft.ops.Bucketing.appendBucketed(dtomb, t.dict,
        Seq("token"), buckets, sortCols = Seq("token"))
    }
    ingestOnce(s, t.delneigh, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.delneighSlices(dtomb), t.delneigh,
        Seq("variant"), buckets, sortCols = Seq("variant"))
    }
    ingestOnce(s, t.tgram, id) {
      graft.ops.Bucketing.appendBucketed(
        TextAnalysis.tgramSlices(dtomb), t.tgram,
        Seq("gram"), buckets, sortCols = Seq("gram"))
    }
    // positional: position sets don't cancel arithmetically — the
    // family's delete is the append-only id log the reads anti-join
    ingestOnce(s, t.deletes, id) {
      docs.select(lit(id).as("slice"), col("doc_id"))
        .write.mode("append").format("parquet").saveAsTable(t.deletes)
    }
  }

  /** One transition-pair micro-batch into the edge warehouse. */
  private[graft] def ingestPairsBatch(batch: Dataset[Row], id: Long,
                                     t: Tables, buckets: Int): Unit =
    ingestOnce(batch.sparkSession, t.edges, id) {
      Graph.edgeIngest(batch.withColumn("slice", lit(id)),
        "src", "dst", "slice", t.edges, buckets)
    }

  /** Process-local registry of warehouse table sets with a LIVE
    * ingest deployment. The slice-id idempotence guard assumes ONE
    * writer per family: two concurrent ingest queries into the same
    * tables would collide batch ids and the guard would silently drop
    * the second writer's batches (VERDICT r19 item 4) — so a second
    * [[start]] over any already-claimed table fails loudly instead.
    * [[release]] frees the claim after the queries stop. In a
    * multi-driver deployment this registry's job belongs to the
    * shared metastore (a lock table / lease); the contract — one
    * writer per warehouse, enforced, never silent — is the same.
    */
  private val liveWriters =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def writtenTables(t: Tables): Seq[String] =
    Seq(t.index, t.positional, t.edges, t.colloc, t.chunks, t.dict,
      t.delneigh, t.tgram, t.bands, t.pq)

  /** Release a warehouse's writer claim — call after stopping the
    * queries [[start]] returned.
    */
  def release(t: Tables): Unit =
    writtenTables(t).foreach(liveWriters.remove)

  /** Start the two concurrent ingest queries over a document stream
    * (doc_id, text) and a transition-pair stream (src, dst). The
    * tables must already exist with matching bucket specs (the
    * bootstrap build — a nightly batch job or a first empty slice);
    * appends only add bucket files, never rewrite history, and a
    * replayed batch is skipped by the slice-id guard. Pass
    * `checkpointDir` in production so restarts resume from committed
    * offsets instead of replaying the source. Claims the table set in
    * [[liveWriters]] — a second concurrent `start` over any of the
    * same tables throws; [[release]] after stopping the queries.
    */
  def start(docs: DataFrame, pairs: DataFrame, t: Tables,
            buckets: Int = 8,
            checkpointDir: Option[String] = None,
            vecs: Option[DataFrame] = None): Seq[StreamingQuery] = {
    val taken = writtenTables(t).filterNot(liveWriters.add)
    if (taken.nonEmpty) {
      // roll back the partial claim before raising
      writtenTables(t).filterNot(taken.contains).foreach(liveWriters.remove)
      throw new IllegalStateException(
        s"ServingWarehouse.start: table(s) ${taken.mkString(", ")} "
          + "already have a live ingest writer — two writers would "
          + "collide slice ids and silently drop batches; stop and "
          + "release() the first deployment (or use distinct tables)")
    }
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
        }.start()) ++
      vecs.map(v =>
        ck(v.writeStream.queryName(s"ingest_vecs_${t.pq}"), "vecs")
          .foreachBatch { (batch: Dataset[Row], id: Long) =>
            ingestVecsBatch(batch, id, t, buckets)
          }.start())
  }

  /** Nightly MAINTENANCE for one warehouse: plan (q261's
    * sliceDatasheet → compactionPlan per family) and EXECUTE
    * ([[graft.Stores.compact]]) the fold of accumulated micro-batch
    * slices into target-sized generations, for every slice family the
    * ingest appends to. The positional family folds through its
    * delete log (the rewrite drops erased docs' rows — the q213/q215
    * contract; the log stays, the anti-join is a no-op afterwards).
    * Reads are identical before and after (every family's merge is
    * associative — the StreamingSpec pin), only the file manifest
    * shrinks. Overlap with a live ingest is SAFE in both directions,
    * by different mechanisms: a batch REPLAYED across the compaction
    * boundary is skipped via the `_wm` watermark sidecar
    * ([[graft.Stores.compact]] records every folded id;
    * [[ingestOnce]] consults it), and a NEW batch that lands during
    * the swap window makes the compaction ABORT loudly (target
    * untouched, re-run converges) instead of being silently
    * overwritten away. The content-tombstone families fold through
    * the PARTIAL merges, so a plan bin that separates a forget
    * tombstone from its matching ingest compacts cleanly (the
    * integrity raise stays at read time).
    */
  def compact(s: SparkSession, t: Tables, targetRows: Long,
              buckets: Int): Unit = {
    import graft.ops.{Graph, Profile, TextAnalysis}
    def planFor(table: String, keys: Seq[String], w: String) =
      Profile.compactionPlan(
        Profile.sliceDatasheet(liveTable(s, table), "slice", keys, w)
          .select(lit(table).as("store"), col("slice"), col("n_rows")),
        "store", "slice", "n_rows", targetBytes = targetRows)
        .select(col("bin"), col("id_lo").as("gen_lo"),
          col("id_hi").as("gen_hi"))
    def run(table: String, keys: Seq[String], w: String,
            fn: (DataFrame, Long) => DataFrame,
            bucketCols: Seq[String]): Unit = {
      graft.Stores.compact(s, table, planFor(table, keys, w), fn,
        bucketCols, buckets)
      s.catalog.refreshTable(table)
    }
    // the content-tombstone families compact through the PARTIAL
    // merges (closed under arbitrary binning): the planner orders
    // slices by id, so a forget request's negative-id tombstone slice
    // can bin APART from the ingest slices it cancels — a strict
    // per-bin merge would raise there (ADVICE r19). Negative partial
    // sums survive as tombstone rows; the read-time global merges
    // keep the integrity raise.
    run(t.index, Seq("token", "doc_id"), "tf",
      TextAnalysis.indexCompactPartial, Seq("token"))
    run(t.chunks, Seq("token", "doc_id"), "tf",
      TextAnalysis.indexCompactPartial, Seq("token"))
    run(t.positional, Seq("token", "doc_id"), "tf",
      (sl, ns) => TextAnalysis.positionalCompact(
        TextAnalysis.positionalApplyTombstones(sl,
          liveTable(s, t.deletes)), ns),
      Seq("token"))
    run(t.edges, Seq("src", "dst"), "w", Graph.edgeCompactPartial,
      Seq("src"))
    run(t.colloc, Seq("w1", "w2"), "c",
      TextAnalysis.collocCompactPartial, Seq("w1"))
    run(t.dict, Seq("token"), "d_cf",
      TextAnalysis.dictCompactPartial, Seq("token"))
    run(t.delneigh, Seq("variant", "token"), "d_df",
      TextAnalysis.delneighCompactPartial, Seq("variant"))
    run(t.tgram, Seq("gram", "token"), "d_df",
      TextAnalysis.tgramCompactPartial, Seq("gram"))
    // bands are plain id-addressed rows: compaction re-tags survivors
    // (the delete log folds in, like the positional family)
    run(t.bands, Seq("doc_id", "band_id"), "band_id",
      (sl, ns) => graft.ops.Forget.rowErase(sl, "doc_id",
          liveTable(s, t.deletes))
        .select(lit(ns).as("slice"), col("doc_id"), col("band_id"),
          col("band_hash")),
      Seq("band_hash"))
    // the one-slice-per-doc sidecar folds like the bands: id-addressed
    // rows, erased doc_ids leave through the delete log — so an erased
    // doc's re-ingest becomes legal exactly when its postings
    // physically vanish (the pre-sidecar probe's behavior, preserved)
    if (s.catalog.tableExists(docIdsSidecar(t)))
      run(docIdsSidecar(t), Seq("doc_id"), "doc_id",
        (sl, ns) => graft.ops.Forget.rowErase(sl, "doc_id",
            liveTable(s, t.deletes))
          .select(lit(ns).as("slice"), col("doc_id")),
        Seq("doc_id"))
    // the PQ code table is id-addressed like the bands: micro-batch
    // slices fold by re-tagging survivors, erased vec_ids leave
    // physically through the shared delete log (reads keep anti-
    // joining it for erasures issued after the rewrite)
    run(t.pq, Seq("vec_id", "sub"), "code",
      (sl, ns) => graft.ops.Forget.rowErase(sl, "vec_id",
          liveTable(s, t.deletes))
        .select(lit(ns).as("slice"), col("vec_id"), col("centroid_id"),
          col("sub"), col("code")),
      Seq("centroid_id"))
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
        TextAnalysis.positionalApplyTombstones(
            liveTable(s, t.positional), liveTable(s, t.deletes))
          .join(broadcast(tokens), Seq("token"), "left_semi")),
      terms, k)
  }

  /** q246-shaped read over the LIVE edge table: the per-item top-k
    * next-item recommendation table off the merged edge counts.
    */
  def nextItemRead(s: SparkSession, t: Tables, k: Int): DataFrame =
    Behavior.nextItemFromCounts(Graph.edgeMerge(liveTable(s, t.edges)),
      "src", "dst", "w", k)

  /** q264-shaped read over the LIVE dictionary-delta table: prefix
    * autocomplete off the fold of the landed df-delta slices — the
    * slice-derived dictionary store ([[TextAnalysis.dictSlices]]),
    * NOT a per-read re-derivation from the postings: the merge folds
    * token-delta rows (vocabulary-scale, pushed-prefix-prunable), and
    * the spec pins its output ≡ the postings-derived dictionary per
    * generation. New vocabulary becomes suggestible the moment its
    * slice lands.
    */
  def prefixRead(s: SparkSession, t: Tables, prefix: String,
                 k: Int): DataFrame =
    TextAnalysis.prefixSearch(
      TextAnalysis.dictMergeSlices(liveTable(s, t.dict)),
      prefix, k)

  /** q265-shaped read over the LIVE deletion-neighborhood slice
    * table: fuzzy "did you mean" off the fold of the landed variant
    * delta slices. The |query|+1 variant probe is a filter on the
    * merge's grouping column, so it pushes through the aggregate to
    * the store scan — never an O(V) pass, mid-stream or not.
    */
  def fuzzyRead(s: SparkSession, t: Tables, term: String,
                k: Int): DataFrame =
    TextAnalysis.fuzzyTerms(
      TextAnalysis.delneighMergeSlices(liveTable(s, t.delneigh)),
      term, k)

  /** q266-shaped read over the LIVE trigram slice table: infix search
    * off the fold of the landed gram delta slices (pushed gram
    * probes, contains-verify on candidates only).
    */
  def infixRead(s: SparkSession, t: Tables, queries: Seq[String],
                k: Int): DataFrame =
    TextAnalysis.infixSearch(
      TextAnalysis.tgramMergeSlices(liveTable(s, t.tgram)),
      queries, k)

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
  /** q89-shaped ANN read over the LIVE code table: full-scan ADC
    * against the warehouse's fixed codebooks. `queryVecs` is the
    * request's (vec_id, embedding) rows (a serving deployment gets
    * the query vector in the request); every scored row is m narrow
    * code longs — the raw vectors never leave the model tables.
    */
  def annRead(s: SparkSession, t: Tables, queryVecs: DataFrame,
              queryIds: Seq[Long], k: Int): DataFrame = {
    val model = readModel(s, t)
    graft.ops.Pq.adcSearchCoded(
      graft.ops.Forget.rowErase(liveTable(s, t.pq), "vec_id",
        liveTable(s, t.deletes)),
      queryVecs, "vec_id", "embedding", s.table(t.pqcb), queryIds, k,
      m = model.m, subDim = model.subDim)
  }

  /** q92-shaped IVF-PQ read over the LIVE code table: coarse-probe
    * the centroid-bucketed codes (only `nprobe` lists' buckets are
    * touched), then ADC on the probed candidates.
    */
  def ivfRead(s: SparkSession, t: Tables, queryVecs: DataFrame,
              queryIds: Seq[Long], k: Int, nprobe: Int): DataFrame = {
    val model = readModel(s, t)
    graft.ops.Pq.adcSearchProbed(
      graft.ops.Forget.rowErase(liveTable(s, t.pq), "vec_id",
        liveTable(s, t.deletes)),
      queryVecs, "vec_id", "embedding", s.table(t.pqcoarse),
      s.table(t.pqcb), queryIds, k, nprobe,
      m = model.m, subDim = model.subDim)
  }

  def passageRead(s: SparkSession, t: Tables, terms: DataFrame,
                  nTerms: Int, k: Int,
                  maxPostings: Int = MaxPostings): DataFrame = {
    val merged = Checkpoints.pin(
      TextAnalysis.indexMergeSlices(liveTable(s, t.chunks)),
      None, eager = false) // two consumers: capped view + chunk count
    TextAnalysis.passageSearch(
      TextAnalysis.cappedIndex(merged, maxPostings),
      merged.agg(countDistinct(col("doc_id")).as("n_chunks")),
      terms, nTerms, k, chunkKeyBase = graft.Stores.ChunkKeyBase)
  }
}
