package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing.md5LongSql

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), content-fingerprint, MinHash+LSH banding, and
  * exact n-gram/word-set Jaccard verification.
  *
  * Scale design:
  *  - everything is hash → groupBy / equi-join — one shuffle per stage,
  *    no cross product anywhere except within LSH band buckets (bounded
  *    by bucket size) and within explicit candidate groups;
  *  - hashes/minhashes/shingles are computed with codegen'd Catalyst
  *    expressions (md5/conv/higher-order functions), not UDFs;
  *  - the 60-bit md5-derived hash (graft.functions.Hashing) is
  *    reproducible in the DuckDB oracle bit-for-bit.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct value of `cols`.
    * At scale this is a shuffle on the hash of `cols` (same cost class
    * as distinct()); prefer the fingerprint variants to catch
    * trivially-reformatted duplicates.
    */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Batch keep-first dedup: one row per distinct `keyCols` — the row
    * sorting first by `orderCols` (include a unique tie-break for a
    * deterministic pick). The Window partitions on the DEDUP KEY, whose
    * cardinality ≈ the distinct-entity count, so the per-partition sort
    * stays tiny — the opposite of the low-cardinality WindowExec trap.
    * This is the batch twin of [[streamingExact]]: on event-time-ordered
    * input the two produce identical survivors within one watermark
    * horizon (StreamingSpec "streaming dedup helpers" pins the
    * equivalence on a duplicate-injection corpus).
    */
  def keepFirst(df: DataFrame, keyCols: Seq[String],
                orderCols: Seq[String]): DataFrame = {
    // collision-free helper column: suffix until absent from the input.
    // Case-INSENSITIVE probe: Spark's default resolver is case-insensitive,
    // so an input column "_RN" would otherwise pass a .contains check and
    // then be silently replaced by withColumn("_rn", ...) (ADVICE r6)
    val rn = Iterator.iterate("_rn")(_ + "_")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1).drop(rn)
  }

  /** Streaming exact dedup bounded by a watermark (SURVEY §7.2 step 8):
    * `dropDuplicatesWithinWatermark` keeps one state entry per key and
    * evicts it once the watermark passes the key's event time + `delay`
    * — state is bounded by keys-per-horizon, not keys-ever, which is
    * what lets continuous ingestion dedup run forever. A duplicate
    * arriving after its key's state expired is re-admitted (by design:
    * the horizon IS the dedup guarantee; layer [[keepFirst]] over the
    * batch store for full-history dedup).
    */
  def streamingExact(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Streaming near-dup dedup: the canonical content fingerprint
    * ([[fingerprint]] — word-set md5, collapsing order/repetition
    * variants) computed per row, then watermark-bounded dedup on it.
    * The continuous-ingestion form of [[fingerprintGroups]].
    */
  def streamingFingerprint(df: DataFrame, textCol: String, tsCol: String,
                           delay: String): DataFrame =
    df.withColumn("fingerprint", fingerprint(textCol))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Exact-duplicate groups by md5 of `textCol`: (text_hash, keep_id =
    * min id, dup_cnt >= 2).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") >= 2)

  /** Canonical content fingerprint: md5 of the sorted distinct word set.
    * Collapses word-order / repetition variants of the same content.
    */
  def fingerprint(textCol: String): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(col(textCol), " ")))))

  /** Duplicate groups by content fingerprint. */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(textCol).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") >= 2)

  /** Incremental dedup of a NEW ingest slice against the PRIOR corpus's
    * fingerprint store — the dump-over-dump posture (each CommonCrawl-
    * style snapshot dedups against everything already kept, not just
    * itself). Survivors are the slice rows that are BOTH first within
    * the slice for their [[fingerprint]] (min `idCol`) AND novel
    * against `store` (a one-column (fingerprint) frame — build it once
    * from the kept corpus and append each slice's surviving prints).
    *
    * Scale shape (the SelectionPipeline gate discipline): the slice's
    * text never shuffles — fingerprints are computed in a NARROW
    * (id, fingerprint) projection, the in-slice winner is a hash-agg
    * `min(id)` (no Window), the store anti-join runs fingerprint-to-
    * fingerprint on one-column frames, and only the winning ids come
    * back to gate the full-width slice. `broadcastIds = false`
    * (default, the r12-verdict flip) forces NO hint: the planner/AQE
    * broadcasts the winner set exactly when its runtime-measured size
    * fits the threshold, so a survivor-scale id set can never OOM the
    * driver by an accident of the default. When the winners DON'T fit
    * (survivor scale), the gate join shuffles the full-width slice on
    * id — bounded by SLICE size, never the store; pre-bucket the
    * slice on id (the [[graft.ops.Bucketing]] pattern) to avoid even
    * that one exchange. Set `broadcastIds = true` only for slices
    * KNOWN to fit executor memory, where the forced broadcast also
    * pins the no-text-shuffle plan shape (MiningSpec). The STORE side
    * is narrow (one fingerprint column) and never re-shuffled if it
    * is a bucketed table on `fingerprint` — at 100 TB the store is
    * orders bigger than any slice, so that is the operative property.
    */
  def dedupAgainstStore(newDocs: DataFrame, store: DataFrame,
                        idCol: String, textCol: String,
                        broadcastIds: Boolean = false): DataFrame = {
    val fps = newDocs.select(col(idCol).as("_fp_id"),
      fingerprint(textCol).as("fingerprint"))
    val winners = fps.groupBy(col("fingerprint"))
      .agg(min(col("_fp_id")).as("keep_id"))
      .join(store.select(col("fingerprint")), Seq("fingerprint"), "left_anti")
      .select(col("keep_id"))
    val gate = if (broadcastIds) broadcast(winners) else winners
    newDocs.join(gate, col(idCol) === col("keep_id"), "left_semi")
  }

  /** The one-column fingerprint store of a kept corpus — distinct
    * content prints, the right-hand side of [[dedupAgainstStore]].
    * Persist it bucketed on `fingerprint` ([[graft.ops.Bucketing]]) so
    * successive slices anti-join against it with zero store-side
    * Exchange.
    */
  def fingerprintStore(df: DataFrame, textCol: String): DataFrame =
    df.select(fingerprint(textCol).as("fingerprint")).distinct()

  /** Bloom PRE-FILTER audit for the ingest gate — the two-tier 100 TB
    * posture: a Bloom vector built from the store's fingerprints
    * (kilobytes, broadcast to every scan task) answers "definitely
    * new" locally, so only arrivals the filter flags ever consult the
    * exact fingerprint store. A Bloom filter makes NO false negatives,
    * so the tier is a pure pruning: a doc the filter clears can never
    * be an exact dup, and the tiered gate keeps EXACTLY the one-tier
    * gate's set — the audit emits per-arrival (bloom_hit, exact_dup)
    * plus the `fn_free` invariant column (exact_dup ⇒ bloom_hit) the
    * q195 oracle pins row by row. The md5₆₀ probe family
    * ([[graft.functions.TypedAggs.BloomBits]] /
    * [[SketchStore.bloomContains]]) is cross-engine, so every flag is
    * deterministic. Arrivals with bloom_hit = false skip the store
    * join entirely at scale; the false-positive fraction (bloom_hit
    * ∧ ¬exact_dup) is the wasted-probe cost, sized by mBits.
    */
  def bloomPrefilterAudit(newDocs: DataFrame, store: DataFrame,
                          idCol: String, textCol: String,
                          mBits: Int = 65536, k: Int = 3): DataFrame = {
    val bloom = store.agg(graft.functions.TypedAggs
      .bloomBits(col("fingerprint"), mBits, k).as("bits"))
    val arr = newDocs.select(col(idCol).as("doc_id"),
      fingerprint(textCol).as("fp"))
    arr.crossJoin(broadcast(bloom)) // 1-row vector broadcast
      .withColumn("bloom_hit",
        SketchStore.bloomContains(col("bits"), col("fp"), mBits, k))
      .join(store.select(col("fingerprint").as("fp"))
        .distinct().withColumn("_ed", lit(true)), Seq("fp"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        coalesce(col("_ed"), lit(false)).as("exact_dup"),
        (!coalesce(col("_ed"), lit(false)) || col("bloom_hit"))
          .as("fn_free"))
  }

  /** CONTINUOUS-INGESTION twin of [[dedupAgainstStore]]: a document
    * stream dedups against the frozen batch store via a stream-static
    * LEFT ANTI join on the content fingerprint (stateless — the static
    * side is re-read per micro-batch, no join state), then against
    * ITSELF within the watermark horizon
    * (`dropDuplicatesWithinWatermark`, the [[streamingFingerprint]]
    * state bound: keys-per-horizon, not keys-ever). The division of
    * history: everything already KEPT is the store's job (swap the
    * store to recalibrate, the StreamingScore/StreamingGate contract);
    * duplicates WITHIN the live horizon are the state store's job; a
    * duplicate arriving after both — past the horizon, before the
    * store is refreshed with kept prints — is re-admitted by design
    * (the horizon plus the store refresh cadence IS the guarantee).
    * Emits the input rows + `fingerprint` in append mode.
    */
  def streamingAgainstStore(docs: DataFrame, store: DataFrame,
                            textCol: String, tsCol: String,
                            delay: String,
                            broadcastStore: Boolean = false): DataFrame = {
    // broadcastStore defaults FALSE (r13 self-review — the same
    // accident-of-the-default rationale as dedupAgainstStore's flip,
    // a fortiori here: the kept corpus eventually cannot fit
    // executors, per the class doc): no forced hint, the planner
    // still auto-broadcasts a store whose estimated size fits. Opt in
    // only for stores KNOWN to fit; at scale feed a store bucketed on
    // fingerprint so its side never re-shuffles per micro-batch
    val s = store.select(col("fingerprint"))
    docs.withColumn("fingerprint", fingerprint(textCol))
      .join(if (broadcastStore) broadcast(s) else s,
        Seq("fingerprint"), "left_anti")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
  }

  /** MinHash LSH banding (shingle → minhash → band → bucket key).
    * Output: one row per (doc, band): (doc_id, band_id, band_hash) where
    * band_hash is the md5 of the band's concatenated minhash values.
    * Near-duplicate candidates are docs sharing any (band_id, band_hash)
    * bucket — see [[lshCandidates]]. numHashes minhash functions are
    * split into numHashes/bandSize bands.
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 8, bandSize: Int = 2,
                   shingleSize: Int = 3): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    // shingles via the native codegen'd word_ngrams (each shingle a
    // substring slice — value-identical to the old concat_ws-over-
    // slice HOF, including empty-token runs); documents shorter than
    // the shingle size fall back to one whole-text shingle (word_ngrams
    // returns empty there, so the CASE branches on the token count)
    val base = df
      .select(col(idCol).as("doc_id"), col(textCol).as("txt"),
        split(col(textCol), " ").as("words"))
      .select(col("doc_id"),
        when(size(col("words")) >= shingleSize,
          graft.functions.WordNgrams(df.sparkSession, col("txt"), shingleSize))
          .otherwise(array(col("txt"))).as("shingles"))
    // one md5 per shingle (native codegen'd expression; value-identical
    // to the conv/substring/md5 chain); ALL numHashes affine-family
    // minima come from ONE fused pass (affine_min_hashes — the old
    // per-family array_min(transform(...)) traversed the hash array
    // numHashes times, interpreted)
    graft.functions.Md5Long60.ensureRegistered(df.sparkSession)
    val M = graft.functions.Hashing.AffineMod
    val hashed = base.select(col("doc_id"),
      expr(s"transform(shingles, s -> md5_long60(CAST(s AS BINARY)) % $M)").as("hs"))
    val mh = hashed
      .select(col("doc_id"),
        graft.functions.AffineMinHashes(df.sparkSession, col("hs"), numHashes)
          .as("sigs"))
      .select(col("doc_id") +:
        (0 until numHashes).map(h => col("sigs")(h).as(s"mh$h")): _*)
    val numBands = numHashes / bandSize
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).cast("long").as("band_id"),
        md5(concat_ws(",",
          (b * bandSize until (b + 1) * bandSize).map(i => col(s"mh$i")): _*))
          .as("band_hash"))
    }
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
  }

  /** Candidate near-duplicate pairs from LSH bands: docs sharing >= 1
    * band bucket, with the number of colliding bands.
    *
    * Shape: groupBy bucket → collect ids (memory-capped) → emit
    * in-bucket pairs. One pass over the (expensive, interpreted-HOF)
    * minhash pipeline and one shuffle on the bucket key; cost is sum
    * over buckets of |bucket|^2, never n^2. (A self-join would recompute
    * the minhash plan on both sides — and once more single-threaded on
    * the broadcast build.)
    *
    * `maxBucketSize` guards the degenerate case: a duplicate explosion
    * (the same boilerplate pasted into millions of docs) puts all of
    * them in ONE bucket, whose |bucket|² pairs — and even the collected
    * id list itself — would sink a task. Buckets over the cap aggregate
    * in O(cap) memory ([[graft.functions.TypedAggs.cappedCollectIds]]),
    * produce no pairs, and are observable via [[lshOversizedBuckets]];
    * such a bucket is a near-identical group anyway — dedup it as a
    * group (e.g. keep-one-per-bucket), pairwise scoring adds nothing.
    */
  def lshCandidates(bands: DataFrame, maxBucketSize: Int = 10000): DataFrame =
    bucketIds(bands, maxBucketSize)
      .filter(col("sz") >= 2 && col("sz") <= maxBucketSize)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1), i ->
          |  transform(slice(ids, i + 1, size(ids) - i), y ->
          |    named_struct('doc_a', element_at(ids, i), 'doc_b', y))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))

  /** NEW-SLICE near-dup candidates against a WRITTEN band store — the
    * [[dedupAgainstStore]] posture for the NEAR-dup family: the
    * standing corpus's MinHash band rows are computed once at ingest
    * (a band_hash-bucketed table — [[graft.Stores.bands]]); a new
    * crawl slice computes ONLY its own bands (the one
    * [[minhashBands]] code path, so slice and store derivations
    * cannot differ) and probes the store's buckets. Emits
    * (new_id, corpus_id, n_bands) — each new doc's near-dup matches
    * in the kept corpus with the number of colliding bands, the
    * decision input for "drop the re-crawl / keep the novel doc".
    *
    * Scale shape: the corpus's shingle→minhash pipeline NEVER re-runs
    * (the whole point — at 100 TB it ran once per slice, ever); the
    * store is touched by ONE scan whose bucket layout makes every
    * join on (band_id, band_hash) shuffle-free on the store side
    * (HashPartitioning(band_hash) satisfies the clustering), so only
    * slice-scale rows move. Over-cap buckets (duplicate explosions)
    * drop observably — the [[lshCandidates]] cap posture with the
    * size measured on the STORE side, where the explosion lives.
    */
  def nearDupAgainstStore(newDocs: DataFrame, idCol: String,
                          textCol: String, bandStore: DataFrame,
                          maxBucketSize: Int = 10000,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1")
    // two consumers each: the bucket-key probe + the pair join
    val nb = Checkpoints.pin(
      minhashBands(newDocs, idCol, textCol)
        .select(col("doc_id").as("new_id"), col("band_id"),
          col("band_hash")),
      checkpointDir, eager = false)
    val matched = Checkpoints.pin(
      bandStore.select(col("doc_id").as("corpus_id"), col("band_id"),
          col("band_hash"))
        .join(nb.select(col("band_id"), col("band_hash")).distinct(),
          Seq("band_id", "band_hash"), "left_semi"),
      checkpointDir, eager = false)
    val ok = matched.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("_sz"))
      .filter(col("_sz") <= maxBucketSize)
      .select(col("band_id"), col("band_hash"))
    matched.join(ok, Seq("band_id", "band_hash"), "left_semi")
      .join(nb, Seq("band_id", "band_hash"))
      .filter(col("new_id") =!= col("corpus_id"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Incremental dup-map MAINTENANCE — merge a new generation's
    * candidate pairs into a standing (doc_id, rep) cluster map
    * without re-clustering the corpus: the map's star edges
    * (member → rep) carry exactly its components' connectivity, so a
    * connected-components pass over (star edges ∪ new pairs) yields
    * the SAME map a full rebuild over all pairs produces — including
    * the case where one new document bridges two standing components
    * (they merge, relabeled by the global min id) and the case where
    * a new id undercuts a standing rep (the component relabels). The
    * q297 oracle replays the full-corpus rebuild against this
    * incremental form.
    *
    * Scale shape: work ∝ cluster MEMBERSHIP + new pairs (the walk
    * never touches singleton docs or corpus text) — the [[indexSlices]]
    * ingest-gate rule applied to the clustering artifact.
    */
  def dupMapIngest(oldMap: DataFrame, pairs: DataFrame): DataFrame =
    connectedComponents(
      oldMap.select(col("doc_id").as("doc_a"), col("rep").as("doc_b"))
        .unionByName(pairs.select(col("doc_a"), col("doc_b"))),
      "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component").as("rep"))

  /** The flagged route for [[lshCandidates]]: buckets whose size exceeds
    * the cap, as (band_id, band_hash, bucket_size) — the audit stream of
    * what pair generation skipped.
    */
  def lshOversizedBuckets(bands: DataFrame, maxBucketSize: Int = 10000): DataFrame =
    bucketIds(bands, maxBucketSize)
      .filter(col("sz") > maxBucketSize)
      .select(col("band_id"), col("band_hash"), col("sz").as("bucket_size"))

  /** Group-dedup for the buckets [[lshCandidates]] skips: every member
    * except the min id per over-cap bucket, as loser ids. An over-cap
    * bucket is a duplicate explosion — near-identical by construction —
    * so pairwise scoring adds nothing; keep-one-per-bucket is the
    * correct treatment.
    *
    * Shape matters here precisely BECAUSE the buckets are huge: a
    * window over the bucket would shuffle an entire explosion into one
    * task (the skew the cap exists to avoid). Instead min+count
    * aggregate with map-side partial combine (O(1) buffer per bucket,
    * one row out per bucket), keep only the over-cap keepers (a tiny
    * set — size-based planning broadcasts it), and join back to flag
    * everyone else. No capped-list aggregation, no giant partition.
    */
  def lshOversizedLosers(bands: DataFrame, maxBucketSize: Int = 10000): DataFrame = {
    val keepers = bands.groupBy(col("band_id"), col("band_hash"))
      .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("sz"))
      .filter(col("sz") > maxBucketSize)
      .select(col("band_id"), col("band_hash"), col("keep"))
    bands.join(keepers, Seq("band_id", "band_hash"))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("doc_id").as("loser_id")).distinct()
  }

  private def bucketIds(bands: DataFrame, cap: Int): DataFrame = {
    val idType = bands.schema("doc_id").dataType
    require(idType == org.apache.spark.sql.types.LongType,
      s"lshCandidates: doc_id must be LongType (the memory-capped bucket " +
        s"aggregator is Long-typed), got $idType — hash or cast ids upstream")
    bands.groupBy(col("band_id"), col("band_hash"))
      .agg(graft.functions.TypedAggs.cappedCollectIds(col("doc_id"), cap).as("b"))
      .select(col("band_id"), col("band_hash"),
        col("b.ids").as("ids"), col("b.n").as("sz"))
  }

  /** Exact word-set Jaccard over pairs within `groupCol` blocks (the
    * verify step after LSH, or a blocked all-pairs when a natural
    * blocking key exists). Output pairs with jaccard >= threshold,
    * rounded to 6 digits. threshold must be > 0 (zero-overlap pairs are
    * never emitted).
    *
    * Adaptive physical strategy. With `probeVocab = true` a vocabulary
    * probe — one extra explode + distinct-aggregation pass over the
    * corpus (the limit(65) caps the result, not the scan) — picks
    * between two plans. The default is `false` (no probe, straight to
    * the inverted index) because real-text corpora always exceed 64
    * words and would pay the probe pass only to take the inverted path
    * anyway; opt in for tag-like/categorical corpora where the bitmask
    * plan is an order of magnitude faster:
    *
    *  - vocab <= 64 (tag-like / categorical sets): encode each word set
    *    as one 64-bit mask (explode → broadcast-dict join → bit_or), then
    *    a block self-join where |A∩B| is a single bit_count(maskA &
    *    maskB). Per-pair cost is O(1) instead of O(co-occurring words) —
    *    on corpora whose documents share most of a tiny vocabulary the
    *    inverted index degenerates to ~|doc|² co-occurrence rows per
    *    block, an order of magnitude more work.
    *  - otherwise (real text): inverted index — explode distinct words,
    *    equi-join on (block, word), count shared words per pair, join the
    *    per-doc set sizes back. Work is proportional to co-occurrences,
    *    fully codegen'd, shuffles on word — the standard
    *    set-similarity-join shape at scale.
    *
    * Both paths prune with the length filter (Arasu et al.):
    * jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs whose sizes
    * differ by more than the threshold ratio never survive.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, threshold: Double,
                   probeVocab: Boolean = false): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (jaccard-0 pairs are not emitted)")
    val docs = df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      array_distinct(split(col(textCol), " ")).as("ws"))
    if (!probeVocab) return jaccardPairsInverted(docs, threshold)
    // the probe must cover the FULL corpus: the bitmask dictionary drops
    // unknown words, so a sampled probe would silently corrupt results
    val vocabProbe = docs.select(explode(col("ws")).as("w"))
      .distinct().limit(65).collect().map(_.getString(0))
    if (vocabProbe.length <= 64) jaccardPairsBitmask(docs, vocabProbe, threshold)
    else jaccardPairsInverted(docs, threshold)
  }

  /** Word sets as 64-bit masks over a ≤64-word vocabulary — the shared
    * encoding of the bitmask fast paths ([[jaccardPairsBitmask]],
    * [[containmentPairsBitmask]]). `vocab` must cover every word in
    * `docs.ws`.
    */
  private[graft] def wordMasks(docs: DataFrame, vocab: Array[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = vocab.sorted.zipWithIndex.toSeq.toDF("w", "bit")
    docs
      .select(col("doc_id"), col("grp"), size(col("ws")).as("n"),
        explode(col("ws")).as("w"))
      .join(broadcast(dict), "w")
      .groupBy(col("doc_id"), col("grp"), col("n"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("mask"))
  }

  /** Small-vocabulary fast path: word sets as 64-bit masks, intersection
    * as bit_count. `vocab` must cover every word in `docs.ws`.
    */
  private def jaccardPairsBitmask(docs: DataFrame, vocab: Array[String],
                                  threshold: Double): DataFrame =
    jaccardPairsFromMasks(wordMasks(docs, vocab), threshold)

  /** The bitmask Jaccard join over PRECOMPUTED (doc_id, grp, n, mask)
    * rows — [[jaccardPairsBitmask]] with the mask derivation factored
    * out so a WRITTEN mask table ([[graft.Stores.wordMasks]]) can
    * serve it: at a deployment the per-doc masks are an ingest
    * artifact; only the pair scoring runs per read.
    */
  def jaccardPairsFromMasks(masks: DataFrame,
                            threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (jaccard-0 pairs are not emitted)")
    val a = masks.select(col("doc_id").as("doc_a"), col("grp"),
      col("mask").as("mask_a"), col("n").as("na"))
    val b = masks.select(col("doc_id").as("doc_b"), col("grp").as("grp_b"),
      col("mask").as("mask_b"), col("n").as("nb"))
    a.join(b, col("grp") === col("grp_b") && col("doc_a") < col("doc_b") &&
        expr(s"least(na, nb) >= $threshold * greatest(na, nb)"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(mask_a & mask_b)").as("inter"), col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        expr("round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6)")
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Shared inverted-index co-occurrence core of
    * [[jaccardPairsInverted]] and [[containmentPairs]] (r13
    * self-review factored the near-line-for-line copy): `docs` is the
    * (doc_id, grp, ws) frame; output one row per blocked pair with a
    * shared word — (doc_a, doc_b, inter, na, nb). `extraJoinPred` is
    * appended to the equi-join condition (the Arasu length filter for
    * Jaccard; empty for containment, where unequal sizes are the
    * signal).
    */
  private def coOccurrencePairs(docs: DataFrame,
                                extraJoinPred: String = ""): DataFrame = {
    val sizes = docs.select(col("doc_id"), size(col("ws")).as("n"))
    val inv = docs.select(col("doc_id"), col("grp"), explode(col("ws")).as("w"),
      size(col("ws")).as("n"))
    val co = inv.as("a").join(inv.as("b"),
        expr(s"a.grp = b.grp AND a.w = b.w AND a.doc_id < b.doc_id$extraJoinPred"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
  }

  /** General path: inverted index on (block, word). */
  private def jaccardPairsInverted(docs: DataFrame, threshold: Double): DataFrame =
    coOccurrencePairs(docs,
        s" AND least(a.n, b.n) >= $threshold * greatest(a.n, b.n)")
      .select(col("doc_a"), col("doc_b"),
        expr("round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6)")
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Asymmetric word-set CONTAINMENT over pairs within `groupCol`
    * blocks: C(A→B) = |A∩B| / |A| — the criterion for "doc A is
    * substantially inside doc B" that Jaccard structurally misses on
    * different-length pairs (a 100-word quote fully inside a
    * 10,000-word page has jaccard ≈ 0.01 but containment 1.0 — the
    * boilerplate/quotation case document-level dedup actually hunts).
    * Emits each unordered pair once (doc_a < doc_b) with BOTH
    * directions' containments (6-digit rounded), kept when the larger
    * one clears `threshold`.
    *
    * Shape: the [[jaccardPairs]] inverted-index plan (explode distinct
    * words, equi-join on (block, word), count shared words, join set
    * sizes back) WITHOUT the Arasu length filter — size-ratio pruning
    * is exactly what containment must not do, since unequal sizes are
    * the signal. Work stays proportional to co-occurrences within
    * blocks; at corpus scale the blocking key (or an LSH pre-filter,
    * q22) bounds the join, as in every set-similarity op here.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, threshold: Double,
                       probeVocab: Boolean = false): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    val docs = df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      array_distinct(split(col(textCol), " ")).as("ws"))
    // the jaccardPairs adaptive-strategy contract: probe the corpus
    // vocabulary (full scan — a sample would silently corrupt masks)
    // and take the O(1)-per-pair bitmask plan on tag-like corpora;
    // containment benefits MORE than jaccard here, because it cannot
    // length-prune — every same-block pair is scored either way
    if (probeVocab) {
      val vocabProbe = docs.select(explode(col("ws")).as("w"))
        .distinct().limit(65).collect().map(_.getString(0))
      if (vocabProbe.length <= 64)
        return containmentPairsBitmask(docs, vocabProbe, threshold)
    }
    coOccurrencePairs(docs)
      .select(col("doc_a"), col("doc_b"),
        expr("round(CAST(inter AS DOUBLE) / CAST(na AS DOUBLE), 6)").as("cont_a"),
        expr("round(CAST(inter AS DOUBLE) / CAST(nb AS DOUBLE), 6)").as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
  }

  /** Small-vocabulary containment fast path: |A∩B| is one
    * bit_count(mask & mask) per blocked pair — no co-occurrence
    * explosion (and no length pruning to lose: containment scores
    * every same-block pair by definition). Zero-overlap pairs are
    * dropped before the division, matching the inverted path's
    * shared-word join semantics.
    */
  private def containmentPairsBitmask(docs: DataFrame, vocab: Array[String],
                                      threshold: Double): DataFrame =
    containmentPairsFromMasks(wordMasks(docs, vocab), threshold)

  /** The bitmask containment join over PRECOMPUTED (doc_id, grp, n,
    * mask) rows — the [[jaccardPairsFromMasks]] posture for the
    * containment criterion.
    */
  def containmentPairsFromMasks(masks: DataFrame,
                                threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    val a = masks.select(col("doc_id").as("doc_a"), col("grp"),
      col("mask").as("mask_a"), col("n").as("na"))
    val b = masks.select(col("doc_id").as("doc_b"), col("grp").as("grp_b"),
      col("mask").as("mask_b"), col("n").as("nb"))
    a.join(b, col("grp") === col("grp_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(mask_a & mask_b)").as("inter"), col("na"), col("nb"))
      .filter(col("inter") > 0)
      .select(col("doc_a"), col("doc_b"),
        expr("round(CAST(inter AS DOUBLE) / CAST(na AS DOUBLE), 6)").as("cont_a"),
        expr("round(CAST(inter AS DOUBLE) / CAST(nb AS DOUBLE), 6)").as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
  }

  /** Verify LSH candidate pairs from per-document KMV sketches ALONE
    * — no text re-read: each doc carries its bottom-`k` word-hash
    * sketch (k longs, dimension-sized), and per candidate pair the
    * SIGMOD'07 estimators (the q130 math applied per-document) give
    * Jaccard ρ = K∩/k′ over the combined bottom-k, the union size
    * (exact below capacity, (k−1)·2⁶⁰/h₍ₖ₎ at it), hence intersection
    * and BOTH containments (÷ the exact per-doc distinct-word counts,
    * carried from the same single corpus scan).
    *
    * This is the cheap middle tier of the dedup verification stack:
    * LSH banding proposes (recall-oriented, q22), THIS filters from
    * sketch rows only — at 100 TB the pair stage touches pairs × k
    * longs, never text — and the exact verify (q24/q160) runs only on
    * pairs that survive. Every estimate is a deterministic function of
    * the two hash sets, so the q163 oracle replays all of them
    * hash-exactly.
    */
  def sketchVerifyPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, maxBucketSize: Int = 10000): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val words = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("w"))
    val sk = words.groupBy(col("doc_id"))
      .agg(graft.functions.TypedAggs.kmvHashes(col("w"), k).as("hs"),
        count(lit(1)).as("nw"))
    // the module-standard bucket cap (r13 ADVICE: an uncapped proposal
    // tier reintroduces the |bucket|^2 explosion this stack exists to
    // prevent) — over-cap buckets produce no pairs here and stay
    // observable/dedupable via lshOversizedBuckets/Losers, exactly as
    // in the plain LSH path
    val cand = lshCandidates(minhashBands(df, idCol, textCol),
      maxBucketSize).select(col("doc_a"), col("doc_b"))
    cand
      .join(sk.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
        col("nw").as("na")), Seq("doc_a"))
      .join(sk.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
        col("nw").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        col("hs_a"), col("hs_b"),
        expr(s"slice(array_sort(array_union(hs_a, hs_b)), 1, $k)").as("comb"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        size(col("comb")).as("kk"),
        expr("size(filter(comb, h -> array_contains(hs_a, h) AND array_contains(hs_b, h)))")
          .as("k_int"),
        expr(s"""IF(size(comb) < $k, CAST(size(comb) AS DOUBLE),
                |   ${k - 1}D * 1152921504606846976.0D / element_at(comb, $k))"""
          .stripMargin).as("union_est"))
      .select(col("doc_a"), col("doc_b"),
        round(col("k_int").cast("double") / col("kk"), 6).as("jaccard_est"),
        round(col("k_int").cast("double") / col("kk") * col("union_est")
          / col("na").cast("double"), 6).as("cont_a_est"),
        round(col("k_int").cast("double") / col("kk") * col("union_est")
          / col("nb").cast("double"), 6).as("cont_b_est"))
  }

  /** SimHash signature over the word multiset (bits <= 60 since the
    * underlying hash is 60-bit). Near-dups = signatures within small
    * Hamming distance; the signature itself is the oracle-checkable unit.
    *
    * Shape: explode words → one md5 per word → a single HashAggregate
    * with one conditional ±1 sum per bit → recombine. Everything after
    * the explode is whole-stage-codegen'd; the equivalent nested
    * higher-order-function formulation is interpreted and ~20x slower.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    graft.functions.Md5Long60.ensureRegistered(df.sparkSession)
    val hashed = df
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .select(col("doc_id"), expr("md5_long60(CAST(w AS BINARY))").as("h"))
    val bitSums = hashed.groupBy(col("doc_id")).agg(
      sum(expr("(shiftright(h, 0) & 1) * 2 - 1")).as("b0"),
      (1 until bits).map(b =>
        sum(expr(s"(shiftright(h, $b) & 1) * 2 - 1")).as(s"b$b")): _*)
    val sig = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(s"b$b") >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitSums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Connected components over an undirected pair list — the
    * cluster-consistent completion of pairwise near-dup detection:
    * "drop doc_b of every pair" handles chains but cannot pick ONE
    * representative per transitive cluster (needed for cluster stats,
    * keep-best-quality-per-cluster policies, or audit). Output is
    * (id, component) where component = the min id reachable from `id`;
    * only ids appearing in `pairs` are emitted (singletons are their
    * own trivial component — join them in as `id = component`).
    *
    * Algorithm: min-label propagation WITH pointer jumping — each round
    * every node takes the min of (its label, its neighbors' labels, its
    * label's label). The jump step lets label information travel 2^k
    * hops after k rounds, so rounds = O(log diameter) instead of
    * O(diameter): a 1000-link duplicate chain converges in ~10
    * materializations, not 500. Each round is a constant number of
    * shuffles bounded by |edges|, and each round's result is EAGERLY
    * local-checkpointed: iterative DataFrame loops that merely persist
    * re-analyze a plan that grows per round — at r3's bench the
    * planning overhead, not the data, was the cost (25s for a 5k-node
    * graph). Checkpointing truncates lineage so round k's plan is
    * always 3 joins, regardless of k. The carried `old` column makes
    * the convergence check a filter over the already-materialized
    * frame. `maxIter` bounds pathological cases; hitting it throws
    * rather than returning a half-merged clustering.
    *
    * Correctness of the jump: label values are always node ids from the
    * same component (they start as self and only ever take mins over
    * in-component labels), so `label(label(id))` resolves in the same
    * mapping and is itself an in-component id; labels decrease
    * monotonically and are bounded below by the component's min id. At
    * the fixpoint every edge has equal labels on both ends and the min
    * node still holds itself, so every node holds the component min.
    *
    * Checkpoint blocks are freed by the ContextCleaner as each round's
    * frame goes out of scope. Checkpoint placement is
    * [[Checkpoints.pin]]: default executor-local (fastest; fine
    * single-machine), or pass `checkpointDir` for reliable
    * checkpointing — on a real cluster an executor loss mid-loop would
    * otherwise lose blocks with no lineage to rebuild from and kill
    * the job.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    def pin(df: DataFrame): DataFrame = Checkpoints.pin(df, checkpointDir)
    val edges = pin(pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct())
    var labels = pin(edges.select(col("src").as("id"))
      .distinct()
      .select(col("id"), col("id").as("component")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // neighbor min: best label reachable over one edge
      val via = edges
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("n_comp"))
      val stepped = labels
        .select(col("id"), col("component"), col("component").as("old"))
        .join(via, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("n_comp"), col("component")))
            .as("component"),
          col("old"))
      // pointer jump: follow the (pre-round) label one step
      val next = pin(stepped
        .join(labels.select(col("id").as("jid"), col("component").as("jcomp")),
          stepped("component") === col("jid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("jcomp"), col("component")))
            .as("component"),
          col("old")))
      val changed = next.filter(col("component") =!= col("old")).count()
      labels = next.select(col("id"), col("component"))
      converged = changed == 0
    }
    if (!converged)
      throw new IllegalArgumentException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds the bound; raise maxIter")
    labels
  }

  /** Cluster-representative selection — the keeper policy
    * [[connectedComponents]]' scaladoc promises: every document joined
    * to its transitive near-dup component (docs in NO pair are their
    * own singleton component), then ONE representative kept per
    * component by max `metricCol` (tie: min id — a total order, so the
    * choice is deterministic). "Keep the longest/highest-quality
    * member, drop its near-dup cloud" is the curator's standard move
    * after pairwise detection — dropping `doc_b` of every pair handles
    * chains but picks representatives arbitrarily.
    *
    * Scale shape: components cost O(edges · log diameter)
    * ([[connectedComponents]]); the argmax is a map-side-combining
    * `max(struct(metric, −id))` hash aggregate — no Window, no
    * per-component sort; membership joins are id-to-id on narrow
    * frames. Output: (doc_id, component, metric, kept) for every
    * input row.
    */
  def keepBestPerCluster(df: DataFrame, idCol: String, metricCol: Column,
                         pairs: DataFrame, aCol: String = "doc_a",
                         bCol: String = "doc_b", maxIter: Int = 20,
                         checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol, maxIter, checkpointDir)
      .withColumnRenamed("id", "doc_id")
    val members = df.select(col(idCol).as("doc_id"), metricCol.as("metric"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val best = members.groupBy(col("component"))
      .agg(max(struct(col("metric"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("component"), (-col("m.nid")).as("keep_id"))
    members.join(best, "component")
      .select(col("doc_id"), col("component"), col("metric"),
        (col("doc_id") === col("keep_id")).as("kept"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, Phys. Rev. E
    * 76), `iters` fixed rounds: every node simultaneously takes its
    * neighbors' most frequent label (count desc, label asc — a total
    * order, so the vote is DETERMINISTIC where classic async LPA is
    * run-order random), isolated fallback = keep own. Communities are
    * the finer sibling of [[connectedComponents]]: CC glues everything
    * transitively reachable, so ONE borderline LSH edge merges two big
    * dup clusters; LPA's majority vote keeps densely-linked groups
    * separate across a single weak bridge — the practical cluster-audit
    * companion when banding produces chain artifacts. Fixed synchronous
    * rounds rather than run-to-convergence: sync LPA can 2-cycle on
    * bipartite-ish structures, and a fixed unroll is what a SQL oracle
    * can replay — all-integer state ⇒ hash-exact.
    *
    * Shape per round: one (src, label) vote aggregate over the edges ⋈
    * labels join + one min-struct argmax + a left-join fallback — all
    * hash-partitioned on node id, work ∝ |edges|; each round's labels
    * frame is lazily pinned (the q70 discipline: referenced twice —
    * votes and fallback — an unpinned round would re-execute the whole
    * prefix twice per round and the plan would double per iteration).
    * Output: (id, community).
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       iters: Int = 3,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    def pin(df: DataFrame): DataFrame =
      Checkpoints.pin(df, checkpointDir, eager = false)
    val edges = pin(pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct())
    var labels = pin(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")))
    for (_ <- 1 to iters) {
      val votes = edges
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .groupBy(col("src").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val best = votes.groupBy(col("id"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("b"))
        .select(col("id"), col("b.l").as("nl"))
      labels = pin(labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl")))
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member of
    * the dedup family (text fingerprints miss paraphrases; embeddings
    * catch them). Blocking via sign-random-projection LSH
    * ([[Similarity.lshBuckets]] — candidate generation is an equi-join
    * on bucket, Σ|bucket|² work, never n²), then EXACT cosine
    * verification inside each bucket; pairs at-or-above `threshold`
    * survive. Cosine is rounded to 6 digits before thresholding so the
    * cut is engine-stable (same convention as the similarity ops).
    *
    * Recall note: one plane family ⇒ a true near-dup pair split across
    * buckets is missed; production stacks `planes` families (union of
    * candidate sets) to drive miss-rate down — same plan shape, more
    * candidate rows.
    *
    * Scale note: `planes` bounds the bucket count at 2^planes — size it
    * with [[Similarity.planesFor]] (ceil(log2 corpus) + margin, e.g.
    * 24-29 planes for 1e8+ vectors) so per-bucket candidate sets stay
    * small; the default 8 matches the other SRP ops at test scale but
    * is far too coarse for a real corpus (256 buckets ⇒ quadratic
    * blowup inside each).
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, planes: Int = 8): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    // zero vectors (failed/padded embedding runs) are excluded BEFORE
    // pairing: their cosine is 0/0 = NaN, and Spark orders NaN above
    // every double, so `NaN >= threshold` would emit the pair and a
    // legitimate doc would be dropped for having a broken neighbor
    val e = emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .withColumn("norm2", expr("array_dot(vec, vec)"))
      .filter(col("norm2") > 0)
      .join(Similarity.lshBuckets(emb, idCol, vecCol, planes),
        col("vid") === col("vec_id"))
      .drop("vec_id")
    val a = e.select(col("vid").as("vec_a"), col("vec").as("vec_l"),
      col("norm2").as("norm2_l"), col("bucket"))
    val b = e.select(col("vid").as("vec_b"), col("vec").as("vec_r"),
      col("norm2").as("norm2_r"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        expr("round(array_dot(vec_l, vec_r) / sqrt(norm2_l * norm2_r), 6)")
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings by nearest centroid, compare
    * pairs ONLY within a cluster, and drop every member that has a
    * lower-id cluster-mate with cosine >= threshold. SemDeDup keeps a
    * random member of each duplicate group; keeping the min id is the
    * deterministic twin of that policy. The reported `dup_of` is the
    * smallest NEAR-IDENTICAL cluster-mate (picked by min(struct), a
    * map-side-combining aggregate — no Window sort) — in a similarity
    * CHAIN (A≈B, B≈C, A≉C) it can itself be a dropped doc (C's dup_of
    * is B, which A drops). Survivor-set semantics are unaffected: a
    * doc is kept iff it has no smaller near-identical cluster-mate.
    * Consumers needing a SURVIVING canonical id per dropped doc should
    * run [[connectedComponents]] over the (dup_of, vec_id) pairs (the
    * q65 move for LSH candidates) rather than chasing dup_of.
    *
    * This is the semantic companion of [[embeddingNearDup]]: SRP
    * buckets block by random hyperplane signs (near-exact duplicates),
    * centroid clusters block by topic region, which is what lets a
    * paraphrased duplicate land in the same comparison group. Work is
    * Σ|cluster|² — the LSH-bucket bound, never all-pairs; at 100 TB the
    * centroid count scales with the corpus (nlists ∝ √N keeps clusters
    * flat) and the pairing is one equi-join shuffle on centroid_id.
    * Zero-norm vectors are excluded before pairing (cosine NaN guard,
    * same as embeddingNearDup). Centroids are seeded from `centroidIds`
    * rows so the oracle can reproduce them; plug in
    * [[Similarity.kmeansCentroids]] for learned clusters — the plan
    * shape is identical (broadcast centroids, argmin, one equi-join).
    *
    * Output: (vec_id, centroid_id, dup_of, cosine) — one row per
    * DROPPED member.
    */
  def semDedupLosers(emb: DataFrame, idCol: String, vecCol: String,
                     centroidIds: Seq[Long], threshold: Double,
                     checkpointDir: Option[String] = None): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    val assign = Similarity.ivfAssign(emb, idCol, vecCol, centroidIds)
      .select(col("vec_id").as("vid"), col("centroid_id"))
    // pinned: the assigned-and-normed frame feeds BOTH sides of the
    // self-join — unpinned, the scan + broadcast-argmin lineage replays
    // twice whenever exchange reuse doesn't fire
    val e = Checkpoints.pin(
      emb.select(col(idCol).as("vid"), col(vecCol).as("vec"))
        .withColumn("norm2", expr("array_dot(vec, vec)"))
        .filter(col("norm2") > 0)
        .join(assign, "vid"),
      checkpointDir, eager = false)
    val a = e.select(col("vid").as("vec_a"), col("vec").as("vec_l"),
      col("norm2").as("norm2_l"), col("centroid_id"))
    val b = e.select(col("vid").as("vec_b"), col("vec").as("vec_r"),
      col("norm2").as("norm2_r"), col("centroid_id").as("centroid_b"))
    a.join(b, col("centroid_id") === col("centroid_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("centroid_id"),
        expr("round(array_dot(vec_l, vec_r) / sqrt(norm2_l * norm2_r), 6)")
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("vec_b"), col("centroid_id"))
      .agg(min(struct(col("vec_a"), col("cosine"))).as("m"))
      .select(col("vec_b").as("vec_id"), col("centroid_id"),
        col("m.vec_a").as("dup_of"), col("m.cosine").as("cosine"))
  }

  /** The frozen band store for [[nearDupFlags]]: the kept corpus's
    * distinct (band_id, band_hash) buckets — doc ids deliberately
    * dropped (the gate asks "does this band exist in history", not
    * "against whom"), so the store is bounded by the corpus's bucket
    * count, not its row count. At scale, write it bucketed on
    * (band_id, band_hash) (the [[fingerprintStore]] pattern) so the
    * gate's semi-join is co-located with zero store re-shuffle.
    */
  def bandStore(corpus: DataFrame, idCol: String, textCol: String,
                numHashes: Int = 8, bandSize: Int = 2,
                shingleSize: Int = 3): DataFrame =
    minhashBands(corpus, idCol, textCol, numHashes, bandSize, shingleSize)
      .select(col("band_id"), col("band_hash")).distinct()

  /** Near-duplicate gate against a frozen [[bandStore]]: every arriving
    * document is flagged with how many of its MinHash bands collide
    * with history — `flagged` (>= 1 hit) is the high-recall pre-filter
    * a production ingest runs BEFORE paying for exact verification
    * (band collision ⇒ probable near-dup; the S-curve knobs are the
    * usual numHashes/bandSize). Stateless per row: one band projection
    * (codegen'd minhash pipeline) + one semi-join on the dimension-ish
    * store + one per-doc count — no candidate pairs, no text in any
    * Exchange. The streaming form is this SAME function inside
    * foreachBatch (the arrivals-vs-static-store shape; see
    * StreamingSpec) — per-batch latency, no state store.
    *
    * Output: (doc_id, hit_bands, flagged) for every input row.
    */
  def nearDupFlags(docs: DataFrame, store: DataFrame, idCol: String,
                   textCol: String, numHashes: Int = 8, bandSize: Int = 2,
                   shingleSize: Int = 3): DataFrame = {
    val bands = minhashBands(docs, idCol, textCol, numHashes, bandSize,
      shingleSize)
    val hits = bands
      .join(store.select(col("band_id"), col("band_hash")),
        Seq("band_id", "band_hash"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hit_bands"))
    docs.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hit_bands"), lit(0L)).as("hit_bands"))
      .withColumn("flagged", col("hit_bands") > 0)
  }

  /** Snapshot diff: what changed between two corpus dumps, by content
    * fingerprint — the audit a pipeline runs before re-training on a
    * new crawl ("how much actually moved?"). One full-outer equi-join
    * on the id over NARROW (id, fingerprint) projections — text never
    * shuffles — emitting only the rows that differ: status ∈ added
    * (id only in `b`), removed (only in `a`), changed (both, different
    * [[fingerprint]]). Unchanged rows — the overwhelming mass of a
    * dump-over-dump diff — are filtered before they move anywhere.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val fa = a.select(col(idCol).as("id"), fingerprint(textCol).as("fp_a"))
    val fb = b.select(col(idCol).as("id"), fingerprint(textCol).as("fp_b"))
    fa.join(fb, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("id"), col("status"), col("fp_a"), col("fp_b"))
  }

  /** Cross-document EXACT substring matches, as maximal shared token
    * spans — the exact-match member of the near-dup family (MinHash
    * answers "mostly the same document"; this answers "these 50 tokens
    * appear verbatim in both", the boilerplate/quotation signal the
    * suffix-array dedup of Lee et al. 2021 targets; reference:
    * user-behavior-analysis has no text dedup at all, this extends the
    * corpus-pipeline side).
    *
    * Distributed formulation (suffix arrays don't shard; shingles do):
    * every k-token shingle occurrence is one (doc, pos, hash) row; a
    * shingle shared by two documents is one equi-join hit; consecutive
    * hits on the same alignment diagonal (pos_a − pos_b) chain into a
    * maximal span. Work is Σ occ(h)² over shared shingle hashes — the
    * LSH-bucket bound — and `maxOccurrences` caps it: a shingle in more
    * than that many positions corpus-wide (boilerplate headers) is
    * excluded from matching, the same audited-cap discipline as
    * [[lshCandidates]]. A span containing an excluded shingle splits at
    * it; with suffix-array fidelity required, lower k or raise the cap.
    *
    * The island merge is Window-free: a hit is a span START iff no hit
    * precedes it on its diagonal (anti-join at pos−1), an END iff none
    * follows (anti-join at pos+1); islands are disjoint, so each start
    * pairs with the NEAREST end at-or-after it (join + min aggregate).
    * All joins are equi-joins on (doc_a, doc_b, diag, pos) — hash-
    * partitioned, no Window, nothing driver-side; the hit frame is
    * lazily pinned (read by four consumers).
    *
    * Returns (doc_a, doc_b, a_start, b_start, span_tokens), doc_a <
    * doc_b, positions 0-based, span_tokens >= k. 60-bit shingle hashes
    * are compared in place of the strings (the cross-engine md5-60
    * family); a collision would need ~2^30 distinct shingles per
    * (doc-pair, diagonal) to matter.
    */
  def exactSubstringSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8, maxOccurrences: Int = 64,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxOccurrences >= 2, "maxOccurrences must be >= 2")
    val occ = df.select(col(idCol).as("doc"),
        posexplode(graft.functions.WordNgrams(df.sparkSession,
          col(textCol), k)).as(Seq("pos", "gram")))
      .select(col("doc"), col("pos").cast("long").as("pos"),
        graft.functions.Hashing.md5Long(col("gram")).as("h"))
    // shared-and-not-hot hashes: count >= 2 prunes the (dominant)
    // singleton mass before the self-join; the upper cap bounds Σ cnt²
    val shared = occ.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2 && col("cnt") <= maxOccurrences)
      .select(col("h"))
    val o = occ.join(shared, "h")
    val hits = Checkpoints.pin(
      o.select(col("h"), col("doc").as("doc_a"), col("pos").as("pos_a"))
        .join(o.select(col("h"), col("doc").as("doc_b"), col("pos").as("pos_b")),
          "h")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("pos_a"),
          (col("pos_a") - col("pos_b")).as("diag")),
      checkpointDir, eager = false)
    val keys = Seq("doc_a", "doc_b", "diag", "pos_a")
    val starts = hits.join(
      hits.select(col("doc_a"), col("doc_b"), col("diag"),
        (col("pos_a") + 1).as("pos_a")), keys, "left_anti")
    val ends = hits.join(
      hits.select(col("doc_a"), col("doc_b"), col("diag"),
        (col("pos_a") - 1).as("pos_a")), keys, "left_anti")
    starts.select(col("doc_a"), col("doc_b"), col("diag"),
        col("pos_a").as("a_start"))
      .join(ends.select(col("doc_a"), col("doc_b"), col("diag"),
        col("pos_a").as("a_end")), Seq("doc_a", "doc_b", "diag"))
      .filter(col("a_end") >= col("a_start"))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("a_start"))
      .agg(min(col("a_end")).as("a_end"))
      .select(col("doc_a"), col("doc_b"), col("a_start"),
        (col("a_start") - col("diag")).as("b_start"),
        (col("a_end") - col("a_start") + lit(k.toLong)).as("span_tokens"))
  }

  /** Edit-distance near-dup join with Ed-Join-style prefix filtering
    * (Xiao, Wang & Lin: all pairs within Levenshtein distance
    * `maxDist` share a q-gram among each string's `q·d + 1` RAREST
    * distinct grams under one global (frequency, gram) order — d edits
    * destroy at most q·d gram types, and the symmetric prefix lemma
    * turns that into a candidate filter). Candidates come from ONE
    * equi-join on prefix grams — and the rarest-gram choice is what
    * keeps those buckets small (joining on arbitrary grams would
    * bucket half the corpus on its commonest trigram); the length band
    * |len(a) − len(b)| ≤ d prunes before the verify, and exact
    * THRESHOLDED `levenshtein(a, b, maxDist)` decides — the banded
    * early-abandon form computes O(d·min(len)) cells instead of the
    * full O(len²) DP and quits the moment the band exceeds d, which
    * is ~10× on verify when (as always) most candidates fail. Strings
    * too short for the
    * count argument (len < q·(d+1)) fall back to a banded
    * nested-loop against the whole frame — sound for any input, and
    * sized by the short class (tiny for real title/text data; the
    * fallback is the documented cost of keeping the filter LOSSLESS
    * rather than dropping short strings silently). That cost is
    * OBSERVABLE, not just documented: `maxShorts` caps the short
    * class and the op RAISES past it — on a corpus dominated by
    * short strings the fallback degenerates to a near-quadratic
    * join, and the raise surfaces that before it burns a cluster
    * (the observable-cap rule; the default Long.MaxValue keeps the
    * op lossless-by-default and matches the uncapped q228 oracle —
    * the q22/q163 uncapped-oracle convention).
    *
    * The q228 oracle verifies completeness relationally: DuckDB
    * computes the EXHAUSTIVE banded join, so a green row proves the
    * prefix filter lost no pair.
    *
    * Emits (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDist: Int, gramLen: Int = 3,
                        maxShorts: Long = Long.MaxValue,
                        checkpointDir: Option[String] = None): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(gramLen >= 2, "gramLen must be >= 2")
    require(maxShorts >= 0, "maxShorts must be >= 0")
    val prefixLen = gramLen * maxDist + 1
    val minLong = gramLen * (maxDist + 1)
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"),
      length(col(textCol)).as("len"))
    val longs = base.filter(col("len") >= minLong)
    // pinned when the cap guard is live: shortsRaw then feeds BOTH
    // the count(_nshort) aggregate and the guarded row output —
    // unpinned, the base filter subtree evaluates twice (the same
    // two-consumer rule the gram frame below follows; ADVICE r17)
    val shortsRaw =
      if (maxShorts == Long.MaxValue) base.filter(col("len") < minLong)
      else Checkpoints.pin(base.filter(col("len") < minLong),
        checkpointDir, eager = false)
    // the observable cap on the quadratic-fallback class: guard the
    // SHORT side before its nested-loop join, so an over-cap corpus
    // raises at the first short row rather than mid-way through the
    // degenerate join (cap = Long.MaxValue compiles the guard away)
    val shorts =
      if (maxShorts == Long.MaxValue) shortsRaw
      else shortsRaw
        .crossJoin(broadcast(shortsRaw.agg(count(lit(1)).as("_nshort"))))
        .select(col("id"),
          when(col("_nshort") > maxShorts,
            raise_error(concat(
              lit("editDistancePairs: short-string fallback class has "),
              col("_nshort").cast("string"),
              lit(s" rows (> maxShorts = $maxShorts) — the banded " +
                "nested-loop would go near-quadratic; raise the cap " +
                "only if that cost is intended"))))
            .otherwise(col("t")).as("t"),
          col("len"))
    // pinned: the gram frame feeds BOTH the frequency aggregate and
    // the prefix pick, and the prefix frame feeds BOTH sides of the
    // candidate self-join — unpinned, the explode/freq/Window subtree
    // evaluates twice per reuse (the q225 lesson)
    val grams = Checkpoints.pin(
      longs.select(col("id"), col("t"), col("len"),
        explode(array_distinct(expr(
          s"transform(sequence(1, length(t) - ${gramLen - 1}), " +
            s"i -> substring(t, i, $gramLen))"))).as("g")),
      checkpointDir, eager = false)
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("f"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("f").asc, col("g").asc)
    val prefixes = Checkpoints.pin(
      grams.join(freq, "g")
        .withColumn("_r", row_number().over(wr))
        .filter(col("_r") <= prefixLen)
        .select(col("g"), col("id"), col("t"), col("len")),
      checkpointDir, eager = false)
    val fromPrefix = prefixes.as("a").join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.t").as("ta"),
        col("a.len").as("la"), col("b.id").as("id_b"),
        col("b.t").as("tb"), col("b.len").as("lb"))
    // short strings: banded nested-loop against EVERYTHING (both
    // orders, normalized to id_a < id_b) — |shorts| bounds the cost
    val fromShort = shorts.as("s").join(base.as("o"),
        col("s.id") =!= col("o.id") &&
          abs(col("s.len") - col("o.len")) <= maxDist)
      .select(
        least(col("s.id"), col("o.id")).as("id_a"),
        when(col("s.id") < col("o.id"), col("s.t")).otherwise(col("o.t"))
          .as("ta"),
        when(col("s.id") < col("o.id"), col("s.len"))
          .otherwise(col("o.len")).as("la"),
        greatest(col("s.id"), col("o.id")).as("id_b"),
        when(col("s.id") < col("o.id"), col("o.t")).otherwise(col("s.t"))
          .as("tb"),
        when(col("s.id") < col("o.id"), col("o.len"))
          .otherwise(col("s.len")).as("lb"))
    fromPrefix.unionByName(fromShort)
      .filter(abs(col("la") - col("lb")) <= maxDist)
      .select(col("id_a"), col("id_b"), col("ta"), col("tb")).distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb"), maxDist).cast("long")
          .as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Duplicate-cluster SIZE distribution — the dedup observability
    * read ("how much of the corpus sits in how-big clusters") behind
    * every dedup dashboard: one row per cluster size with the number
    * of clusters of that size, INCLUDING the singleton row folded
    * from the corpus total (nodes in no candidate pair never reach
    * [[connectedComponents]]; reporting them is the point — a corpus
    * that is 95% singletons dedups very differently from one that is
    * 95% one giant component). Components from edges always have
    * size ≥ 2, so the singleton row never collides.
    *
    * Shape: two hash aggregates over the component assignment
    * (component → size → histogram) + two 1-row counts; work ∝ the
    * assignment frame, never the corpus text.
    */
  def clusterSizeHistogram(corpus: DataFrame, idCol: String,
                           cc: DataFrame): DataFrame = {
    val sizes = cc.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    val hist = sizes.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val singles = corpus.agg(count(col(idCol)).as("_total"))
      .crossJoin(broadcast(cc.agg(count(lit(1)).as("_in_cc"))))
      .select(lit(1L).as("cluster_size"),
        (col("_total") - col("_in_cc")).as("n_clusters"))
      .filter(col("n_clusters") > 0)
    hist.unionByName(singles)
  }
}
