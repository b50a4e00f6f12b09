package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression pins for the properties the 100 TB design
  * depends on (PLANS.md documents the why): filters reaching the scans,
  * broadcast choices on dimension joins, rank-limit pushdown, exchange
  * counts. A future refactor that silently turns a broadcast join into
  * a cartesian, or detaches a filter from its scan, fails here instead
  * of only in a bench regression.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: the event filter is pushed into the parquet scan") {
    val p = plan("q01_pv_hourly")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_type,view)"))
  }

  test("q04: rank<=5 is pre-pruned below the shuffle (WindowGroupLimit)") {
    assert(plan("q04_hot_items_top5").contains("WindowGroupLimit"))
  }

  test("q13: single aggregation exchange over one scan (partial+final)") {
    val p = plan("q13_pricing_summary")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2) // agg + AQE read
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q36: star join stays broadcast — lineitem never shuffles before the agg") {
    val p = plan("q36_region_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q50: top-100 is TakeOrderedAndProject, not a global sort") {
    val p = plan("q50_large_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q57: OR-of-bands stays a hash join with the disjunction pushed to the scan") {
    val p = plan("q57_disjunctive_band_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)")) // pushed OR band
  }

  test("q63: every predicate reaches the scan; no join operators at all") {
    val p = plan("q63_forecast_revenue")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    assert(!p.contains("Join"))
  }

  test("q47: hash sampling is a pure filter — zero exchanges, zero joins") {
    val p = plan("q47_stratified_sample")
    assert(!p.contains("Exchange") && !p.contains("Join"))
  }

  test("q40: exact deciles WITHOUT a Window — no per-group single-task sort") {
    // the old shape (ntile over a 5-value partition key) sorted each
    // priority's entire order set on one task; the plan must now be
    // Window-free: range partitioning + broadcast offset join instead
    val p = plan("q40_order_deciles")
    assert(!p.contains("Window"), "q40 regressed to a Window-based ntile")
    assert(p.contains("BroadcastHashJoin"), "offset join should broadcast")
  }

  test("q33: centroid argmin is a partial-combining aggregate, not a Window over n x k") {
    val p = plan("q33_ivf_assign")
    assert(!p.contains("Window"),
      "ivfAssign regressed to a Window argmin — n x k rows would sort-shuffle")
    // the only join is the broadcast of the k centroids
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q70: k-means iterations are pinned — plan stays linear in iters") {
    // without the per-iteration centroid pin the unrolled plan doubles
    // per round (22 scans at iters=2); pinned it reads each source once
    // per remaining segment
    val p = plan("q70_kmeans_assign")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans <= 3, s"q70 plan re-reads the corpus $scans times — pin broke")
    assert(!p.contains("CartesianProduct"))
  }

  test("q73: funnel tiers are pinned — the event log is not re-scanned per tier pair") {
    // unpinned, the k=3 funnel assembly re-read events 12 times (each
    // tier subtree repeats in every later tier and in the assembly)
    val p = plan("q73_window_funnel")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans <= 3, s"q73 assembly re-scans events $scans times — tier pin broke")
    assert(!p.contains("CartesianProduct"))
  }

  test("q77: packing's global cumsum is Window-free — no single-partition sort") {
    val p = plan("q77_pack_sequences")
    assert(!p.contains("Window"),
      "q77 regressed to a global-ordered Window — whole table through one task")
    assert(!p.contains("CartesianProduct"))
  }

  test("q83/q84: chunker and dataset split are pure narrow plans — zero exchanges, zero joins") {
    for (q <- Seq("q83_chunk_words", "q84_dataset_split")) {
      val p = plan(q)
      assert(!p.contains("Exchange") && !p.contains("Join"),
        s"$q claims narrow/no-shuffle but the plan disagrees:\n$p")
    }
  }

  test("q101: fixed-size sampling pre-prunes rank<=n below the shuffle (WindowGroupLimit)") {
    // strata are low-cardinality — without the group-limit pre-prune
    // the whole corpus would shuffle into a handful of Window tasks
    val p = plan("q101_fixed_size_sample")
    assert(p.contains("WindowGroupLimit"))
  }

  test("q86: mixture membership is a pure pushdown-friendly filter — zero exchanges, zero joins") {
    // the dimension-sized stratum-count collect happens at query
    // CONSTRUCTION; the returned plan must be scan + filter + project
    val p = plan("q86_mixture")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"q86 membership should be a pure filter but the plan disagrees:\n$p")
  }

  test("q90: the subword tokenizer is one narrow codegen'd projection — zero exchanges, zero joins") {
    // (the vocab derivation collects separately at query-construction
    // time; the counting query itself is the scan + one expression)
    val p = plan("q90_subword_count")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"q90 claims narrow/no-shuffle but the plan disagrees:\n$p")
    assert(p.contains("subword_count"))
  }

  test("q80: the corpus token explode runs once behind the pin; stats derive from tf") {
    // unpinned, the tf / term-count / corpus-total subtrees each re-scan
    // and re-explode the text — 3x the most expensive stage at 100 TB
    val p = plan("q80_unigram_logprob")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q80 re-reads the corpus $scans times — tf pin broke")
    assert(!p.contains("CartesianProduct"))
  }

  test("q97: the bigram explode runs once behind the pin; context totals derive from tf") {
    // unpinned, the tf / bigram-count / context-total subtrees each
    // re-scan and re-explode — 3x the dominant cost (the q80 shape)
    val p = plan("q97_bigram_logprob")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q97 re-reads the corpus $scans times — tf pin broke")
    assert(!p.contains("CartesianProduct"))
  }

  test("q71: gram expansion is narrow; exactly the two aggregation exchanges") {
    val p = plan("q71_repetition")
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges <= 4, s"q71 should shuffle only for its two aggregates, saw $exchanges")
    assert(!p.contains("Join"), "q71 must not join")
    assert(p.contains("HashAggregate"))
  }

  test("q102: semantic dedup pairs only within clusters — equi-join, no cartesian, no Window") {
    val p = plan("q102_semantic_dedup")
    assert(!p.contains("CartesianProduct"),
      "the within-cluster pairing must be an equi-join on centroid_id, never all-pairs")
    assert(!p.contains("Window"),
      "the min-id keeper must be a min-struct aggregate, not a Window sort")
    // the assigned+normed frame feeds both self-join sides from ONE pin
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q102 re-reads the embeddings $scans times — pin broke")
  }

  test("q105: per-cluster quota pre-prunes below the shuffle (WindowGroupLimit)") {
    val p = plan("q105_cluster_balanced_sample")
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q103: the importance-score token explode runs once behind the pin") {
    // unpinned, the tf / corpus-count / target-count / totals subtrees
    // each re-scan and re-explode the text — 4x the dominant cost
    val p = plan("q103_importance_resample")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q103 re-reads the corpus $scans times — tf pin broke")
    assert(!p.contains("CartesianProduct"))
  }

  test("q104: epoch allocation is aggregates + a broadcast of the allocation table") {
    val p = plan("q104_epoch_allocation")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans <= 2, s"q104 should scan documents at most twice, saw $scans")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(!p.contains("Window"))
  }

  test("q106: the span explode runs once behind the pin; no Window in the reassembly") {
    // unpinned, the counts and the join-back sides each re-scan and
    // re-explode the corpus; the ordered reassembly must stay an
    // in-row fold (array_sort), not a per-doc Window sort
    val p = plan("q106_drop_repeated_spans")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q106 re-reads the corpus $scans times — span pin broke")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
  }

  test("q107: the domain gate reads documents ONCE — quality carries source, no join-back") {
    // quality is a pure per-row projection; `source` rides in the same
    // select (qualityScore carryCols). The only documents read is the
    // one inside PrefixSum's pinned range-partition pass, so ZERO
    // parquet scans may appear outside the pin — the old join-back
    // shape showed one (a second full text scan + equi-join at 100 TB)
    val p = plan("q107_domain_quality_gate")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q107 re-reads documents $scans times — carryCols regressed to a join-back")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q88: PQ encode serves from the store; the BUILD path keeps the broadcast-argmin shape (no sort join, no Window)") {
    // the serving plan is a store scan (pinned with the family test
    // below); the encode shape now matters at store BUILD time
    val emb = Tables.embeddings(spark, dir)
    val coarse = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select(org.apache.spark.sql.functions.col("vec_id").as("centroid_id"),
        org.apache.spark.sql.functions.col("embedding").as("c_vec"))
    val cbs = graft.ops.Pq.codebooks(emb, "vec_id", "embedding",
      m = 8, subDim = 8, initIds = Seq(0L, 1L, 2L, 3L), iters = 1,
      orderedMeans = true)
    val p = graft.ops.Pq.codeRows(emb, "vec_id", "embedding", cbs, coarse,
        m = 8, subDim = 8)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"),
      "codebook/centroid joins must broadcast")
    // the one allowed shuffle join: codes ⋈ coarse assignment on
    // vec_id — both sides narrow longs, a build-time cost paid once
    assert("""SortMergeJoin""".r.findAllIn(p).size <= 2, // tree + detail line
      s"more than the one narrow vec_id join:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"),
      "the per-(vec, sub) argmin must be a min-struct aggregate, not a Window")
  }

  test("q89: ADC scores via a broadcast LUT join; the only Window is the final top-k rank") {
    val p = plan("q89_pq_adc")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert("""(?m)^\(\d+\) Window\s*$""".r.findAllIn(p).size <= 1,
      "only the rank<=k Window operator is allowed; the m-term sums are hash aggregates")
    assert(p.contains("WindowGroupLimit"), "rank<=k should pre-prune below the shuffle")
  }

  test("q298: the retrained store's serving ADC keeps the q89 shape — broadcast LUT, no cartesian, one rank Window") {
    // the read half of the retrain lifecycle serves from the WRITTEN
    // code table exactly like q89: a store rewrite must never demote
    // the broadcast LUT join into a sort-merge/cartesian over m×k*
    // partial distances
    val p = plan("q298_vector_retrain")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert("""(?m)^\(\d+\) Window\s*$""".r.findAllIn(p).size <= 1,
      "only the rank<=k Window operator is allowed; the m-term sums are hash aggregates")
    assert(p.contains("WindowGroupLimit"), "rank<=k should pre-prune below the shuffle")
  }

  test("q118: frozen gate joins the dimension-sized cuts broadcast; text never shuffles") {
    // the scoring side is a pure projection over the scan; the cuts
    // side aggregates to one row per domain and joins back BROADCAST
    // (explicit hint) — a sort-merge here would shuffle every scored
    // row on the domain key (few distinct values: the skew trap)
    val p = plan("q118_frozen_gate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // no Exchange may carry the text column — quality is computed in
    // the projection and only (doc_id, source, quality) moves
    val shuffled = """(?m)^\(\d+\) Exchange[\s\S]*?Arguments.*$""".r
      .findAllIn(p).filter(_.contains("text")).toSeq
    assert(shuffled.isEmpty, s"text-carrying Exchange in q118: $shuffled")
  }

  test("q123: BPE encode is vocabulary-scale — pinned word table, no Window, no text shuffle") {
    // merge application folds into projections over the PINNED
    // distinct-word table (the pin is the localCheckpoint ExistingRDD
    // scan); the only Exchange is the final (piece, cnt) aggregate —
    // dust-sized pairs, never documents
    val p = plan("q123_bpe_token_counts")
    assert(p.contains("Scan ExistingRDD"), "word table must be pinned")
    assert(!p.contains(") Window"), "no WindowExec anywhere in encode")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    val shuffled = """(?m)^\(\d+\) Exchange[\s\S]*?Arguments.*$""".r
      .findAllIn(p).filter(_.contains("text")).toSeq
    assert(shuffled.isEmpty, s"text-carrying Exchange in q123: $shuffled")
  }

  test("q124: CMS estimates read from ONE broadcast sketch row — no re-aggregation") {
    // the sketch is a keyless ObjectHashAggregate (fixed-size buffer,
    // map-side combine); estimates are element_at arithmetic on the
    // broadcast single-row result — no Window, no extra corpus scan
    // beyond the two declared (exact counts + sketch build)
    val p = plan("q124_cms_counts")
    assert(p.contains("ObjectHashAggregate"), "CMS must aggregate object buffers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the one-row sketch must broadcast")
    assert(!p.contains("CartesianProduct"))
    // formatted mode prints each node in the tree AND the details
    // section: 2 occurrences per physical scan ⇒ bound 4 = two scans
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 4,
      "exact counts + sketch build: at most two corpus scans")
  }

  test("q126: NB scoring — broadcast label dimension, no Window, argmax as aggregate") {
    // the per-doc argmax is max(struct(score, label)) — a hash
    // aggregate, not a row_number Window; the label dimension (one row
    // per class) broadcasts onto the narrow tf frame; text never
    // crosses an Exchange (both explodes happen below the pins)
    val p = plan("q126_nb_classify")
    assert(!p.contains(") Window"), "argmax must be an aggregate, not a Window")
    assert(p.contains("BroadcastExchange"), "label dimension must broadcast")
    assert(!p.contains("CartesianProduct"))
    val shuffled = """(?m)^\(\d+\) Exchange[\s\S]*?Arguments.*$""".r
      .findAllIn(p).filter(_.contains("text")).toSeq
    assert(shuffled.isEmpty, s"text-carrying Exchange in q126: $shuffled")
  }

  test("q133: PageRank rounds are joins + hash aggregates — no Window, no cartesian") {
    val p = plan("q133_pagerank")
    assert(!p.contains(") Window"), "no WindowExec in the power iteration")
    assert(!p.contains("CartesianProduct"))
  }

  test("q150/q155: image decode + phash are pure partition-parallel maps — zero exchanges") {
    // the codec passes must stay embarrassingly parallel: any Exchange
    // here would mean binary payloads crossing the network
    for (q <- Seq("q150_image_decode", "q155_image_phash")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles payloads:\n$p")
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
    }
  }

  test("q161: FIM transform is a pure projection — zero exchanges, zero joins") {
    val p = plan("q161_fim_transform")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"per-document transform must run at scan speed:\n$p")
  }

  test("q152/q158: sketch warehouse — hash aggregates only, no joins, no Window") {
    for (q <- Seq("q152_kmv_warehouse", "q158_hll_warehouse")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
        && !p.contains("BroadcastHashJoin"), s"$q grew a join:\n$p")
      assert(!p.contains(") Window"), s"$q grew a Window:\n$p")
      assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
        s"$q lost its aggregate shape:\n$p")
    }
  }

  test("q160: containment is equi-join shaped — no cartesian, text consumed before shuffle") {
    val p = plan("q160_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "set-similarity must stay equi-join shaped")
    val shuffled = """(?m)^\(\d+\) Exchange[\s\S]*?Arguments.*$""".r
      .findAllIn(p).filter(_.contains("text")).toSeq
    assert(shuffled.isEmpty, s"text-carrying Exchange in q160: $shuffled")
  }

  test("q134: substring spans — text never shuffles, island merge is Window-free") {
    // the shingle projection reduces every occurrence to (doc, pos,
    // hash-60) before any Exchange; the gaps-and-islands merge is
    // anti-joins + one min aggregate — a row_number() formulation would
    // put a Window here and fail this pin
    val p = plan("q134_substring_spans")
    assert(!p.contains(") Window"), "island merge must be Window-free")
    assert(!p.contains("CartesianProduct"))
    val shuffled = """(?m)^\(\d+\) Exchange[\s\S]*?Arguments.*$""".r
      .findAllIn(p).filter(_.contains("text")).toSeq
    assert(shuffled.isEmpty, s"text-carrying Exchange in q134: $shuffled")
  }

  test("q165/q173/q175: audio decode, fingerprint, resample — zero exchanges (the q150 rule)") {
    // the codec passes must stay embarrassingly parallel: any Exchange
    // here would mean WAV payloads crossing the network
    for (q <- Seq("q165_audio_decode", "q173_audio_fp",
        "q175_audio_resample")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles payloads:\n$p")
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
    }
  }

  test("q170: training export is Window-free — both prefix passes stay range-partitioned") {
    // a row_number()/sum-over-Window formulation of either the epoch
    // rank or the running token total would single-task the corpus.
    // (A CartesianProduct IS expected: PrefixSum broadcasts its
    // partition-count-sized offset row — the deliberate q77 shape.)
    val p = plan("q170_training_export")
    assert(!p.contains(") Window"), s"q170 grew a Window:\n$p")
  }

  test("q177/q178/q192: video demux, frames, subsample — zero exchanges (the codec-pass rule)") {
    for (q <- Seq("q177_video_demux", "q178_video_frames",
        "q192_video_subsample")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles payloads:\n$p")
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
    }
  }

  test("q190: attribution is equi-join + hash-agg argmax — no Window, no cartesian") {
    // both touch attributions come from ONE max/min(struct) aggregate;
    // a row_number formulation would sort every user's touch history
    val p = plan("q190_attribution")
    assert(!p.contains(") Window"), s"q190 grew a Window:\n$p")
    assert(!p.contains("CartesianProduct"), s"q190 grew a cartesian:\n$p")
  }

  test("q186: video fingerprint is a pure partition-parallel demux pass — zero exchanges") {
    // the print is computed from byte sums the box walk already has in
    // hand; any Exchange would mean container payloads crossing the
    // network before the signature reduces them to one BIGINT
    val p = plan("q186_video_fp")
    assert(!p.contains("Exchange"), s"q186 shuffles payloads:\n$p")
    assert(!p.contains("Join"), s"q186 grew a join:\n$p")
  }

  test("q183/q185: sketch read and dataset card stay aggregate-shaped — no cartesian beyond 1-row scalars, no Window") {
    // q183's crossJoins are three 1-row frames by construction; the
    // real guard is no Window and no sort-merge anywhere
    for (q <- Seq("q183_cms_join_size", "q185_dataset_card")) {
      val p = plan(q)
      assert(!p.contains(") Window"), s"$q grew a Window:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q grew a sort-merge join:\n$p")
    }
  }

  test("q182: item lift — pair join is an equi-join on user, no cartesian") {
    // the only nested-loop allowed is the broadcast of the 1-row
    // n_users scalar; the pair self-join must stay equi-join shaped
    val p = plan("q182_item_lift")
    assert(!p.contains("CartesianProduct"),
      s"q182 pair join degenerated to a cartesian:\n$p")
    assert(!p.contains(") Window"), s"q182 grew a Window:\n$p")
  }

  test("q198: MMR greedy rounds run behind the candidate/sim pins — no parquet re-scan per round") {
    // unpinned, every greedy round's anti-join chain re-derives the
    // cosineKnn head (and its Window) from the embeddings scan — k×
    // the dominant cost; pinned, the final plan reads only the two
    // localCheckpoint RDDs
    val p = plan("q198_mmr_topk")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans === 0, s"q198 re-reads embeddings $scans times — pin broke")
    assert(!p.contains("CartesianProduct"))
  }

  test("q203/q206/q207/q223: retrieval reads the WRITTEN index store — bucketed zero-Exchange merge, no corpus rescan") {
    // the store merge plan: bucket files already satisfy the
    // (token, doc_id) clustering, so the tf-sum merge needs no shuffle
    val mp = graft.ops.TextAnalysis.indexMergeSlices(
        Stores.index(spark, dir))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(mp.contains("Bucketed: true"), s"index store scan not bucketed:\n$mp")
    assert(!mp.contains("Exchange"), s"bucketed store merge shuffled:\n$mp")
    // and the norms file is one narrow store projection the same way
    val np = Stores.norms(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(np.contains("graft_norms_"), s"norms not store-backed:\n$np")
    // every retrieval query serves from the store pair — the corpus
    // parquet never appears in the plan (the q245 store-read posture)
    for (q <- Seq("q203_and_query", "q206_bm25", "q207_bm25_full",
        "q223_ta_topk")) {
      val p = plan(q)
      assert(!p.contains("documents.parquet"),
        s"$q rescans the corpus instead of reading the store:\n$p")
    }
  }

  test("Stores: distinct source dirs never share a table key; a dropped table self-heals on the next read") {
    // sanitizing alone collapses /a/sf0.1 and /a/sf0_1 to one key —
    // the md5 suffix keeps them (and any case-folded twins) apart
    assert(Stores.key("/a/sf0.1") !== Stores.key("/a/sf0_1"))
    assert(Stores.key("/a/B") !== Stores.key("/a/b"))
    // the memo is JVM-global but the catalog is session-scoped: after
    // a DROP TABLE the next read must rebuild, not fail
    val before = Stores.norms(spark, dir).count()
    spark.sql(s"DROP TABLE IF EXISTS graft_norms_${Stores.key(dir)}")
    assert(Stores.norms(spark, dir).count() === before && before > 0)
  }

  test("q209/q238: phrase/proximity read the WRITTEN positional store — bucketed zero-Exchange merge") {
    val mp = graft.ops.TextAnalysis.positionalMergeSlices(
        Stores.positional(spark, dir))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(mp.contains("Bucketed: true"),
      s"positional store scan not bucketed:\n$mp")
    assert(!mp.contains("Exchange"),
      s"bucketed positional merge shuffled:\n$mp")
    // NO corpus scan left in the query plans at all: the index comes
    // off the positional store and the term pick off the persisted
    // 1-row bigram statistic
    for (q <- Seq("q209_phrase_query", "q238_proximity_query")) {
      val p = plan(q)
      assert(!p.contains("documents.parquet"),
        s"$q still scans the corpus at query time:\n$p")
      assert(!p.toLowerCase.contains("posexplode"),
        s"$q posexplodes at query time:\n$p")
    }
  }

  test("q208/q225/q246: graph family reads the WRITTEN edge store — bucketed zero-Exchange merge, no log rescan") {
    val mp = graft.ops.Graph.edgeMerge(Stores.edges(spark, dir))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(mp.contains("Bucketed: true"),
      s"edge store scan not bucketed:\n$mp")
    assert(!mp.contains("Exchange"), s"bucketed edge merge shuffled:\n$mp")
    // the reads never touch the raw event log (q236's SEED pick is
    // the one legitimate events read left in its plan, so it is not
    // asserted here)
    for (q <- Seq("q208_pagerank", "q225_triangles", "q226_clustering_coeff",
        "q227_kcore", "q246_next_item")) {
      val p = plan(q)
      assert(!p.contains("events.parquet"),
        s"$q re-derives edges from the raw log:\n$p")
    }
  }

  test("q169: novelty gate — text never shuffles; the store join is on narrow shingle rows") {
    val p = plan("q169_novelty_gate")
    assert(!p.contains(") Window"), "the gate is joins + hash aggregates")
    assert(!p.contains("CartesianProduct"))
    val shuffled = """(?m)^\(\d+\) Exchange[\s\S]*?Arguments.*$""".r
      .findAllIn(p).filter(_.contains("text")).toSeq
    assert(shuffled.isEmpty, s"text-carrying Exchange in q169: $shuffled")
  }

  test("q221: CDC state is hash-agg argmax + one key join — no Window, no cartesian") {
    val p = plan("q221_cdc_state")
    assert(!p.contains(") Window"), s"q221 grew a Window:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("retrieval/phrase family: final rank is TakeOrderedAndProject + k-row Window — no single-partition candidate funnel") {
    // the r17 verdict's one weak mark: a global
    // row_number().over(Window.orderBy(...)) planned
    // Exchange(SinglePartition) → Sort → Window and pushed EVERY
    // candidate row (df-bounded, not capped, for the positional
    // reads) through one task. topKRanked plans the top-k as
    // TakeOrderedAndProject (per-partition top-k, one k-row merge);
    // the rank Window then sits directly on its SinglePartition
    // k-row output — so the plan must show the sort-limit and must
    // NOT show any Exchange SinglePartition (the Window's input
    // distribution is satisfied without one)
    for (q <- Seq("q209_phrase_query", "q238_proximity_query",
        "q260_bm25_trigram", "q259_and_trigram", "q257_phrase_trigram",
        "q206_bm25", "q203_and_query")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost the sort-limit:\n$p")
      assert(!p.contains("Exchange SinglePartition"),
        s"$q funnels candidates through one task:\n$p")
    }
  }

  test("q88/q89/q92/q98: PQ family serves from the WRITTEN code store — no per-query training, embeddings touched only for query vectors") {
    for (q <- Seq("q88_pq_encode", "q89_pq_adc", "q92_ivfpq",
        "q98_ivfpq_residual")) {
      val p = plan(q)
      assert(p.contains("graft_pqcodes") || p.contains("graft_pqrcodes"),
        s"$q does not read the written code table:\n$p")
      // codebook training's Lloyd round posexplodes the subvector
      // dims — absent from every serving plan (codebooks are a tiny
      // stored table, not a per-query k-means)
      assert(!p.toLowerCase.contains("posexplode"),
        s"$q retrains codebooks at query time:\n$p")
      // any embeddings scan left is the query vectors: every such
      // scan block must carry a pushed vec_id IN filter
      val blocks = p.split("\n\n").filter(_.contains("embeddings.parquet"))
      blocks.foreach { b =>
        assert(b.contains("In(vec_id"),
          s"$q scans embeddings without a query-id filter:\n$b")
      }
    }
  }

  test("q223: TA pruning pre-prunes per token below the final rank (WindowGroupLimit)") {
    // the per-token top-m impact prune must keep the q04 shape; the
    // only other Window is the final serving-scale rank
    val p = plan("q223_ta_topk")
    assert(p.contains("WindowGroupLimit"), s"q223 lost the prune:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q225/q227: triangle closing and k-core peel stay equi-join shaped — no cartesian; only the edge-source lead Window") {
    for (q <- Seq("q225_triangles", "q227_kcore")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      // the canonical edge frame is pinned, so the edge-source lead
      // Window lives BEHIND the pin and the graph ops add none: the
      // final plan is Window-free (unpinned, q225 held 45 re-derived
      // copies of the edge-building subtree)
      val windows = """\(\d+\) Window\b""".r.findAllIn(p).size
      assert(windows === 0, s"$q grew ${windows} Windows:\n$p")
    }
  }

  test("q228: fuzzy-join candidates come from the gram equi-join; only the short fallback may nest") {
    // the long path must never be a nested loop over the corpus; the
    // BNLJ in the plan belongs to the (empty here) short-string class
    val p = plan("q228_fuzzy_join")
    assert(!p.contains("CartesianProduct"), s"q228 went cartesian:\n$p")
    // the rarest-gram prefix rank lives BEHIND the candidate pin
    // (Scan ExistingRDD) so it evaluates once, not once per join
    // side — the final plan is Window-free; what must remain visible
    // is the long path surfacing as a HASH equi-join on the gram,
    // and at most the one nested loop of the short-string fallback
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"the gram equi-join is missing:\n$p")
    val nests = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
    assert(nests <= 1, s"q228 grew $nests nested loops:\n$p")
  }

  test("q232/q233: the user-day frame is pinned — one Window for growth, no parquet re-scan for stickiness") {
    val g = plan("q232_growth_accounting")
    // one explode pass instead of a union that would double the
    // window subtree; the pinned distinct frame scans once
    val windows = """\(\d+\) Window\b""".r.findAllIn(g).size
    assert(windows === 1, s"q232 grew $windows Windows:\n$g")
    assert(!g.contains("CartesianProduct"))
    val s = plan("q233_stickiness")
    // dau + two expansions + max-day all read the pin: the log is
    // scanned at most once in the final plan
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(s).size
    assert(scans <= 1, s"q233 re-scans the log ($scans scans):\n$s")
    assert(!s.contains("CartesianProduct"))
  }

  test("q234/q242/q245: top-k is a sort-limit (TakeOrderedAndProject), never a global Window over the dimension") {
    for (q <- Seq("q234_skew_audit", "q242_trending_items",
        "q245_trending_store")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost the sort-limit:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
  }

  test("q239/q246: FK audit stays four equi left joins (single-pass form); the next-item rank is WindowGroupLimit pre-pruned") {
    // every FK edge is ONE equi LEFT join + ONE aggregate over a
    // single child scan — all four joins must stay hash/merge
    // equi-joins, and nothing may nest or go cartesian
    val f = plan("q239_fk_audit")
    assert(!f.contains("CartesianProduct"), s"q239 went cartesian:\n$f")
    assert(!f.contains("BroadcastNestedLoopJoin"),
      s"q239 grew a nested loop:\n$f")
    // count TREE lines ("BroadcastHashJoin LeftOuter BuildRight (n)")
    // — the numbered detail section omits the join type
    val equiLeft =
      """(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) LeftOuter"""
        .r.findAllIn(f).size
    assert(equiLeft === 4, s"q239 expected 4 equi left joins, got $equiLeft:\n$f")
    val n = plan("q246_next_item")
    assert(n.contains("WindowGroupLimit"), s"q246 lost the prune:\n$n")
    assert(!n.contains("CartesianProduct"))
  }

  test("q231: as-of is ONE key shuffle — union-window, no range join, no nested loop") {
    val p = plan("q231_asof_join")
    assert(!p.contains("CartesianProduct"), s"q231 went cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q231 planned a nested-loop range join:\n$p")
    // hashpartitioning on the key appears for the union-window and the
    // quote dedupe — but NO join operator at all
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"q231 should be join-free (union-window):\n$p")
  }

  test("q264/q265: dictionary reads — pushed prefix/variant filters on the WRITTEN stores, no corpus scan, no O(V) levenshtein") {
    // autocomplete: the StartsWith predicate reaches the dictionary
    // scan (token-sorted parquet → row-group pruning) and the top-k
    // is a sort-limit
    val p = plan("q264_prefix_search")
    assert(p.contains("graft_vocab_"), s"q264 not store-backed:\n$p")
    assert(p.contains("StringStartsWith(token,s)"),
      s"q264 prefix not pushed to the dictionary scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q264 lost the sort-limit:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q264 rescans the corpus for a dictionary read:\n$p")
    // fuzzy lookup: the |q|+1 variant probes are a pushed In filter
    // on the bucketed neighborhood store; levenshtein appears only
    // ABOVE that filter (the candidate verify), and the dictionary /
    // corpus are never scanned
    val f = plan("q265_fuzzy_term")
    assert(f.contains("graft_delneigh_"), s"q265 not store-backed:\n$f")
    assert(f.contains("In(variant"),
      s"q265 variant probes not pushed to the neighborhood scan:\n$f")
    assert(f.contains("TakeOrderedAndProject"),
      s"q265 lost the sort-limit:\n$f")
    assert(!f.contains("documents.parquet") && !f.contains("graft_vocab_"),
      s"q265 reads outside the neighborhood store:\n$f")
  }

  test("q266/q267: trigram infix and corrected-search compose stores only — pushed gram probes, no corpus scan, no O(V) scans") {
    // infix: the batch's grams are ONE pushed In filter on the
    // bucketed trigram store; candidates verify and rank per query
    // (WindowGroupLimit pre-prunes the per-q top-k)
    val p = plan("q266_infix_search")
    assert(p.contains("graft_tgram_"), s"q266 not store-backed:\n$p")
    assert(p.contains("In(gram"),
      s"q266 gram probes not pushed to the trigram scan:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"q266 per-query rank not pre-pruned:\n$p")
    assert(!p.contains("documents.parquet") && !p.contains("graft_vocab_"),
      s"q266 reads outside the trigram store:\n$p")
    assert(!p.contains("CartesianProduct"), s"q266 went cartesian:\n$p")
    // corrected search: the corpus appears nowhere (the delneigh and
    // cidx scans plan as pinned ExistingRDDs — their store-backed
    // shapes are pinned by the q265/q203 tests; norms rides unpinned
    // and stays visible), and the final rank is a sort-limit
    val c = plan("q267_corrected_search")
    assert(c.contains("graft_norms_"), s"q267 norms not store-backed:\n$c")
    assert(!c.contains("documents.parquet") && !c.contains(".parquet]"),
      s"q267 rescans a corpus parquet:\n$c")
    assert(c.contains("TakeOrderedAndProject"),
      s"q267 lost the sort-limit:\n$c")
  }

  test("q269: facets read the index + metadata stores — hits broadcast, corpus text nowhere") {
    val p = plan("q269_faceted_search")
    assert(p.contains("graft_cidx") && p.contains("graft_docmeta_"),
      s"q269 must read the index + metadata stores:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q269 rescans the corpus for a facet read:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q269 hit set should broadcast into the metadata store:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q269 grew a shuffle/cartesian join:\n$p")
  }

  test("q268: the batched correction pushes its variant probes as ONE In filter on the neighborhood store") {
    // asserted on the correction subplan directly — inside q268 the
    // terms frame is pinned (ExistingRDD) and would hide the scan
    val p = graft.ops.TextAnalysis.correctTerms(
        Stores.deletions(spark, dir), "hash joi windo")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("graft_delneigh_"), s"correction not store-backed:\n$p")
    assert(p.contains("In(variant"),
      s"correction variant probes not pushed — O(V) store scan:\n$p")
    assert(!p.contains("documents.parquet"), s"correction rescans corpus:\n$p")
  }

  test("q270: the facet filter is DIRECTORY pruning on the partitioned facet index; no corpus scan") {
    val p = plan("q270_filtered_search")
    assert(p.contains("graft_facets_"), s"q270 not facet-store-backed:\n$p")
    // PartitionFilters carry attribute ids (facet#NNN = lang)
    assert(p.contains("PartitionFilters") && p.contains(" = lang)")
        && p.contains(" = en)") && p.contains("facet=lang/value=en"),
      s"q270 facet restriction must prune partitions, not filter rows:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q270 rescans the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q270 lost the sort-limit:\n$p")
    // the allowed list is NOT cap-bounded: both restriction joins must
    // broadcast (allowed ⋉ broadcast(hit ids), then hits ⋉
    // broadcast(survivors)) — never a shuffle over the doc dimension
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q270 shuffled the facet-value doc list:\n$p")
  }

  test("q273/q274/q275/q277: new serving reads rank via TakeOrderedAndProject — no single-partition candidate funnel") {
    for (q <- Seq("q273_more_like_this", "q274_rerank_cosine",
        "q275_collapse_search", "q277_asof_search")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost the sort-limit:\n$p")
      assert(!p.contains("Exchange SinglePartition"),
        s"$q funnels candidates through one task:\n$p")
    }
  }

  test("q273: the seed fetch is ONE pushed doc_id predicate; term scoring probes the dictionary store") {
    // the k-term read PINS its terms frame (localCheckpoint), so the
    // outer q273 plan shows the subtree as Scan ExistingRDD — the
    // seed-derivation shape is pinned on the exposed terms frame
    val p = graft.ops.TextAnalysis.moreLikeThisTerms(
        Stores.vocab(spark, dir), Tables.documents(spark, dir),
        "doc_id", "text", docId = 0L, m = 3)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("EqualTo(doc_id,0)"),
      s"q273 seed fetch must push its id predicate:\n$p")
    assert(p.contains("graft_vocab_"),
      s"q273 must probe the dictionary store, not recompute df:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"q273 must broadcast the doc-bounded seed frame:\n$p")
  }

  test("q274: candidates broadcast into the embedding scan — the vector table never shuffles, never cross-joins corpus-wide") {
    val p = plan("q274_rerank_cosine")
    assert(p.contains("BroadcastHashJoin"),
      s"q274 must broadcast the top-N candidate list:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q274 shuffled or crossed the embeddings table:\n$p")
  }

  test("q275: collapse reads the WRITTEN dup map; the membership probe broadcasts; corpus text nowhere") {
    val p = plan("q275_collapse_search")
    assert(p.contains("graft_dupmap_"),
      s"q275 not dup-store-backed:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q275 rescans the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q275 shuffled the dup map against the cap-bounded hits:\n$p")
  }

  test("q276: every family audit broadcasts the forget set — one scan per store, no shuffle joins, corpus nowhere") {
    val p = plan("q276_forget_audit")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q276 shuffled a store against the request-bounded forget set:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q276 must audit the WRITTEN stores, not the corpus:\n$p")
    assert(p.contains("graft_pqcodes_") && p.contains("graft_dupmap_")
        && p.contains("graft_facets_") && p.contains("graft_docmeta_"),
      s"q276 must scan each family's written store:\n$p")
  }

  test("q278: the expansion probe pushes its seed disjunction onto the collocation store; the read ranks TakeOrdered") {
    // the k-term read pins its terms frame, so the probe shape is
    // asserted on the exposed expansion frame
    val pt = graft.ops.TextAnalysis.expandTerms(
        Stores.collocations(spark, dir), "hash", e = 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(pt.contains("graft_colloc_"),
      s"q278 must probe the written collocation store:\n$pt")
    assert(pt.contains("Or(EqualTo(w1,hash),EqualTo(w2,hash))"),
      s"q278 seed probe must push its disjunction:\n$pt")
    val p = plan("q278_expansion_search")
    assert(p.contains("TakeOrderedAndProject")
        && !p.contains("Exchange SinglePartition"),
      s"q278 lost the scale-safe rank:\n$p")
  }

  test("q279: the erasure fetch is a broadcast semi-join on the corpus scan; the read ranks TakeOrdered") {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    // the tombstone derivation (pinned inside q279) must broadcast the
    // request-bounded forget set into the corpus scan
    val forget = Stores.norms(spark, dir)
      .filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    val pt = Tables.documents(spark, dir)
      .join(broadcast(forget), Seq("doc_id"), "left_semi")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(pt.contains("BroadcastHashJoin") && pt.contains("LeftSemi")
        && !pt.contains("SortMergeJoin"),
      s"q279 shuffled the corpus against a request-bounded id list:\n$pt")
    val p = plan("q279_forget_search")
    assert(p.contains("TakeOrderedAndProject")
        && !p.contains("Exchange SinglePartition"),
      s"q279 lost the scale-safe rank:\n$p")
  }

  test("q281/q282: negative-term and passage reads rank TakeOrdered; the negative probe is a pushed token filter on the store") {
    import org.apache.spark.sql.functions.col
    for (q <- Seq("q281_negative_search", "q282_passage_search")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject")
          && !p.contains("Exchange SinglePartition"),
        s"$q lost the scale-safe rank:\n$p")
      assert(!p.contains("documents.parquet"),
        s"$q rescans the corpus instead of its store:\n$p")
    }
    val pn = Stores.index(spark, dir)
      .filter(col("token") === "window")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(pn.contains("graft_idx_") && pn.contains("EqualTo(token,window)"),
      s"q281's negative-term probe must push onto the store scan:\n$pn")
  }

  test("q283: context fetch broadcasts the ranked hits into the chunk-text store — no shuffle, corpus nowhere") {
    val p = plan("q283_rag_context")
    assert(p.contains("graft_chunks_"),
      s"q283 must fetch text from the written chunk table:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"q283 shuffled the chunk table against a 5-row hit list:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q283 rescans the corpus:\n$p")
  }

  test("q284: the batch rank is a qid-PARTITIONED window with WindowGroupLimit pre-prune — never a global funnel") {
    val p = plan("q284_search_batch")
    assert(p.contains("WindowGroupLimit"),
      s"q284's per-query rank must pre-prune below the shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q284 funnels the batch through one task:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q284 shuffled the broadcast-sized query frame:\n$p")
  }

  test("q285: drift reads both sides off the written slice store — pushed gen filter, TakeOrdered rank, corpus nowhere") {
    val p = plan("q285_df_drift")
    assert(p.contains("graft_idx_"),
      s"q285 must read the written slice store:\n$p")
    assert(p.contains("LessThanOrEqual(slice,2)"),
      s"q285's as-of side must push its generation filter:\n$p")
    assert(p.contains("TakeOrderedAndProject")
        && !p.contains("Exchange SinglePartition"),
      s"q285 lost the scale-safe rank:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q285 rescans the corpus:\n$p")
  }

  test("q277: the as-of generation filter is PUSHED into the index-store scan") {
    // the as-of merge is pinned inside q277 (two consumers), so the
    // pushed filter is asserted on the store-read frame the query
    // builds from
    import org.apache.spark.sql.functions.col
    val p = Stores.index(spark, dir).filter(col("slice") <= 2L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("graft_idx_"),
      s"q277 must read the written slice store:\n$p")
    assert(p.contains("LessThanOrEqual(slice,2)"),
      s"q277 as-of filter must reach the store scan:\n$p")
    // and the full read never touches the corpus (everything serves
    // from stores; the pinned subtrees contain only store scans)
    val full = plan("q277_asof_search")
    assert(!full.contains("documents.parquet"),
      s"q277 rescans the corpus instead of the store history:\n$full")
  }

  test("q286: the positional erasure is a broadcast anti-join on the store — NO corpus scan (ids ride the request), scale-safe rank") {
    import org.apache.spark.sql.functions.col
    // the delete shape on the raw store frame (the read pins its
    // merged view, which hides the scan behind an ExistingRDD)
    val ids = Stores.norms(spark, dir)
      .filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    val pd = graft.ops.TextAnalysis.positionalApplyTombstones(
        Stores.positional(spark, dir), ids)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(pd.contains("graft_pidx_"),
      s"q286 must read the written positional store:\n$pd")
    assert(pd.contains("LeftAnti") && pd.contains("BroadcastHashJoin"),
      s"q286's delete must be a broadcast anti-join:\n$pd")
    assert(!pd.contains("documents.parquet"),
      s"q286's id-addressed delete must not touch the corpus:\n$pd")
    val p = plan("q286_forget_phrase")
    assert(p.contains("TakeOrderedAndProject")
        && !p.contains("Exchange SinglePartition"),
      s"q286 lost the scale-safe rank:\n$p")
    // r22: the erasure runs ONCE at the materialized-merge build
    // (erasedPositionalMerged), so the SERVING plan carries no
    // anti-join at all and never touches the corpus. The doc_id join
    // between the two term sides may plan as SMJ statically (the
    // pinned df-scale sides carry no stats; a common term's postings
    // must not be forced broadcast at 100 TB — AQE picks at runtime);
    // the scale pins are corpus-freedom and no single-partition work.
    assert(!p.contains("LeftAnti"),
      s"q286's serving read re-runs the erasure instead of the merge:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q286's serving read must not touch the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), s"q286 cartesian:\n$p")
  }

  test("q287/q289: tombstone-merged reads rank scale-safe; the chunk family serves from its written slice store") {
    // the chunk family's store scan (the read pins the merged view)
    val sc = Stores.chunkSlices(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(sc.contains("graft_chsl_"),
      s"the chunk slice store must be a written table:\n$sc")
    val p = plan("q287_forget_passage")
    assert(p.contains("TakeOrderedAndProject")
        && !p.contains("Exchange SinglePartition"),
      s"q287 lost the scale-safe rank:\n$p")
    val c = plan("q289_forget_collapse")
    assert(c.contains("graft_dupmap_"),
      s"q289 must read the written dup map:\n$c")
    assert(c.contains("TakeOrderedAndProject")
        && !c.contains("Exchange SinglePartition"),
      s"q289 lost the scale-safe rank:\n$c")
  }

  test("q290: the erased ANN read scans the code store; embeddings touched only for the surviving query vectors; the erasure is a broadcast anti-join") {
    val p = plan("q290_forget_ann")
    assert(p.contains("graft_pqcodes_"),
      s"q290 must read the written code store:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q290 must not touch the corpus:\n$p")
    assert(p.contains("In(vec_id"),
      s"q290's query-vector fetch must push its id list:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q290 shuffled against the request-bounded forget set:\n$p")
  }

  test("q291: the whole-warehouse erasure record reads every family's WRITTEN store; the corpus appears only as the tombstone text fetch") {
    val p = plan("q291_forget_execute")
    // r22: the tombstone-merged families count off their MATERIALIZED
    // post-forget merge stores (built once per process — graft_fidxm_/
    // fpidxm_/fchm_, replacing a per-query re-fold of graft_idx_/
    // pidx_/chsl_); the row-erased request-scale families still read
    // their direct stores through inline broadcast anti-joins
    for (store <- Seq("graft_fidxm_", "graft_fpidxm_", "graft_fchm_",
        "graft_norms_", "graft_docmeta_", "graft_facets_",
        "graft_pqcodes_", "graft_dupmap_"))
      assert(p.contains(store),
        s"q291 must count family $store off its written store:\n$p")
    assert(!p.contains("CartesianProduct"), s"q291 cartesian:\n$p")
  }

  test("q294: snippets broadcast the ranked hits into ONE documents join — the corpus never shuffles against the k-row hit list") {
    val p = plan("q294_term_snippets")
    assert(p.contains("documents.parquet"),
      s"q294's text fetch reads the corpus point-wise:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q294 must broadcast its <= k hits into the text fetch:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q294 shuffled the corpus against a k-row hit list:\n$p")
  }

  test("q296: the new slice probes the WRITTEN band store with a pushed as-of filter — the corpus is never re-shingled store-side") {
    import org.apache.spark.sql.functions.col
    // the store-side shape on the raw frame (the read pins its two
    // consumers): pushed generation predicate on the bucketed table
    val ps = Stores.bands(spark, dir).filter(col("slice") <= 2L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(ps.contains("graft_bands_"),
      s"q296 must read the written band store:\n$ps")
    assert(ps.contains("LessThanOrEqual(slice,2)"),
      s"q296's as-of filter must reach the band-store scan:\n$ps")
    val p = plan("q296_neardup_ingest")
    assert(!p.contains("CartesianProduct"), s"q296 cartesian:\n$p")
    // exactly one corpus scan — the new slice's own band derivation;
    // the standing corpus's shingle pipeline never re-runs
    val scans = p.sliding("documents.parquet".length)
      .count(_ == "documents.parquet")
    assert(scans <= 1, s"q296 re-shingles the corpus ($scans scans):\n$p")
  }

  test("q295: the batched passage rank is qid-partitioned (WindowGroupLimit); the read never touches the corpus") {
    val p = plan("q295_passage_batch")
    assert(p.contains("WindowGroupLimit"),
      s"q295's per-query rank must pre-prune below the shuffle:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q295 funnels the batch through one task:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q295 rescans the corpus instead of the chunk store:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"q295 shuffled the broadcast-sized query frame:\n$p")
  }

  test("q22/q248: the pair list and the component frame come off their WRITTEN stores — no per-query band self-join or component walk") {
    val p22 = plan("q22_lsh_candidates")
    assert(p22.contains("graft_lshpairs_"),
      s"q22 not pair-store-backed:\n$p22")
    assert(!p22.contains("graft_bands_") && !p22.contains("Join"),
      s"q22 re-pairs the band buckets per query:\n$p22")
    val p248 = plan("q248_dup_cluster_sizes")
    assert(p248.contains("graft_dupmap_"),
      s"q248 not dup-map-backed:\n$p248")
    assert(!p248.contains("graft_lshpairs_") && !p248.contains("graft_bands_"),
      s"q248 re-walks components from the edge list per query:\n$p248")
  }

  test("q249/q250: the split positional slices come off the WRITTEN store (no per-query corpus split/posexplode)") {
    // the phrase/proximity reads pin their pindex (localCheckpoint), so
    // the serving plans show Scan ExistingRDD either way — assert on
    // the frame that feeds the pin: the merge over the store
    import org.apache.spark.sql.functions.col
    val merged = graft.ops.TextAnalysis.positionalMergeSlices(
      Stores.splitPositional(spark, dir))
    val p = merged.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("graft_spidx_"),
      s"q249/q250 pindex not split-store-backed:\n$p")
    assert(!p.contains("documents.parquet") && !p.contains("posexplode"),
      s"q249/q250 re-derive the positional slices per read:\n$p")
    // the token-bucketed layout satisfies the (token, doc_id) merge
    // clustering — the fold over the store is zero-Exchange
    assert(!p.contains("Exchange"),
      s"the split-store merge should reuse the bucket partitioning:\n$p")
    // the compaction read keeps its generation filters over the same
    // store (q250's fold input is the store, not a corpus re-split)
    val gen0 = graft.ops.TextAnalysis.positionalCompact(
      Stores.splitPositional(spark, dir).filter(col("slice") < 2),
      newSlice = 100L)
    val g = gen0.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(g.contains("graft_spidx_") && !g.contains("posexplode"),
      s"q250's compaction input not split-store-backed:\n$g")
  }

  test("q24/q160: the exact-similarity pair joins read the WRITTEN mask table — no per-query tokenize/dictionary pass") {
    val p24 = plan("q24_ngram_jaccard")
    assert(p24.contains("graft_wmask_"),
      s"q24 not mask-store-backed:\n$p24")
    assert(!p24.contains("documents.parquet"),
      s"q24 re-derives the masks from the corpus per query:\n$p24")
    val p160 = plan("q160_containment")
    assert(p160.contains("graft_wmask_"),
      s"q160 not mask-store-backed:\n$p160")
    assert(!p160.contains("documents.parquet"),
      s"q160 re-derives the masks from the corpus per query:\n$p160")
  }

  test("q118: the gate reads the WRITTEN frozen cuts — no per-query ntile recalibration; the corpus scans once") {
    val p = plan("q118_frozen_gate")
    assert(p.contains("graft_fcuts_"),
      s"q118 not cut-store-backed:\n$p")
    val scans = p.sliding("documents.parquet".length)
      .count(_ == "documents.parquet")
    assert(scans <= 1,
      s"q118 rescans the corpus for calibration ($scans scans):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q118's dimension-sized cuts must broadcast:\n$p")
  }

  test("q156/q176: near-dup and assembly read the written pHash/decode stores — no per-query binary decode pass") {
    val p156 = plan("q156_image_neardup")
    assert(p156.contains("graft_imgph_"),
      s"q156 not phash-store-backed:\n$p156")
    assert(!p156.contains("DeserializeToObject"),
      s"q156 re-decodes images per query:\n$p156")
    val p176 = plan("q176_multimodal_assembly")
    assert(p176.contains("graft_imgdec_") && p176.contains("graft_auddec_"),
      s"q176 not decode-store-backed:\n$p176")
    assert(!p176.contains("DeserializeToObject"),
      s"q176 re-runs the decode passes per query:\n$p176")
  }
}
