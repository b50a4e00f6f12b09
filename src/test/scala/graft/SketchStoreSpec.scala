package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TypedAggs
import graft.ops.SketchStore

/** The sketch warehouse contract: per-slice states persist as a
  * bucketed table, a new slice merges in without re-scanning history,
  * and the merged state answers EXACTLY like a full rescan (both sketch
  * states are pure functions of the input multiset).
  */
class SketchStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 40 values over 2 groups × 3 slices, enough distinct values per
  // group to push KMV k=4 past capacity
  private def rows = (0 until 40).map { i =>
    (if (i % 2 == 0) "a" else "b", (i % 3).toLong, s"v$i")
  }.toDF("g", "slice", "v")

  test("KMV: store-merge ≡ full-rescan (state and estimate), layout-independent") {
    val k = 4
    val slices = SketchStore.kmvSlices(rows, Seq("g"), "slice", col("v"), k)
    assert(slices.count() === 6) // 2 groups × 3 slices
    val merged = SketchStore.kmvMergeSlices(slices, Seq("g"), k)
      .select(col("g"), col("n_slices"), col("hs"),
        SketchStore.kmvEstimate(col("hs"), k).as("est"))
      .as[(String, Long, Seq[Long], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val direct = rows.groupBy(col("g"))
      .agg(TypedAggs.kmvHashes(col("v"), k).as("hs"),
        TypedAggs.kmvDistinct(col("v"), k).as("est"))
      .as[(String, Seq[Long], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (g <- Seq("a", "b")) {
      assert(merged(g)._1 === 3L)                 // n_slices
      assert(merged(g)._2 === direct(g)._1)       // identical state
      assert(merged(g)._3 === direct(g)._2)       // identical estimate
      assert(merged(g)._2.length === k)           // past capacity
    }
    // merge order/layout cannot matter (the warehouse property)
    val reMerged = SketchStore.kmvMergeSlices(slices.repartition(7), Seq("g"), k)
      .select(col("g"), col("hs")).as[(String, Seq[Long])].collect().toMap
    assert(reMerged === merged.view.mapValues(_._2).toMap)
    // COMPACTION: the merged output carries its own capacity witness
    // (r14 self-review), so a compacted store re-merges under the same
    // loud contract and still equals the direct aggregation
    val compacted = SketchStore.kmvMergeSlices(
        SketchStore.kmvMergeSlices(slices, Seq("g"), k), Seq("g"), k)
      .select(col("g"), col("hs")).as[(String, Seq[Long])].collect().toMap
    assert(compacted === direct.view.mapValues(_._1).toMap)
  }

  test("KMV: persisted bucketed store — zero-Exchange merge, new slice folds in exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft-sketch-store-")
    try {
      val k = 4
      val history = rows.filter(col("slice") < 2)
      val newSlice = rows.filter(col("slice") === 2)
      SketchStore.writeStore(
        SketchStore.kmvSlices(history, Seq("g"), "slice", col("v"), k),
        "graft_sketch_store", Seq("g"), buckets = 4,
        path = Some(base.resolve("kmv").toString))
      val store = spark.table("graft_sketch_store")
      // store-only merge aggregates bucket-local: NO Exchange anywhere
      val storeMerge = SketchStore.kmvMergeSlices(store, Seq("g"), k)
      storeMerge.collect()
      val exchanges = storeMerge.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed store merge must not shuffle:\n${storeMerge.queryExecution.executedPlan}")
      // incremental: store rows ∪ the new day's slice rows ≡ full rescan
      // — history's corpus is never touched again
      val increment = SketchStore.kmvMergeSlices(
          store.unionByName(
            SketchStore.kmvSlices(newSlice, Seq("g"), "slice", col("v"), k)),
          Seq("g"), k)
        .select(col("g"), col("hs")).as[(String, Seq[Long])].collect().toMap
      val full = rows.groupBy(col("g"))
        .agg(TypedAggs.kmvHashes(col("v"), k).as("hs"))
        .as[(String, Seq[Long])].collect().toMap
      assert(increment === full)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sketch_store")
    }
  }

  test("CMS: store-merge ≡ full-rescan matrix, point reads agree") {
    val d = 2; val w = 64
    val slices = SketchStore.cmsSlices(rows, Seq("g"), "slice", col("v"), d, w)
    val merged = SketchStore.cmsMergeSlices(slices, Seq("g"), d, w)
    val mergedRead = merged
      .select(col("g"), col("n_slices"),
        TypedAggs.countMinEstimate(col("sk"), lit("v6"), d, w).as("est"),
        col("sk")("counts").as("counts"))
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val direct = rows.groupBy(col("g"))
      .agg(TypedAggs.countMin(col("v"), d, w).as("sk"))
      .select(col("g"), TypedAggs.countMinEstimate(col("sk"), lit("v6"), d, w),
        col("sk")("counts"))
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (g <- Seq("a", "b")) {
      assert(mergedRead(g)._1 === 3L)
      assert(mergedRead(g)._2 === direct(g)._1)   // point estimate
      assert(mergedRead(g)._3 === direct(g)._2)   // whole matrix
    }
    // v6 lands only in group "a"; its estimate is ≥ 1 there (CMS never
    // undercounts) and its true count is 1
    assert(mergedRead("a")._2 >= 1L)
  }

  test("HLL: store-merge ≡ full-rescan registers and estimate; registers hand-checkable") {
    val slices = SketchStore.hllSlices(rows, Seq("g"), "slice", col("v"))
    val merged = SketchStore.hllMergeSlices(slices, Seq("g"))
      .select(col("g"), col("n_slices"), col("regs"),
        SketchStore.hllEstimate(col("regs")).as("est"))
      .as[(String, Long, Seq[Long], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val direct = rows.groupBy(col("g"))
      .agg(TypedAggs.hllRegisters(col("v")).as("regs"))
      .select(col("g"), col("regs"),
        SketchStore.hllEstimate(col("regs")).as("est"))
      .as[(String, Seq[Long], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (g <- Seq("a", "b")) {
      assert(merged(g)._1 === 3L)
      assert(merged(g)._2 === direct(g)._1)   // identical registers
      assert(merged(g)._3 === direct(g)._2)   // identical estimate
      assert(merged(g)._2.length === 64)
      assert(merged(g)._2.forall(r => r >= 0L && r <= 55L))
    }
    // accuracy ballpark at a cardinality where the RAW branch is
    // operative (n ≫ m: 800 distinct over 64 registers; ~13% relative
    // error at m=64, allow 3σ). The 20-distinct fixture above is
    // deliberately NOT accuracy-checked: raw HLL is biased high at
    // n ≪ m — the documented reason the ln()-based small-range
    // correction is left to consumers
    val big = (0 until 800).map(i => ("x", (i % 4).toLong, s"u$i"))
      .toDF("g", "slice", "v")
    val bigEst = SketchStore.hllMergeSlices(
        SketchStore.hllSlices(big, Seq("g"), "slice", col("v")), Seq("g"))
      .select(SketchStore.hllEstimate(col("regs")))
      .as[Double].collect()(0)
    assert(bigEst > 800.0 * 0.6 && bigEst < 800.0 * 1.4,
      s"raw HLL estimate $bigEst too far from 800")
    // register replay BY HAND for one value: the aggregator must place
    // md5-60("hll:v0") at bucket h%64 with rank 55 - bitlength(h/64)
    val h = graft.functions.Md5Long60.hash(
      "hll:v0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val j = (h % 64).toInt
    val w = h >>> 6
    val expRank = if (w == 0L) 55L
      else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    val only = Seq(("z", 0L, "v0")).toDF("g", "slice", "v")
      .groupBy(col("g")).agg(TypedAggs.hllRegisters(col("v")).as("regs"))
      .select(col("regs")).as[Seq[Long]].collect()(0)
    assert(only(j) === expRank)
    assert(only.count(_ > 0L) === 1)
  }

  test("HIST: store-merge ≡ full-rescan counters; percentile read hand-traced; bucketed merge zero-Exchange") {
    // values 0..39 over 2 groups × 3 slices; lo=0 width=4 nBins=8 →
    // state positions: 1 underflow, 2..9 the [4(i−2), 4(i−1)) bins,
    // 10 overflow (values ≥ 32)
    val vals = (0 until 40).map { i =>
      (if (i % 2 == 0) "a" else "b", (i % 3).toLong, i.toLong)
    }.toDF("g", "slice", "v")
    val slices = SketchStore.histSlices(vals, Seq("g"), "slice", col("v"),
      lo = 0L, width = 4L, nBins = 8)
    val merged = SketchStore.histMergeSlices(slices, Seq("g"),
      lo = 0L, width = 4L, nBins = 8)
    val state = merged.select(col("g"), col("cs"))
      .as[(String, Seq[Long])].collect().toMap
    // group a = evens 0..38: bins [0,4) hold {0,2}, … [28,32) {28,30},
    // overflow {32..38} = 4 values — replayed by hand
    assert(state("a") === Seq(0L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 4L))
    assert(state("b") === Seq(0L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 4L))
    // merge ≡ one-shot aggregation over everything, any layout
    val direct = vals.groupBy(col("g"))
      .agg(TypedAggs.histCounts(col("v"), 0L, 4L, 8).as("cs"))
      .as[(String, Seq[Long])].collect().toMap
    assert(state === direct)
    val reMerged = SketchStore.histMergeSlices(slices.repartition(7),
        Seq("g"), lo = 0L, width = 4L, nBins = 8)
      .select(col("g"), col("cs")).as[(String, Seq[Long])].collect().toMap
    assert(reMerged === state)
    // compaction: merged output keeps its geometry witness and
    // re-merges (the KMV rule)
    val compacted = SketchStore.histMergeSlices(
        SketchStore.histMergeSlices(slices, Seq("g"), 0L, 4L, 8),
        Seq("g"), 0L, 4L, 8)
      .select(col("g"), col("cs")).as[(String, Seq[Long])].collect().toMap
    assert(compacted === state)
    // percentile read BY HAND on group a (20 values, evens 0..38):
    // rank(0.5) = 10 → 10th even = 18, its bin [16,20) → bound 16;
    // rank(0.9) = 18 → 34 lives in overflow → bound 8·4 = 32;
    // rank(0.05) = 1 → 0 → bound 0
    val reads = merged.filter(col("g") === "a").select(
      SketchStore.histPercentileBound(col("cs"), 0.5, 0L, 4L),
      SketchStore.histPercentileBound(col("cs"), 0.9, 0L, 4L),
      SketchStore.histPercentileBound(col("cs"), 0.05, 0L, 4L))
      .as[(Long, Long, Long)].collect()(0)
    assert(reads === ((16L, 32L, 0L)))
    // empty state reads null (no rank to bracket)
    val empty = Seq(Tuple1(Seq.fill(10)(0L))).toDF("cs")
      .select(SketchStore.histPercentileBound(col("cs"), 0.5, 0L, 4L))
      .collect()(0)
    assert(empty.isNullAt(0))
    // the persisted bucketed store merges with ZERO Exchange (the
    // KMV/CMS warehouse property, third sketch type)
    val base = java.nio.file.Files.createTempDirectory("graft-hist-store-")
    try {
      SketchStore.writeStore(slices, "graft_hist_store", Seq("g"),
        buckets = 4, path = Some(base.resolve("hist").toString))
      val storeMerge = SketchStore.histMergeSlices(
        spark.table("graft_hist_store"), Seq("g"), 0L, 4L, 8)
      storeMerge.collect()
      val exchanges = storeMerge.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed hist-store merge must not shuffle:\n${storeMerge.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_hist_store")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("HLL small-range correction: linear counting fires at small n, raw path untouched at large n") {
    def est(n: Int) = (0 until n).map(i => ("g", s"v$i")).toDF("g", "v")
      .groupBy(col("g")).agg(TypedAggs.hllRegisters(col("v")).as("regs"))
      .select(SketchStore.hllEstimate(col("regs")).as("raw"),
        SketchStore.hllEstimateCorrected(col("regs")).as("corr"))
      .as[(Double, Double)].collect()(0)
    // n = 20 ≪ m: raw is biased high (the documented q158 gap); the
    // corrected reading takes m·ln(m/V) and lands near the truth
    val (rawS, corrS) = est(20)
    assert(corrS !== rawS, "correction branch did not fire")
    assert(math.abs(corrS - 20.0) <= 4.0,
      s"linear counting should be near 20, got $corrS (raw $rawS)")
    assert(math.abs(corrS - 20.0) < math.abs(rawS - 20.0))
    // n = 800 ≫ 2.5m: the raw branch is operative and UNCHANGED
    val (rawL, corrL) = est(800)
    assert(corrL === rawL)
  }

  test("HIST: malformed stored states fail loudly (length, geometry, missing witness)") {
    // wrong counter count: vector-add would silently misalign
    val badLen = Seq(("a", Seq(1L, 2L, 3L), 0L, 4L)).toDF("g", "cs", "h_lo", "h_width")
    val e1 = intercept[Exception] {
      SketchStore.histMergeSlices(badLen, Seq("g"), 0L, 4L, nBins = 8).collect()
    }
    assert(e1.getMessage.contains("counters") ||
      e1.getCause != null && e1.getCause.getMessage.contains("counters"))
    // mismatched bin geometry: same length, different lo/width — only
    // the persisted witness can catch it (the KMV k rule)
    val badGeo = Seq(("a", Seq.fill(10)(1L), 0L, 8L)).toDF("g", "cs", "h_lo", "h_width")
    val e2 = intercept[Exception] {
      SketchStore.histMergeSlices(badGeo, Seq("g"), 0L, 4L, nBins = 8).collect()
    }
    assert(e2.getMessage.contains("bin geometry") ||
      e2.getCause != null && e2.getCause.getMessage.contains("bin geometry"))
    // a store without the witness columns is malformed, plan-time loud
    val noGeo = Seq(("a", Seq.fill(10)(1L))).toDF("g", "cs")
    val e3 = intercept[IllegalArgumentException] {
      SketchStore.histMergeSlices(noGeo, Seq("g"), 0L, 4L, nBins = 8)
    }
    assert(e3.getMessage.contains("h_lo"))
  }

  test("malformed stored states fail loudly") {
    // unsorted KMV state: silently accepting it would break the merge
    // invariant and skew every later estimate
    val badKmv = Seq(("a", Seq(5L, 3L), 4)).toDF("g", "hs", "k")
    val e1 = intercept[Exception] {
      SketchStore.kmvMergeSlices(badKmv, Seq("g"), k = 4).collect()
    }
    assert(e1.getMessage.contains("ascending") ||
      e1.getCause != null && e1.getCause.getMessage.contains("ascending"))
    // capacity mismatch (r13 ADVICE): a bottom-2 store merged at k=4
    // passes the length check yet is NOT the union's bottom-4 — the
    // persisted k is the only witness, so the merge must fail loudly
    val smallK = Seq(("a", Seq(3L, 5L), 2)).toDF("g", "hs", "k")
    val eK = intercept[Exception] {
      SketchStore.kmvMergeSlices(smallK, Seq("g"), k = 4).collect()
    }
    assert(eK.getMessage.contains("does not match merge k") ||
      eK.getCause != null &&
        eK.getCause.getMessage.contains("does not match merge k"))
    // a store without the k column at all is malformed, plan-time loud
    val noK = Seq(("a", Seq(3L, 5L))).toDF("g", "hs")
    val eNoK = intercept[IllegalArgumentException] {
      SketchStore.kmvMergeSlices(noK, Seq("g"), k = 4)
    }
    assert(eNoK.getMessage.contains("k"))
    // wrong-dimension CMS state: vector-add would silently misalign
    val badCms = Seq(("a", Seq(1L, 2L, 3L))).toDF("g", "counts")
    val e2 = intercept[Exception] {
      SketchStore.cmsMergeSlices(badCms, Seq("g"), depth = 2, width = 64).collect()
    }
    assert(e2.getMessage.contains("counters") ||
      e2.getCause != null && e2.getCause.getMessage.contains("counters"))
    // HLL: wrong register count, and rank outside [0, 55]
    val badHllLen = Seq(("a", Seq(1L, 2L))).toDF("g", "regs")
    val e3 = intercept[Exception] {
      SketchStore.hllMergeSlices(badHllLen, Seq("g")).collect()
    }
    assert(e3.getMessage.contains("registers") ||
      e3.getCause != null && e3.getCause.getMessage.contains("registers"))
    val badHllRank = Seq(("a", Seq.fill(63)(0L) :+ 56L)).toDF("g", "regs")
    val e4 = intercept[Exception] {
      SketchStore.hllMergeSlices(badHllRank, Seq("g")).collect()
    }
    assert(e4.getMessage.contains("outside") ||
      e4.getCause != null && e4.getCause.getMessage.contains("outside"))
    // hllEstimate's constants are the b=6 values: any other register
    // width raises instead of silently mis-estimating (r13 self-review)
    val e5 = intercept[Exception] {
      Seq(Seq.fill(128)(1L)).toDF("regs")
        .select(SketchStore.hllEstimate(col("regs"))).collect()
    }
    assert(e5.getMessage.contains("64 registers"))
  }

  test("BLOOM: store-merge ≡ full-rescan bit vector; members always hit; probes deterministic") {
    val m = 256
    val slices = SketchStore.bloomSlices(rows, Seq("g"), "slice", col("v"),
      mBits = m)
    assert(slices.count() === 6) // 2 groups × 3 slices
    val merged = SketchStore.bloomMergeSlices(slices, Seq("g"), mBits = m)
    val mergedMap = merged.select(col("g"), col("n_slices"), col("bits"))
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // OR is order-independent: the merged vector must equal the
    // one-shot vector over the un-sliced corpus, word for word
    val direct = rows.groupBy(col("g"))
      .agg(TypedAggs.bloomBits(col("v"), m).as("bits"))
      .as[(String, Seq[Long])].collect().toMap
    assert(mergedMap.keySet === Set("a", "b"))
    for ((g, (n, bits)) <- mergedMap) {
      assert(n === 3L)
      assert(bits === direct(g), s"group $g merged vector != rescan")
    }
    // merged state keeps its witnesses (compaction contract)
    assert(merged.columns.contains("m_bits") &&
      merged.columns.contains("k_hashes"))
    // membership: every member hits (no false negatives — the Bloom
    // contract), and a layout change cannot alter any probe's answer
    val probed = rows.select(col("g"), col("v")).distinct()
      .join(merged.select(col("g"), col("bits")), "g")
      .select(SketchStore.bloomContains(col("bits"), col("v"), m).as("hit"))
      .as[Boolean].collect()
    assert(probed.length === 40 && probed.forall(identity))
    val probedRepart = rows.repartition(7).select(col("g"), col("v")).distinct()
      .join(merged.select(col("g"), col("bits")), "g")
      .select(SketchStore.bloomContains(col("bits"), col("v"), m).as("hit"))
      .as[Boolean].collect()
    assert(probedRepart.forall(identity))
  }

  test("BLOOM: malformed stored states fail loudly (width, geometry, missing witness)") {
    // wrong word count: an OR across widths would silently misalign
    val badLen = Seq(("a", Seq(1L, 2L), 256, 3)).toDF("g", "bits", "m_bits", "k_hashes")
    val e1 = intercept[Exception] {
      SketchStore.bloomMergeSlices(badLen, Seq("g"), mBits = 256).collect()
    }
    assert(e1.getMessage.contains("words") ||
      e1.getCause != null && e1.getCause.getMessage.contains("words"))
    // same length, different declared geometry — only the witness
    // can catch it; k mismatch risks FALSE NEGATIVES on read
    val badGeo = Seq(("a", Seq.fill(4)(0L), 256, 2)).toDF("g", "bits", "m_bits", "k_hashes")
    val e2 = intercept[Exception] {
      SketchStore.bloomMergeSlices(badGeo, Seq("g"), mBits = 256).collect()
    }
    assert(e2.getMessage.contains("geometry") ||
      e2.getCause != null && e2.getCause.getMessage.contains("geometry"))
    // NULL witness raises (the kmv/hist rule from birth)
    val nullW = Seq(("a", Seq.fill(4)(0L), Option.empty[Int], Some(3)))
      .toDF("g", "bits", "m_bits", "k_hashes")
    val e3 = intercept[Exception] {
      SketchStore.bloomMergeSlices(nullW, Seq("g"), mBits = 256).collect()
    }
    assert(e3.getMessage.contains("NULL") ||
      e3.getCause != null && e3.getCause.getMessage.contains("NULL"))
    // missing witness columns: plan-time loud
    val noW = Seq(("a", Seq.fill(4)(0L))).toDF("g", "bits")
    val e4 = intercept[IllegalArgumentException] {
      SketchStore.bloomMergeSlices(noW, Seq("g"), mBits = 256)
    }
    assert(e4.getMessage.contains("m_bits"))
  }

  test("NULL witness values raise like mismatched ones (r14 ADVICE)") {
    // min/max SKIP nulls: a store row with k = NULL would merge its
    // hashes while the witness comparison stays non-null and passes —
    // and an ALL-null group nulls the comparison itself, falling
    // through to the merge branch. Both must raise.
    val nullK = Seq(("a", Seq(3L, 5L), Some(4)), ("a", Seq(2L, 7L), None))
      .toDF("g", "hs", "k")
    val e1 = intercept[Exception] {
      SketchStore.kmvMergeSlices(nullK, Seq("g"), k = 4).collect()
    }
    assert(e1.getMessage.contains("NULL k") ||
      e1.getCause != null && e1.getCause.getMessage.contains("NULL k"))
    val allNullK = Seq(("a", Seq(3L, 5L), Option.empty[Int]))
      .toDF("g", "hs", "k")
    val e2 = intercept[Exception] {
      SketchStore.kmvMergeSlices(allNullK, Seq("g"), k = 4).collect()
    }
    assert(e2.getMessage.contains("NULL k") ||
      e2.getCause != null && e2.getCause.getMessage.contains("NULL k"))
    // same pattern for the histogram geometry witnesses
    val nullGeo = Seq(("a", Seq.fill(10)(1L), Some(0L), Option.empty[Long]))
      .toDF("g", "cs", "h_lo", "h_width")
    val e3 = intercept[Exception] {
      SketchStore.histMergeSlices(nullGeo, Seq("g"), 0L, 4L, nBins = 8).collect()
    }
    assert(e3.getMessage.contains("NULL bin-geometry") ||
      e3.getCause != null &&
        e3.getCause.getMessage.contains("NULL bin-geometry"))
  }

  test("cmsInnerProduct: min-over-rows arithmetic; row-SUM overflow raises (r14 ADVICE)") {
    // depth=2, width=4, hand-built states: row sums 1·2+2·1+0+3·3 = 13
    // and 0+1·4+2·2+0 = 8 → the estimate is the min, 8
    val ca = Seq(1L, 2L, 0L, 3L, 0L, 1L, 2L, 0L)
    val cb = Seq(2L, 1L, 5L, 3L, 9L, 4L, 2L, 7L)
    val got = Seq((ca, cb)).toDF("ca", "cb")
      .select(SketchStore.cmsInnerProduct(col("ca"), col("cb"),
        depth = 2, width = 4).as("ip")).as[Long].collect()(0)
    assert(got === math.min(1 * 2 + 2 * 1 + 0 + 3 * 3, 1 * 4 + 2 * 2))
    // every INDIVIDUAL bucket product fits in a Long (~2.56e18) but the
    // row SUM of four of them (~1.02e19) wraps negative — the r14
    // ADVICE trap: the old max-element guard passed this state and the
    // min picked the wrapped negative, silently underestimating
    val big = Seq.fill(8)(1600000000L)
    val eOv = intercept[Exception] {
      Seq((big, big)).toDF("ca", "cb")
        .select(SketchStore.cmsInnerProduct(col("ca"), col("cb"),
          depth = 2, width = 4)).collect()
    }
    assert(eOv.getMessage.contains("overflow") ||
      eOv.getCause != null && eOv.getCause.getMessage.contains("overflow"))
    // wrong geometry still raises
    val eGeo = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("ca", "cb")
        .select(SketchStore.cmsInnerProduct(col("ca"), col("cb"),
          depth = 2, width = 4)).collect()
    }
    assert(eGeo.getMessage.contains("counters") ||
      eGeo.getCause != null && eGeo.getCause.getMessage.contains("counters"))
  }
}
