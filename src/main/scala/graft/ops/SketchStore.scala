package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TypedAggs

/** The SKETCH WAREHOUSE: persist per-slice sketch states (KMV bottom-k
  * hash lists, Count–Min counter matrices) as rows of a bucketed table,
  * merge a new day's slice in WITHOUT re-scanning history, and answer
  * distinct/frequency questions from the store alone — the operating
  * posture of a 100 TB pipeline, where the corpus is scanned once per
  * ingest slice and every later question touches only sketch rows
  * (groups × slices × k longs, dimension-scale).
  *
  * Why these sketches (KMV/HLL distinct, CMS frequency, HIST
  * quantiles, Bloom membership): every state is a pure function of the
  * input MULTISET — KMV's bottom-k of a union is the union of
  * bottom-k's, CMS/HIST counters are sums, HLL registers and Bloom
  * bits are maxes/ORs — so store ⊕ slice ≡ full-rescan EXACTLY
  * (SketchStoreSpec proves it; the q152/q153 oracles replay the merged
  * estimates hash-exactly against the raw corpus). Misra–Gries is
  * deliberately absent: its state is merge-order-dependent, so a
  * warehouse of MG rows would answer differently per merge plan — the
  * wrong property for a persisted artifact.
  *
  * Scale shape: slice construction is one hash aggregate over the new
  * slice's corpus (map-side combining, ≤ k longs or depth×width
  * counters shipped per group-partition); merges touch only sketch
  * rows. Persist stores with [[writeStore]] (bucketed on the group
  * key) and a store-only merge plans with ZERO Exchange — the
  * aggregation reads bucket-local (spec-pinned).
  */
object SketchStore {

  /** Per-(group, slice) KMV sketch rows over `valueCol` — the unit of
    * persistence. One corpus scan; each row carries the slice's
    * bottom-`k` distinct md5-60 hashes ascending.
    */
  def kmvSlices(df: DataFrame, groupCols: Seq[String], sliceCol: String,
                valueCol: Column, k: Int = 64): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(TypedAggs.kmvHashes(valueCol, k).as("hs"))
      // capacity travels WITH the state (r13 ADVICE): a bottom-16 slice
      // has <= 16 rows and would pass KmvMergeHashes' length check at
      // k=64, yet its merged state is NOT the union's bottom-64 — only
      // the persisted k can distinguish "legitimately below capacity"
      // from "written with a smaller k"
      .withColumn("k", lit(k))

  /** Merge sketch rows (a store, a store ∪ a fresh slice, …) down to
    * one state per group; `n_slices` counts the merged rows — the
    * store-shape evidence the q152 oracle checks alongside the
    * estimate. Requires the `k` column [[kmvSlices]] persists and fails
    * loudly when any stored row's capacity differs from the merge's —
    * the same loud-failure contract as [[TypedAggs.CmsMerge]]/
    * [[TypedAggs.HllMergeRegisters]] (r13 ADVICE: a bottom-16 store
    * merged at k=64 read as an "exact" below-capacity count is silently
    * wrong).
    */
  def kmvMergeSlices(slices: DataFrame, groupCols: Seq[String],
                     k: Int = 64): DataFrame = {
    require(slices.columns.contains("k"),
      "kmvMergeSlices: slices must carry the `k` column kmvSlices " +
        "persists — without it a store written at a smaller capacity " +
        "is indistinguishable from one legitimately below it")
    slices.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slices"),
        TypedAggs.kmvMergeHashes(col("hs"), k).as("hs"),
        min(col("k")).as("_k_lo"), max(col("k")).as("_k_hi"),
        // NULL-witness guard (r14 ADVICE): min/max SKIP nulls, so a
        // corrupted store row with k = NULL — or a group whose k is
        // all-NULL, where the comparison itself goes null and falls
        // through to `otherwise` — would merge silently; a missing
        // witness must raise like a mismatched one
        count(col("k")).as("_k_n"))
      .select(groupCols.map(col) ++ Seq(col("n_slices"),
        when(col("_k_n") =!= col("n_slices"), raise_error(lit(
          "kmvMergeSlices: some stored rows carry a NULL k witness — " +
            "a missing capacity is as unsafe as a mismatched one")))
          .when(col("_k_lo") =!= k || col("_k_hi") =!= k, raise_error(concat(
          lit("kmvMergeSlices: stored k in ["), col("_k_lo").cast("string"),
          lit(", "), col("_k_hi").cast("string"),
          lit(s"] does not match merge k=$k"))))
          .otherwise(col("hs")).as("hs"),
        // the merged state keeps its OWN capacity witness (r14
        // self-review): a compacted store row must re-merge with
        // fresh slices under the same loud contract
        lit(k).as("k")): _*)
  }

  /** The KMV estimate read as a codegen'd column over a (merged) hash
    * list: exact count below capacity, (k−1)·2⁶⁰ / h₍ₖ₎ at it — the
    * same arithmetic as [[TypedAggs.KmvSketch.finish]], evaluated at
    * query time so stored states stay mergeable.
    */
  def kmvEstimate(hs: Column, k: Int = 64): Column =
    when(size(hs) < k, size(hs).cast("double"))
      .otherwise(lit((k - 1).toDouble * 1152921504606846976.0 /* 2^60 */) /
        element_at(hs, k).cast("double"))

  /** SET-ANALYTICS read over two stored KMV states (Beyer et al. 2007
    * §5 — "distinct-value estimation over set operations"): Jaccard
    * and intersection-size estimates from the sketches ALONE, no
    * corpus rescan — the second planning question a warehouse answers
    * after q183's join sizing ("how much do these two corpora
    * overlap?"). The union's bottom-k is the bottom-k of the merged
    * hash lists; ρ = the fraction of those union hashes present in
    * BOTH sketches is an unbiased Jaccard estimator; |A∩B| ≈ ρ ·
    * est(|A∪B|). Below capacity everything is EXACT (the sketches are
    * the full hash sets). Pure codegen'd column arithmetic — integer
    * counts, one float division of engine-identical operands, rounded
    * reads — so the q199 oracle replays every field hash-exactly.
    * Returns a struct (n_common, n_union_k, est_union, est_jaccard,
    * est_intersection); empty-sketch pairs read zero overlap.
    */
  def kmvSetStats(ha: Column, hb: Column, k: Int = 64): Column = {
    val u = slice(array_sort(array_distinct(concat(ha, hb))), 1, k)
    val cnt = size(filter(u, h =>
      array_contains(ha, h) && array_contains(hb, h)))
    val denom = size(u)
    val estU = when(denom < k, denom.cast("double"))
      .otherwise(lit((k - 1).toDouble * 1152921504606846976.0 /* 2^60 */) /
        element_at(u, k).cast("double"))
    struct(
      cnt.cast("long").as("n_common"),
      denom.cast("long").as("n_union_k"),
      round(estU, 4).as("est_union"),
      when(denom === 0, lit(0.0))
        .otherwise(round(cnt.cast("double") / denom.cast("double"), 6))
        .as("est_jaccard"),
      when(denom === 0, lit(0.0))
        .otherwise(round(cnt.cast("double") / denom.cast("double") * estU, 4))
        .as("est_intersection"))
  }

  /** Per-(group, slice) Count–Min matrices over `valueCol` (stored as
    * the flat `counts` row the [[TypedAggs.cmsMerge]] reducer re-adds).
    */
  def cmsSlices(df: DataFrame, groupCols: Seq[String], sliceCol: String,
                valueCol: Column, depth: Int = 3,
                width: Int = 2048): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(TypedAggs.countMin(valueCol, depth, width)("counts").as("counts"))

  /** Vector-add CMS slices down to one matrix per group; point reads
    * go through [[TypedAggs.countMinEstimate]] on the `sk` struct.
    */
  def cmsMergeSlices(slices: DataFrame, groupCols: Seq[String],
                     depth: Int = 3, width: Int = 2048): DataFrame =
    slices.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slices"),
        TypedAggs.cmsMerge(col("counts"), depth, width).as("sk"))

  /** Per-(group, slice) HLL register vectors over `valueCol` — the
    * third warehouse sketch type (register max is merge-order-
    * independent like KMV's bottom-k and CMS's sums).
    */
  def hllSlices(df: DataFrame, groupCols: Seq[String], sliceCol: String,
                valueCol: Column, b: Int = 6): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(TypedAggs.hllRegisters(valueCol, b).as("regs"))

  /** Element-wise-max HLL slices down to one register vector per
    * group.
    */
  def hllMergeSlices(slices: DataFrame, groupCols: Seq[String],
                     b: Int = 6): DataFrame =
    slices.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slices"),
        TypedAggs.hllMergeRegisters(col("regs"), b).as("regs"))

  /** RAW HLL estimate over a (merged) b=6 register vector:
    * α₆₄·m²/Σ2^(−rⱼ) with the harmonic sum computed as the exact
    * integer Σ 2^(55−rⱼ) (≤ 64·2⁵⁵ < 2⁶³) — the estimate is then ONE
    * float division of cross-engine-identical operands, so it replays
    * hash-exactly (the q158 oracle). Deliberately uncorrected: the
    * small-range branch needs ln(), which is not engine-reproducible;
    * at warehouse cardinalities (≫ 5m/2) the raw branch is the
    * operative one anyway — consumers needing bias correction apply
    * it downstream of the exact integer sum.
    *
    * The α and scale constants are the b = 6 values, so a register
    * vector of any other width RAISES (r13 self-review: a b = 8 store
    * read through these constants — or b < 6 ranks driving the shift
    * amount negative, which Spark masks mod 64 — would yield silently
    * wrong estimates; the module's contract is loud failure on
    * mismatched states).
    */
  /** The one register count all b = 6 HLL constants derive from —
    * the width guard in [[hllEstimate]], the α·m² numerator, and the
    * small-range threshold/linear-counting scale in
    * [[hllEstimateCorrected]] all read THIS value (r14 verdict: three
    * magic literals that nothing cross-checked).
    */
  private val HllM = 64

  def hllEstimate(regs: Column): Column =
    when(size(regs) =!= HllM, raise_error(concat(
      lit(s"hllEstimate: expected $HllM registers (b=6), got "),
      size(regs).cast("string"))))
      .otherwise(
        (lit(0.709) * lit((HllM.toLong * HllM).toDouble /* m² */) *
          lit(36028797018963968.0 /* 2^55 */)) /
          aggregate(regs, lit(0L),
            (acc, r) => acc + call_function("shiftleft", lit(1L),
              (lit(55) - r).cast("int")))
            .cast("double"))

  /** JOIN-SIZE estimate from two stored CMS matrices (the AMS/CMS
    * inner product, Cormode & Muthukrishnan 2005 §4.2): Σ_v
    * f_A(v)·f_B(v) — exactly the row count of the equi-join between
    * the two multisets — estimated as the MIN over depth rows of the
    * bucket-wise counter product. Hash collisions only ADD mass, so
    * the estimate never underestimates (q183 pins the invariant). The
    * planning question a 100 TB warehouse asks before running a join:
    * answered from two sketch rows (depth×width longs), the data never
    * touched. Pure integer arithmetic → hash-exact cross-engine
    * replay.
    */
  def cmsInnerProduct(ca: Column, cb: Column, depth: Int = 3,
                      width: Int = 2048): Column = {
    val ip = array_min(transform(sequence(lit(0), lit(depth - 1)), d =>
      aggregate(sequence(lit(0), lit(width - 1)), lit(0L),
        (acc, w) => acc + element_at(ca, d * lit(width) + w + 1) *
          element_at(cb, d * lit(width) + w + 1))))
    // the module's loud-failure contract (r14 second review; tightened
    // per r14 ADVICE): wrong-geometry states would index rows at wrong
    // offsets, and a per-depth-row SUM above Long range would wrap
    // NEGATIVE under non-ANSI mode even when every individual bucket
    // product fits (width=2048 products accumulate), silently breaking
    // the never-underestimate guarantee — so the cross-check recomputes
    // the FULL row sums in double (products are non-negative, so the
    // double sum can only lose ulps, never sign) and raises when the
    // LARGEST row approaches Long range; the 9.0e18 margin (~2% under
    // 2^63) dwarfs double rounding at 53-bit precision
    val ipRowMaxD = array_max(transform(sequence(lit(0), lit(depth - 1)), d =>
      aggregate(sequence(lit(0), lit(width - 1)), lit(0.0),
        (acc, w) => acc + element_at(ca, d * lit(width) + w + 1).cast("double") *
          element_at(cb, d * lit(width) + w + 1).cast("double"))))
    when(size(ca) =!= depth * width || size(cb) =!= depth * width,
      raise_error(concat(
        lit(s"cmsInnerProduct: expected $depth*$width counters, got "),
        size(ca).cast("string"), lit(" and "), size(cb).cast("string"))))
      .when(ipRowMaxD > lit(9.0e18),
        raise_error(lit("cmsInnerProduct: a depth row's inner product " +
          "would overflow Long — reduce counter magnitude (narrower " +
          "slices) or widen the sketch")))
      .otherwise(ip)
  }

  /** [[hllEstimate]] WITH the small-range correction (Flajolet et al.
    * 2007 §4: when raw ≤ 2.5m and V = |zero registers| > 0, linear
    * counting m·ln(m/V) is the better estimator) — the OPT-IN reading
    * the r13 verdict asked for, so small-n consumers stop re-deriving
    * the ln() form themselves. ln() is not bit-reproducible across
    * engines, so queries using this are rows-only by design (q171);
    * the BRANCH decision is engine-exact (raw is one float division
    * of identical integer operands, V an integer), and the q172 band
    * sibling pins |corrected − exact| within a wide band whose edge
    * sits far outside any ulp divergence. The raw path is unchanged
    * [[hllEstimate]] (including its loud b=6 width check).
    */
  def hllEstimateCorrected(regs: Column): Column = {
    val v = size(filter(regs, r => r === 0L))
    val raw = hllEstimate(regs)
    // 2.5·m threshold and m·ln(m/V) scale both derive from HllM — the
    // same constant the inner hllEstimate's width guard enforces, so a
    // future width change edits ONE value and the guard keeps it honest
    when(raw <= lit(2.5 * HllM) && v > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / v.cast("double")))
      .otherwise(raw)
  }

  /** Per-(group, slice) fixed-bin integer histograms over `valueCol`
    * (cast to long) — the warehouse's QUANTILE sketch (the fourth
    * type: KMV/HLL distinct, CMS frequency, this percentiles). The
    * bin geometry travels WITH the state (`h_lo`, `h_width` columns —
    * the KMV `k` rule): counters from different geometries would
    * vector-add into silently wrong percentiles.
    */
  def histSlices(df: DataFrame, groupCols: Seq[String], sliceCol: String,
                 valueCol: Column, lo: Long, width: Long,
                 nBins: Int): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(TypedAggs.histCounts(valueCol.cast("long"), lo, width, nBins)
        .as("cs"))
      .withColumn("h_lo", lit(lo)).withColumn("h_width", lit(width))

  /** Element-wise-add histogram slices down to one counter vector per
    * group. Fails loudly when any stored row's bin geometry differs
    * from the merge's ([[kmvMergeSlices]]' capacity-witness contract;
    * bin-COUNT mismatches raise inside [[TypedAggs.HistMerge]]).
    */
  def histMergeSlices(slices: DataFrame, groupCols: Seq[String], lo: Long,
                      width: Long, nBins: Int): DataFrame = {
    require(Seq("h_lo", "h_width").forall(slices.columns.contains),
      "histMergeSlices: slices must carry the h_lo/h_width columns " +
        "histSlices persists — counters from an unknown bin geometry " +
        "cannot be merged safely")
    slices.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slices"),
        TypedAggs.histMerge(col("cs"), nBins).as("cs"),
        min(col("h_lo")).as("_lo_l"), max(col("h_lo")).as("_lo_h"),
        min(col("h_width")).as("_w_l"), max(col("h_width")).as("_w_h"),
        // the kmvMergeSlices NULL-witness rule (r14 ADVICE): a NULL
        // geometry value slips past min/max (aggregates skip nulls;
        // all-NULL nulls the comparison itself) — count both columns
        count(col("h_lo")).as("_lo_n"), count(col("h_width")).as("_w_n"))
      .select(groupCols.map(col) ++ Seq(col("n_slices"),
        when(col("_lo_n") =!= col("n_slices") ||
             col("_w_n") =!= col("n_slices"), raise_error(lit(
          "histMergeSlices: some stored rows carry a NULL bin-geometry " +
            "witness — a missing geometry is as unsafe as a mismatched one")))
          .when(col("_lo_l") =!= lo || col("_lo_h") =!= lo ||
             col("_w_l") =!= width || col("_w_h") =!= width,
          raise_error(concat(
            lit("histMergeSlices: stored bin geometry (lo in ["),
            col("_lo_l").cast("string"), lit(", "),
            col("_lo_h").cast("string"), lit("], width in ["),
            col("_w_l").cast("string"), lit(", "),
            col("_w_h").cast("string"),
            lit(s"]) does not match merge lo=$lo width=$width"))))
          .otherwise(col("cs")).as("cs"),
        // geometry witness preserved on the merged state (the KMV
        // rule): compaction output must re-merge with fresh slices
        lit(lo).as("h_lo"), lit(width).as("h_width")): _*)
  }

  /** Percentile read over a (merged) histogram state: the LOWER BOUND
    * of the bin containing rank ⌈p·total⌉ — pure integer rank
    * arithmetic over the counters (ONE float multiply of
    * cross-engine-identical literal operands decides the rank), so
    * the q168 oracle replays it hash-exactly. By construction the
    * exact rank-⌈p·total⌉ order statistic lies in [bound, bound +
    * width) whenever the bound is a middle bin — the q168 in-bin
    * audit columns pin exactly that. Underflow reads as lo − width
    * (sentinel), overflow as lo + nBins·width; empty state reads
    * null.
    */
  def histPercentileBound(cs: Column, p: Double, lo: Long,
                          width: Long): Column = {
    val total = aggregate(cs, lit(0L), (a, x) => a + x)
    val rank = ceil(lit(p) * total.cast("double")).cast("long")
    val idx = aggregate(
      sequence(lit(1), size(cs)),
      struct(lit(0L).as("cum"), lit(0).as("idx")),
      (acc, i) => {
        val cum = acc.getField("cum") + element_at(cs, i)
        when(acc.getField("idx") > 0, acc)
          .otherwise(struct(cum.as("cum"),
            when(cum >= rank, i).otherwise(lit(0)).as("idx")))
      },
      acc => acc.getField("idx"))
    when(total === 0L, lit(null).cast("long"))
      .when(idx === 1, lit(lo - width))
      .when(idx === size(cs),
        lit(lo) + (size(cs) - 2).cast("long") * lit(width))
      .otherwise(lit(lo) + (idx.cast("long") - lit(2L)) * lit(width))
  }

  /** Per-(group, slice) Bloom membership bit vectors over `valueCol` —
    * the FIFTH warehouse sketch type (KMV/HLL distinct, CMS frequency,
    * HIST quantiles, this membership: "have I kept this id before?"
    * answered without the exact shingle/id store's footprint). Both
    * the width AND the hash count travel with the state (`m_bits`,
    * `k_hashes` — the KMV `k` rule): OR-ing across widths would
    * misalign every bit, and a store written with fewer hashes read at
    * more would produce FALSE NEGATIVES, the one error class a Bloom
    * filter promises never to make.
    */
  def bloomSlices(df: DataFrame, groupCols: Seq[String], sliceCol: String,
                  valueCol: Column, mBits: Int = 4096,
                  k: Int = 3): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(TypedAggs.bloomBits(valueCol, mBits, k).as("bits"))
      .withColumn("m_bits", lit(mBits)).withColumn("k_hashes", lit(k))

  /** Bitwise-OR Bloom slices down to one bit vector per group. Fails
    * loudly on mismatched OR MISSING witnesses (the
    * [[kmvMergeSlices]]/[[histMergeSlices]] contract, NULL guard from
    * birth); the merged state re-emits its own witnesses so compaction
    * output re-merges under the same contract.
    */
  def bloomMergeSlices(slices: DataFrame, groupCols: Seq[String],
                       mBits: Int = 4096, k: Int = 3): DataFrame = {
    require(Seq("m_bits", "k_hashes").forall(slices.columns.contains),
      "bloomMergeSlices: slices must carry the m_bits/k_hashes columns " +
        "bloomSlices persists — a store of unknown geometry cannot be " +
        "merged or probed safely")
    slices.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slices"),
        TypedAggs.bloomMergeBits(col("bits"), mBits).as("bits"),
        min(col("m_bits")).as("_m_l"), max(col("m_bits")).as("_m_h"),
        min(col("k_hashes")).as("_k_l"), max(col("k_hashes")).as("_k_h"),
        count(col("m_bits")).as("_m_n"), count(col("k_hashes")).as("_k_n"))
      .select(groupCols.map(col) ++ Seq(col("n_slices"),
        when(col("_m_n") =!= col("n_slices") ||
             col("_k_n") =!= col("n_slices"), raise_error(lit(
          "bloomMergeSlices: some stored rows carry a NULL m_bits/" +
            "k_hashes witness — a missing geometry is as unsafe as a " +
            "mismatched one")))
          .when(col("_m_l") =!= mBits || col("_m_h") =!= mBits ||
                col("_k_l") =!= k || col("_k_h") =!= k,
            raise_error(concat(
              lit("bloomMergeSlices: stored geometry (m_bits in ["),
              col("_m_l").cast("string"), lit(", "),
              col("_m_h").cast("string"), lit("], k_hashes in ["),
              col("_k_l").cast("string"), lit(", "),
              col("_k_h").cast("string"),
              lit(s"]) does not match merge mBits=$mBits k=$k"))))
          .otherwise(col("bits")).as("bits"),
        lit(mBits).as("m_bits"), lit(k).as("k_hashes")): _*)
  }

  /** Membership read over a (merged) Bloom state: true iff ALL k
    * probe bits are set — no false negatives by construction, false
    * positives at the standard (1 − e^(−kn/m))^k rate. The probe
    * positions are the same cross-engine md5₆₀ family the writer
    * used, so the read is fully DETERMINISTIC and a DuckDB oracle
    * replays it hash-exactly (unlike the estimate sketches, membership
    * needs no rows-only fallback). Codegen'd column — probes run at
    * scan speed against a broadcast store row.
    */
  def bloomContains(bits: Column, value: Column, mBits: Int = 4096,
                    k: Int = 3): Column =
    (0 until k).map { i =>
      val p = graft.functions.Hashing.md5Long(
        concat(lit(s"bloom$i:"), value.cast("string"))) % mBits
      (element_at(bits, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int")))) =!= 0L
    }.reduce(_ && _)

  /** Persist sketch rows bucketed on the group key ([[Bucketing]]), so
    * a store-only merge aggregates bucket-local with zero Exchange and
    * appending a new slice's rows never re-shuffles history.
    */
  def writeStore(slices: DataFrame, table: String, groupCols: Seq[String],
                 buckets: Int, path: Option[String] = None): Unit =
    Bucketing.writeBucketed(slices, table, groupCols, buckets, path = path)
}
