package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{concat, element_at, least, lit, udaf}

/** Typed aggregation surface (SURVEY.md §2.11): the reference's
  * `AggregateFunction[IN, ACC, OUT]` extension point maps to Spark's
  * `Aggregator[IN, BUF, OUT]` registered through `udaf(...)` — partial
  * aggregation (map-side combine) falls out of reduce/merge exactly like
  * the reference's add/merge pair.
  */
object TypedAggs {

  /** A2 parity (hot-item-analysis/.../HotItems.scala:110-121 AverageAgg:
    * sum/count accumulator → Double).
    */
  object AvgLong extends Aggregator[Long, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Long): (Long, Long) = (b._1 + a, b._2 + 1)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / b._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def avgLong(c: Column): Column = udaf(AvgLong, Encoders.scalaLong).apply(c)

  /** A5 bit-parity Bloom sketch (network-flow-analysis/.../
    * UvWithBloomFilter.scala:103-121): a capBits bitmap (2^23 default ≈
    * 1 MiB, the reference's Redis sizing) probed by 3 polynomial hashes
    * `r = r*seed + char` with seeds 61/71/83, masked by capBits-1 —
    * the identical bit pattern the reference stores in Redis.
    *
    * finish() returns the standard Bloom cardinality estimate
    * round(-m/k * ln(1 - X/m)). Deviation (documented): the reference
    * increments a Redis counter on first-sight per *element*, which is
    * arrival-order-dependent and single-threaded; the sketch estimate is
    * deterministic and mergeable (parallel partial aggregation).
    *
    * Scale note: the 1 MiB buffer travels per group — use for coarse
    * groups (per-window UV = hundreds of groups), not per-key sketches;
    * for high-cardinality groups use approx_count_distinct (HLL++).
    */
  case class BloomSketch(capBits: Int = 1 << 23, seeds: Seq[Int] = Seq(61, 71, 83))
      extends Aggregator[String, Array[Byte], Long] {
    require(Integer.bitCount(capBits) == 1, "capBits must be a power of two")

    private def hash(value: String, seed: Int): Long = {
      var result = 0L
      var i = 0
      while (i < value.length) { result = result * seed + value.charAt(i); i += 1 }
      result & (capBits - 1)
    }

    override def zero: Array[Byte] = new Array[Byte](capBits / 8)

    override def reduce(b: Array[Byte], v: String): Array[Byte] = {
      seeds.foreach { s =>
        val bit = hash(v, s)
        b((bit / 8).toInt) = (b((bit / 8).toInt) | (1 << (bit % 8)).toByte).toByte
      }
      b
    }

    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
      x
    }

    override def finish(b: Array[Byte]): Long = {
      var set = 0L
      var i = 0
      while (i < b.length) { set += Integer.bitCount(b(i) & 0xff); i += 1 }
      if (set == 0) 0L
      else {
        val m = capBits.toDouble
        val k = seeds.size.toDouble
        Math.round(-m / k * Math.log(1.0 - set / m))
      }
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def bloomDistinct(c: Column, capBits: Int = 1 << 23): Column =
    udaf(BloomSketch(capBits), Encoders.STRING).apply(c)

  private[graft] case class CapBuf(ids: List[Long], n: Long)

  /** Collected ids (sorted, complete) when the true count `n` <= cap;
    * empty when the group overflowed — `n` is always the true count.
    */
  case class CappedIds(ids: Seq[Long], n: Long)

  /** Memory-capped collect_list: accumulates at most cap+1 elements per
    * group but always counts all of them, so a degenerate group (e.g. an
    * LSH bucket holding a duplicate explosion) costs O(cap) buffer
    * instead of O(group) — the difference between a flagged bucket and a
    * task OOM. Groups over the cap finish with an empty `ids` and their
    * true size in `n`; groups within it finish with the complete sorted
    * list.
    */
  case class CappedCollectIds(cap: Int) extends Aggregator[Long, CapBuf, CappedIds] {
    require(cap > 0, "cap must be positive")
    override def zero: CapBuf = CapBuf(Nil, 0L)
    override def reduce(b: CapBuf, a: Long): CapBuf =
      CapBuf(if (b.n > cap) b.ids else a :: b.ids, b.n + 1)
    override def merge(x: CapBuf, y: CapBuf): CapBuf = {
      val n = x.n + y.n
      CapBuf(if (n > cap) (x.ids ++ y.ids).take(cap + 1) else x.ids ++ y.ids, n)
    }
    override def finish(b: CapBuf): CappedIds =
      if (b.n > cap) CappedIds(Nil, b.n) else CappedIds(b.ids.sorted, b.n)
    override def bufferEncoder: Encoder[CapBuf] = Encoders.product[CapBuf]
    override def outputEncoder: Encoder[CappedIds] = Encoders.product[CappedIds]
  }

  def cappedCollectIds(c: Column, cap: Int): Column =
    udaf(CappedCollectIds(cap), Encoders.scalaLong).apply(c)

  /** Offset-form Misra–Gries state: an entry's ESTIMATE is
    * `stored − debt`; entries with stored ≤ debt are logically dead
    * (dropped lazily). `minStored` is a LOWER bound on the live min —
    * staleness only costs an occasional empty compaction scan.
    */
  private[graft] case class MgBuf(entries: Map[String, Long], debt: Long,
                                  minStored: Long)

  /** Heavy-hitters summary as a single value (see [[MisraGries]]). */
  case class MgSummary(entries: Map[String, Long])

  /** Misra–Gries heavy hitters (Misra & Gries 1982; the MERGEABLE form
    * of Agarwal et al., "Mergeable Summaries", PODS 2012): at most `k`
    * counters per group. Guarantees, for a group of n items:
    *  - every item with true frequency > n/(k+1) IS in the summary;
    *  - estimates never overcount and undercount by at most n/(k+1).
    *
    * The classic decrement-all step is implemented in OFFSET form: a
    * shared `debt` counter increments instead of rebuilding all k
    * entries, so the tail-heavy hot path (unseen item, counters full —
    * the common case on Zipfian streams) is O(1) instead of O(k);
    * dead entries compact lazily when a slot is needed (tracked by a
    * conservative `minStored` bound). The decrements-remove-(k+1)-units
    * argument is unchanged: debt only increments when all k counters
    * are strictly alive, so both bounds above hold verbatim.
    *
    * merge() materializes estimates and subtracts the (k+1)-th largest
    * combined count — the PODS 2012 rule that preserves both bounds
    * under partial aggregation — so the corpus never shuffles its
    * items: each partition ships ONE k-entry map where an exact count
    * shuffles every distinct term. At 100 TB that is the difference
    * between an all-terms exchange and k×partitions map entries.
    *
    * APPROXIMATE BY DESIGN and merge-order-dependent: estimates (and
    * which sub-threshold items survive) vary with partitioning — the
    * q03/q32 family; the guarantee, not the rows, is the contract
    * (ApproxErrorSpec and RandomizedSpec prove it against exact counts
    * on skewed and uniform corpora).
    */
  case class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgSummary] {
    require(k > 0, "k must be positive")

    override def zero: MgBuf = MgBuf(Map.empty, 0L, Long.MaxValue)

    override def reduce(b: MgBuf, a: String): MgBuf = {
      val m = b.entries
      m.get(a) match {
        case Some(c) =>
          // minStored may go stale-low when the min entry grows — a
          // lower bound stays correct
          MgBuf(m.updated(a, c + 1), b.debt, b.minStored)
        case None if m.size < k =>
          val s = b.debt + 1
          MgBuf(m.updated(a, s), b.debt, math.min(b.minStored, s))
        case None if b.minStored <= b.debt =>
          // something may be dead — compact, then insert or pay debt
          val kept = m.filter(_._2 > b.debt)
          if (kept.size < k) {
            val s = b.debt + 1
            val mn = if (kept.isEmpty) s else math.min(kept.values.min, s)
            MgBuf(kept.updated(a, s), b.debt, mn)
          } else // the bound was stale: all k alive after all
            MgBuf(kept, b.debt + 1, kept.values.min)
        case None =>
          // all k counters strictly alive: the classic decrement-all
          // collapses to one debt increment — the O(1) hot path
          MgBuf(m, b.debt + 1, b.minStored)
      }
    }

    override def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val ex = x.entries.collect { case (t, s) if s > x.debt => t -> (s - x.debt) }
      val combined = y.entries.foldLeft(ex) { case (m, (t, s)) =>
        if (s > y.debt) m.updated(t, m.getOrElse(t, 0L) + (s - y.debt)) else m
      }
      val pruned =
        if (combined.size <= k) combined
        else {
          // subtract the (k+1)-th largest count; ≤ 0 entries drop
          val thresh = combined.valuesIterator.toArray.sorted(
            Ordering[Long].reverse).apply(k)
          combined.collect { case (t, c) if c > thresh => t -> (c - thresh) }
        }
      MgBuf(pruned, 0L,
        if (pruned.isEmpty) Long.MaxValue else pruned.values.min)
    }

    override def finish(b: MgBuf): MgSummary = MgSummary(
      b.entries.collect { case (t, s) if s > b.debt => t -> (s - b.debt) })
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  }

  def misraGries(c: Column, k: Int): Column =
    udaf(MisraGries(k), Encoders.STRING).apply(c)

  /** The full counter matrix, row-major (row i, bucket j at i·width+j) —
    * exposed whole so point estimates are plain `element_at` arithmetic
    * over the one aggregated value (see [[CountMinSketch]]).
    */
  case class CmsSketch(counts: Seq[Long])

  /** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    * a depth×width counter matrix; item t increments bucket
    * h_i(t) = md5₆₀("cms&lt;i&gt;:" ‖ t) mod width in every row, and
    * est(t) = min_i matrix(i, h_i(t)).
    *
    * Two properties make this the q113-family's complement:
    *  - counters are SUMS, so unlike Misra–Gries the whole matrix is
    *    merge-order-INDEPENDENT — the sketch, and every estimate read
    *    from it, is a deterministic function of the input multiset
    *    under any partitioning. Point estimates therefore hash-match
    *    a DuckDB oracle that replays the math relationally
    *    (est(t) = min_i Σ_{t': h_i(t')=h_i(t)} cnt(t')), because the
    *    hash family is the cross-engine md5₆₀ ([[Hashing]]). An
    *    approximate sketch with an EXACT oracle — no band needed.
    *  - guarantees: exact ≤ est always (collisions only add), and
    *    est ≤ exact + 2N/width per row with probability ≥ 1/2,
    *    so ≤ over all depth rows with probability ≥ 1 − 2^−depth.
    *
    * Scale: one depth·width long array per (partition, group) — fixed
    * memory, vector-add merge, map-side combine; answers point
    * frequency queries over any term (Misra–Gries answers only the
    * heavy tail it kept). Use for coarse groups: the buffer travels
    * per group, the BloomSketch sizing rule.
    */
  case class CountMinSketch(depth: Int = 3, width: Int = 2048)
      extends Aggregator[String, Array[Long], CmsSketch] {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")

    private def bucket(row: Int, v: String): Int =
      (Md5Long60.hash((s"cms$row:" + v)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)) % width).toInt

    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], v: String): Array[Long] = {
      var i = 0
      while (i < depth) { b(i * width + bucket(i, v)) += 1L; i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): CmsSketch = CmsSketch(b.toSeq)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
  }

  def countMin(c: Column, depth: Int = 3, width: Int = 2048): Column =
    udaf(CountMinSketch(depth, width), Encoders.STRING).apply(c)

  /** Sorted distinct min-hashes, ascending, size ≤ k (see [[KmvSketch]]). */
  private[graft] case class KmvBuf(hs: Seq[Long])

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; the
    * mergeable form of Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD 2007): keep the k
    * SMALLEST distinct md5₆₀("kmv:" ‖ t) hash values per group;
    * estimate = k<n ? (k−1)·2⁶⁰ / h₍ₖ₎ : n (exact below capacity).
    *
    * Like [[CountMinSketch]] (and unlike HLL register-merge order
    * subtleties or Misra–Gries), the state is a pure SET operation —
    * the k smallest of a union is merge-order-independent — and the
    * hash family is the cross-engine md5₆₀, so a DuckDB oracle
    * replays the estimate EXACTLY (rank the distinct hashes, read
    * h₍ₖ₎, same arithmetic): hash-exact correctness for an
    * approximate distinct count. Relative error ≈ 1/√(k−2).
    *
    * Scale: one ≤k-entry sorted array per (partition, group), merge =
    * sorted-merge take-k; ships k longs where exact distinct ships
    * every value — and unlike HLL the sketch also supports set
    * OPERATIONS downstream (union = merge; intersection via the
    * SIGMOD'07 ρ-estimator over the combined bottom-k), which is why
    * production dedup/overlap audits carry KMV next to HLL.
    */
  case class KmvSketch(k: Int = 64) extends Aggregator[String, KmvBuf, Double] {
    require(k >= 2, "k must be >= 2")

    private def hash(v: String): Long =
      Md5Long60.hash(("kmv:" + v)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    override def zero: KmvBuf = KmvBuf(Vector.empty)

    override def reduce(b: KmvBuf, v: String): KmvBuf = {
      val h = hash(v)
      val hs = b.hs
      if (hs.length >= k && h >= hs.last) b
      else {
        val i = search(hs, h)
        if (i >= 0) b // already present
        else {
          val at = -i - 1
          val grown = (hs.take(at) :+ h) ++ hs.drop(at)
          KmvBuf(if (grown.length > k) grown.take(k) else grown)
        }
      }
    }

    private def search(hs: Seq[Long], h: Long): Int = {
      var lo = 0; var hi = hs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val x = hs(mid)
        if (x < h) lo = mid + 1 else if (x > h) hi = mid - 1 else return mid
      }
      -(lo + 1)
    }

    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      // sorted-merge of two distinct ascending runs, keep k smallest
      val out = Vector.newBuilder[Long]
      var i = 0; var j = 0; var n = 0
      val a = x.hs; val b = y.hs
      while (n < k && (i < a.length || j < b.length)) {
        val next =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val v = a(i); if (j < b.length && b(j) == v) j += 1; i += 1; v
          } else { val v = b(j); j += 1; v }
        out += next; n += 1
      }
      KmvBuf(out.result())
    }

    override def finish(b: KmvBuf): Double =
      if (b.hs.length < k) b.hs.length.toDouble
      else (k - 1).toDouble * 1152921504606846976.0 /* 2^60 */ / b.hs.last

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def kmvDistinct(c: Column, k: Int = 64): Column =
    udaf(KmvSketch(k), Encoders.STRING).apply(c)

  /** [[KmvSketch]] exposing the kept hashes instead of the estimate —
    * the input to SET operations (Beyer et al., SIGMOD 2007): the
    * bottom-k of a UNION is computable from two sketches' hash lists
    * (merge, take k), the Jaccard ρ-estimator is K∩/k over the
    * combined bottom-k, and intersection ≈ ρ·|A∪B|-est. Same buffer,
    * same merge — only finish() differs.
    */
  case class KmvHashes(k: Int = 64) extends Aggregator[String, KmvBuf, Seq[Long]] {
    private val core = KmvSketch(k)
    override def zero: KmvBuf = core.zero
    override def reduce(b: KmvBuf, v: String): KmvBuf = core.reduce(b, v)
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = core.merge(x, y)
    override def finish(b: KmvBuf): Seq[Long] = b.hs
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def kmvHashes(c: Column, k: Int = 64): Column =
    udaf(KmvHashes(k), Encoders.STRING).apply(c)

  /** Merge of STORED KMV states (rows of [[kmvHashes]] output) — the
    * incremental half of the sketch warehouse ([[graft.ops.SketchStore]]):
    * each input row IS a sketch (ascending distinct bottom-k hashes),
    * folded in by the same sorted-merge the live aggregation uses, so
    * store ⊕ slice ≡ full rescan exactly (bottom-k of a union of
    * bottom-k's is the union's bottom-k — every global winner survives
    * its own slice). Malformed states fail loudly: a stored list that
    * is not strictly ascending would silently violate the merge
    * invariant and skew every later estimate.
    */
  case class KmvMergeHashes(k: Int = 64)
      extends Aggregator[Seq[Long], KmvBuf, Seq[Long]] {
    private val core = KmvSketch(k)
    private def checked(hs: Seq[Long]): KmvBuf = {
      var i = 1
      while (i < hs.length) {
        require(hs(i - 1) < hs(i),
          "KmvMergeHashes: stored state must be strictly ascending " +
            s"(violated at index $i)")
        i += 1
      }
      require(hs.length <= k,
        s"KmvMergeHashes: stored state has ${hs.length} hashes > k=$k")
      KmvBuf(hs.toVector)
    }
    override def zero: KmvBuf = core.zero
    override def reduce(b: KmvBuf, hs: Seq[Long]): KmvBuf =
      core.merge(b, checked(hs))
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = core.merge(x, y)
    override def finish(b: KmvBuf): Seq[Long] = b.hs
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def kmvMergeHashes(c: Column, k: Int = 64): Column =
    udaf(KmvMergeHashes(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(c)

  /** Merge of STORED Count–Min matrices (the `counts` field of
    * [[countMin]] output): counters are sums, so vector-add over any
    * slicing replays the full-corpus sketch bit-exactly. Dimension
    * mismatches fail loudly — adding a 3×1024 state into a 3×2048
    * store would silently misalign every bucket.
    */
  case class CmsMerge(depth: Int = 3, width: Int = 2048)
      extends Aggregator[Seq[Long], Array[Long], CmsSketch] {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], counts: Seq[Long]): Array[Long] = {
      require(counts.length == depth * width,
        s"CmsMerge: stored state has ${counts.length} counters, " +
          s"expected depth*width = ${depth * width}")
      var i = 0
      while (i < b.length) { b(i) += counts(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): CmsSketch = CmsSketch(b.toSeq)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
  }

  def cmsMerge(c: Column, depth: Int = 3, width: Int = 2048): Column =
    udaf(CmsMerge(depth, width),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(c)

  /** Fixed-bin integer histogram — the sketch warehouse's QUANTILE
    * member (KMV/HLL answer distinct, CMS frequency; this answers
    * percentile monitoring — latency, doc-length drift). State =
    * nBins+2 counters (index 0 underflow, 1..nBins the [lo + (i−1)·w,
    * lo + i·w) bins, nBins+1 overflow); merge is element-wise ADD, so
    * the state is merge-order-INDEPENDENT (unlike Misra–Gries, which
    * the warehouse deliberately excludes) and slice ⊕ store ≡ full
    * rescan bit-exactly. Percentile reads are integer rank arithmetic
    * over the counters ([[graft.ops.SketchStore.histPercentileBound]])
    * — no ln(), no engine-divergent float folds, so the q168 oracle
    * replays bounds hash-exactly. Precision contract: a read returns
    * the BIN LOWER BOUND, exact to one bin width — size `width` to the
    * monitoring tolerance; `guardedExactPercentiles` remains the exact
    * path at query scale.
    */
  case class HistCounts(lo: Long, width: Long, nBins: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(width >= 1, "width must be >= 1")
    require(nBins >= 1, "nBins must be >= 1")
    override def zero: Array[Long] = new Array[Long](nBins + 2)
    override def reduce(b: Array[Long], v: Long): Array[Long] = {
      val i = if (v < lo) 0
              else {
                val bin = (v - lo) / width
                if (bin >= nBins) nBins + 1 else bin.toInt + 1
              }
      b(i) += 1
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def histCounts(c: Column, lo: Long, width: Long, nBins: Int): Column =
    udaf(HistCounts(lo, width, nBins), Encoders.scalaLong).apply(c)

  /** Merge of STORED histogram states: element-wise add, the
    * [[CmsMerge]] posture. Dimension mismatches fail loudly (a store
    * written with different bin counts would silently misalign every
    * percentile; lo/width travel as columns and are validated by
    * [[graft.ops.SketchStore.histMergeSlices]], the KMV `k` rule).
    */
  case class HistMerge(nBins: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(nBins >= 1, "nBins must be >= 1")
    override def zero: Array[Long] = new Array[Long](nBins + 2)
    override def reduce(b: Array[Long], counts: Seq[Long]): Array[Long] = {
      require(counts.length == nBins + 2,
        s"HistMerge: stored state has ${counts.length} counters, " +
          s"expected nBins+2 = ${nBins + 2}")
      var i = 0
      while (i < b.length) {
        require(counts(i) >= 0L, s"HistMerge: negative counter at $i")
        b(i) += counts(i)
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def histMerge(c: Column, nBins: Int): Column =
    udaf(HistMerge(nBins),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(c)

  /** HyperLogLog register vector (Flajolet et al. 2007), built for the
    * sketch warehouse: m = 2^b registers; value t hashes to
    * h = md5₆₀("hll:" ‖ t), bucket j = h mod m, and the register keeps
    * the MAX over its values of rank(h div m) — rank = leading zeros
    * of the remaining 60−b bits + 1 (so for b=6: 55 − bit-length,
    * empty register 0). Register max is merge-order-INDEPENDENT (like
    * KMV's bottom-k and CMS's sums, unlike Spark's internal HLL++
    * whose state isn't exposed), and the hash family is the
    * cross-engine md5₆₀ — so a DuckDB oracle replays every register,
    * and the RAW estimate read from them, exactly. The estimate
    * ([[graft.ops.SketchStore.hllEstimate]]) is the uncorrected
    * α_m·m²/Σ2^(−r) form with the harmonic sum computed as an exact
    * INTEGER (Σ 2^(55−r) ≤ m·2^55 < 2^63) — no ln(), no
    * engine-divergent float folds.
    */
  case class HllRegisters(b: Int = 6)
      extends Aggregator[String, Array[Byte], Seq[Long]] {
    require(b >= 4 && b <= 12, "b must be in [4, 12]")
    private val m = 1 << b
    private def rankOf(h: Long): (Int, Int) = {
      val j = (h & (m - 1)).toInt
      val w = h >>> b // 60-b significant bits, non-negative
      val r = if (w == 0L) 61 - b
              else 61 - b - (64 - java.lang.Long.numberOfLeadingZeros(w))
      (j, r)
    }
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(buf: Array[Byte], v: String): Array[Byte] = {
      val (j, r) = rankOf(Md5Long60.hash(("hll:" + v)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      if (r > buf(j)) buf(j) = r.toByte
      buf
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Byte]): Seq[Long] = buf.map(_.toLong).toSeq
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def hllRegisters(c: Column, b: Int = 6): Column =
    udaf(HllRegisters(b), Encoders.STRING).apply(c)

  /** Bloom membership bit vector, built for the sketch warehouse — the
    * FIFTH sketch type (KMV/HLL distinct, CMS frequency, HIST
    * quantiles; this answers "have I seen this id before?" without the
    * exact id store's footprint). State = mBits bits as mBits/64
    * longs, word w holding bits [64w, 64w+63] (bit i of a word =
    * 1L << i); value t sets the k bits md5₆₀("bloom&lt;i&gt;:" ‖ t)
    * mod mBits for i &lt; k. Bitwise-OR merge is order-INDEPENDENT, so
    * slice ⊕ store ≡ full rescan bit-exactly (the warehouse admission
    * rule that excludes Misra–Gries), and the md5₆₀ family means a
    * DuckDB oracle replays every word — membership reads
    * ([[graft.ops.SketchStore.bloomContains]]) are fully
    * deterministic, no rows-only fallback needed. No false negatives
    * by construction; false-positive rate is the standard
    * (1 − e^(−kn/m))^k — size mBits to the expected membership.
    *
    * Unlike [[BloomSketch]] (the A5 reference-parity bitmap with the
    * reference's polynomial string hashes, which answers a CARDINALITY
    * question), this aggregator RETURNS the bit vector so it can be
    * persisted, merged, and probed as warehouse state.
    */
  case class BloomBits(mBits: Int = 4096, k: Int = 3)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      "mBits must be a power of two >= 64")
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(b: Array[Long], v: String): Array[Long] = {
      var i = 0
      while (i < k) {
        val p = (Md5Long60.hash(("bloom" + i + ":" + v)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)) % mBits).toInt
        b(p >>> 6) |= (1L << (p & 63))
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def bloomBits(c: Column, mBits: Int = 4096, k: Int = 3): Column =
    udaf(BloomBits(mBits, k), Encoders.STRING).apply(c)

  /** Merge of STORED Bloom bit vectors: bitwise OR — the
    * [[CmsMerge]]/[[HllMergeRegisters]] warehouse posture. Wrong-width
    * states fail loudly (an OR across widths would silently misalign
    * every later membership probe).
    */
  case class BloomMergeBits(mBits: Int = 4096)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      "mBits must be a power of two >= 64")
    private val words = mBits / 64
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], bits: Seq[Long]): Array[Long] = {
      require(bits.length == words,
        s"BloomMergeBits: stored state has ${bits.length} words, " +
          s"expected mBits/64 = $words")
      var i = 0
      while (i < b.length) { b(i) |= bits(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def bloomMergeBits(c: Column, mBits: Int = 4096): Column =
    udaf(BloomMergeBits(mBits),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(c)

  /** Merge of STORED HLL register vectors: element-wise max — the same
    * warehouse posture as [[KmvMergeHashes]]/[[CmsMerge]]. Malformed
    * states fail loudly (wrong length, rank out of range).
    */
  case class HllMergeRegisters(b: Int = 6)
      extends Aggregator[Seq[Long], Array[Byte], Seq[Long]] {
    require(b >= 4 && b <= 12, "b must be in [4, 12]")
    private val m = 1 << b
    private val maxRank = 61 - b
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(buf: Array[Byte], regs: Seq[Long]): Array[Byte] = {
      require(regs.length == m,
        s"HllMergeRegisters: stored state has ${regs.length} registers, expected $m")
      var i = 0
      while (i < m) {
        val r = regs(i)
        require(r >= 0L && r <= maxRank,
          s"HllMergeRegisters: register $i = $r outside [0, $maxRank]")
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
      buf
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Byte]): Seq[Long] = buf.map(_.toLong).toSeq
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def hllMergeRegisters(c: Column, b: Int = 6): Column =
    udaf(HllMergeRegisters(b),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(c)

  /** Point-estimate read over a [[countMin]] result: min over rows of
    * the addressed counters — the same md5₆₀ family evaluated as a
    * codegen'd column, so look-ups stay inside WholeStageCodegen.
    */
  def countMinEstimate(sketch: Column, term: Column,
                       depth: Int = 3, width: Int = 2048): Column = {
    val reads = (0 until depth).map { i =>
      element_at(sketch("counts"),
        (Hashing.md5Long(concat(lit(s"cms$i:"), term)) % width
          + lit(i * width) + 1).cast("int"))
    }
    if (reads.size == 1) reads.head else least(reads: _*)
  }
}
