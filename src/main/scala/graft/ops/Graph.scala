package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over candidate-pair graphs — the third member of
  * the graph family ([[Dedup.connectedComponents]] groups, [[
  * Dedup.labelPropagation]] communities, PageRank ranks WITHIN them:
  * e.g. picking the most-linked "canonical" document of a dup cluster).
  *
  * Fixed-point integer PageRank: ranks are BIGINT units of `1/scale`
  * (default 1e-9), contributions use integral division, and the damping
  * step is `(85 * Σ) div 100` — every intermediate is a positive
  * integer, so the result is independent of partitioning AND summation
  * order, and a SQL oracle replays it bit-for-bit (the q133/q137
  * entries; the same reason the LPA/CC twins hash). The floor divisions
  * leak a few units of probability mass per step — deterministic,
  * documented, and irrelevant to the ranking use.
  */
object Graph {

  /** PageRank over the undirected graph given as candidate `pairs`
    * (`aCol`, `bCol`) — edges are symmetrized and deduplicated, so
    * every node has out-degree >= 1 (no dangling-mass term needed).
    * Returns (id, rank_units) after `iters` synchronous power-iteration
    * rounds with damping 0.85: each round is one edges ⋈ ranks hash
    * join plus one hash aggregate on the destination — work ∝ |edges|,
    * hash-partitioned on node id, no Window, nothing driver-side.
    * Per-round frames are lazily pinned ([[Checkpoints.pin]], the
    * iterative-op discipline: an unpinned round would double the plan
    * per iteration).
    *
    * Overflow bound: the damping multiply needs `85 * N * scale <
    * 2^63`, i.e. N < 1.08e8 nodes at the default scale — pass
    * `scale = 1000000L` (still micro-rank resolution) for graphs up to
    * ~1e11 nodes.
    *
    * Integral division is truncation in Spark (`div`) and floor in the
    * DuckDB oracle (`//`) — identical on the all-positive values here.
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
               iters: Int = 3, scale: Long = 1000000000L,
               checkpointDir: Option[String] = None): DataFrame =
    power(pairs, aCol, bCol, lit(true), iters, scale, checkpointDir)

  /** Personalized PageRank: the teleport mass lands ONLY on the nodes
    * matching `seedPred` (a Column predicate over the node id column
    * `id` — e.g. `col("id").isin(seeds: _*)`, or any declarative rule),
    * and the initial mass starts there too, so after `iters` rounds
    * `rank_units` measures proximity to the seed set — the
    * "documents related to THESE documents" walk, where [[pageRank]]
    * measures global centrality. A predicate rather than a literal
    * id list keeps the seed rule on the executors (no driver-side node
    * lookup) and lets the SQL oracle replay it verbatim. Nodes the walk
    * hasn't reached within `iters` rounds rank 0 (still emitted).
    */
  def personalizedPageRank(pairs: DataFrame, aCol: String, bCol: String,
                           seedPred: Column, iters: Int = 3,
                           scale: Long = 1000000000L,
                           checkpointDir: Option[String] = None): DataFrame =
    power(pairs, aCol, bCol, seedPred, iters, scale, checkpointDir)

  /** Weighted PageRank: each out-edge carries `weightCol` (positive
    * integers — e.g. the number of colliding LSH bands, q22's
    * `n_bands`), and a node's rank splits across neighbors
    * proportionally: contribution = `(r·w) div Σw_src`. Strong dup
    * links (many shared bands) pull more rank than a single-band
    * brush — the graph already knows edge strength; unweighted
    * PageRank throws it away. Duplicate (src, dst) pairs merge by
    * summing weights (deterministic). Same all-BIGINT arithmetic, same
    * oracle story; the extra overflow surface is `r·w`, so keep
    * max-weight · scale < 2^63 / 85 (band counts are single digits —
    * nowhere close).
    */
  def pageRankWeighted(pairs: DataFrame, aCol: String, bCol: String,
                       weightCol: String, iters: Int = 3,
                       scale: Long = 1000000000L,
                       checkpointDir: Option[String] = None): DataFrame =
    power(pairs, aCol, bCol, lit(true), iters, scale, checkpointDir,
      weightCol = Some(weightCol))

  /** DIRECTED weighted PageRank — the classic web-graph walk over an
    * edge list that already encodes direction (e.g. per-user session
    * TRANSITION counts: item i was followed by item j, w times): no
    * symmetrization — rank flows only along out-edges — and dangling
    * mass (a pure-sink node has no out-edges) DROPS rather than
    * redistributing: deterministic over textbook fidelity, the same
    * trade the div floors already make. Where [[pageRankWeighted]]
    * ranks centrality in an undirected similarity graph, this ranks
    * flow in a browse/citation graph — "which items anchor the
    * journey", the q208 read. Same all-BIGINT loop, same per-round
    * join + hash-aggregate shape, same unrolled-CTE oracle story.
    */
  def pageRankDirected(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int = 3,
                       scale: Long = 1000000L,
                       checkpointDir: Option[String] = None): DataFrame =
    power(edges, srcCol, dstCol, lit(true), iters, scale, checkpointDir,
      weightCol = Some(weightCol), directed = true)

  private def power(pairs: DataFrame, aCol: String, bCol: String,
                    seedPred: Column, iters: Int, scale: Long,
                    checkpointDir: Option[String],
                    weightCol: Option[String] = None,
                    directed: Boolean = false): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(scale >= 100L && scale % 100L == 0L,
      "scale must be a positive multiple of 100 (exact damping arithmetic)")
    def pin(df: DataFrame): DataFrame =
      Checkpoints.pin(df, checkpointDir, eager = false)
    // weighted edges merge duplicate pairs by SUMMING weights;
    // unweighted edges dedup to unit weight — with w = 1 and sw = deg
    // the weighted arithmetic below degenerates to the classic
    // `r div deg`, so both paths share one loop (and one oracle shape)
    val edges = pin(weightCol match {
      case Some(w) =>
        // enforce the positive-INTEGER weight contract loudly (the
        // zValue raise_error convention): a null/zero/negative weight
        // would flow into `(r·w) div sw` — sw = 0 yields null
        // contributions silently dropped from the sum, corrupting
        // ranks with no error. The integrality check matters too: a
        // fractional 0.5 passes a raw `> 0` test but CASTS to 0,
        // reproducing exactly the silent sw = 0 corruption (r13
        // self-review)
        // (the === coerces both sides to the common type, so for a
        // double column this compares 0.5 to 0.0 — false — while a
        // genuine integer compares equal to itself)
        val wOk = when(col(w).isNotNull && col(w) > 0 &&
            col(w) === col(w).cast("long"),
            col(w).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"pageRankWeighted: $w must be a positive integer, got "),
            coalesce(col(w).cast("string"), lit("NULL")))))
        val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"),
          wOk.as("w"))
        (if (directed) fwd
         else fwd.unionByName(pairs.select(col(bCol).as("src"),
           col(aCol).as("dst"), wOk.as("w"))))
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      case None =>
        val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        (if (directed) fwd
         else fwd.unionByName(pairs.select(col(bCol).as("src"),
           col(aCol).as("dst"))))
          .distinct().withColumn("w", lit(1L))
    })
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("sw"))
    // (src, dst, w, Σw of src), built once and reused every round
    val edgesW = pin(edges.join(deg, "src"))
    // a DIRECTED graph has pure-sink nodes that never appear as src;
    // a symmetrized one cannot, so src alone covers it
    val nodes = pin(
      (if (directed) edges.select(col("src").as("id"))
        .unionByName(edges.select(col("dst").as("id")))
       else edges.select(col("src").as("id"))).distinct())
    val baseCol = when(seedPred, lit(15L * scale / 100L)).otherwise(lit(0L))
    var ranks = nodes.select(col("id"),
      when(seedPred, lit(scale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val inbound = edgesW
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("(r * w) div sw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      // left join keeps nodes with no in-edges at the base rank; on a
      // symmetrized graph none exist, but the contract shouldn't care
      ranks = pin(nodes
        .join(inbound.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (baseCol + expr("(85 * coalesce(m, 0L)) div 100")).as("r")))
    }
    ranks.select(col("id"), col("r").as("rank_units"))
  }

  /** Per-node triangle counts via DEGREE-ORIENTED wedge closing — the
    * clustering/cohesion read of the graph family, in the shape that
    * survives scale: symmetrize + dedupe the edge set, orient every
    * edge from its (degree, id)-smaller endpoint (a total order, so
    * each undirected edge appears exactly once and each triangle is
    * counted exactly once as its unique oriented wedge), enumerate
    * wedges by self-joining oriented edges on the source, and close
    * them against the oriented edge set. Out-degree under degree
    * orientation is O(√|E|), so the wedge count is bounded by
    * Σ out-deg² — the classic bound that makes this feasible where a
    * naive 3-way join on the raw edges is not; every step is an
    * equi-join or hash aggregate on node keys (no Window, nothing
    * driver-side). Self-loops drop; only triangle members emit (a
    * node with zero triangles is observable by absence, matching the
    * SQL oracle's shape).
    */
  /** Canonical undirected edge set: (min, max) pairs, deduped,
    * self-loops and null endpoints dropped — shared by the triangle /
    * coefficient / k-core family so they cannot disagree on what an
    * edge is.
    */
  private def undirectedEdges(pairs: DataFrame, aCol: String,
                              bCol: String): DataFrame =
    pairs.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()

  private def nodeDegrees(und: DataFrame): DataFrame =
    und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))

  /** Per-slice transition-EDGE counts — the hourCountSlices pattern
    * applied to the graph's edge list (the edge WAREHOUSE): each slice
    * of the pair log aggregates independently to (slice, src, dst, w)
    * rows, written once at ingest; [[edgeMerge]] folds any subset back
    * into the (src, dst, w) edge frame every graph read consumes. At
    * 100 TB the edge store IS the graph — the per-user ordering Window
    * that derives transitions from the raw event log runs once per
    * slice at ingest, never per query.
    */
  def edgeSlices(pairs: DataFrame, srcCol: String, dstCol: String,
                 sliceCol: String): DataFrame =
    pairs.groupBy(col(sliceCol).as("slice"), col(srcCol).as("src"),
        col(dstCol).as("dst"))
      .agg(count(lit(1)).as("w"))

  /** Fold stored edge slices back to the weighted edge frame — an
    * associative count sum, so any slice split (and any compaction of
    * slices) merges to what one pass over the full pair log counts.
    * Consumers: [[pageRankDirected]] takes (src, dst, w) directly;
    * the undirected family ([[triangles]], [[kCorePeel]], …) takes
    * (src, dst) as its pair columns — their internal symmetrize +
    * dedup makes the weights' presence harmless.
    *
    * Retractions ([[edgeTombstones]]) cancel ingested counts to
    * exactly 0 — a fully-retracted edge drops here; a NEGATIVE sum
    * means a retraction without a matching ingest (a data bug) and
    * raises loudly rather than serving phantom edges (the
    * indexMergeSlices posture applied to the edge store).
    */
  def edgeMerge(slices: DataFrame): DataFrame =
    slices.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("_w"))
      .select(col("src"), col("dst"),
        when(col("_w") >= 0, col("_w"))
          .otherwise(raise_error(concat(
            lit("edgeMerge: negative merged weight for edge "),
            col("src").cast("string"), lit(" -> "),
            col("dst").cast("string"),
            lit(" — retraction without matching ingest")))).as("w"))
      .filter(col("w") > 0)

  /** Incremental edge-warehouse ingest — [[graft.ops.TextAnalysis
    * .indexIngest]] for the edge store: aggregate ONLY the new pair
    * slice through [[edgeSlices]] (the same one code path as batch
    * build) and APPEND its rows to the src-bucketed table; history
    * files stay untouched, and Spark validates the bucket spec so a
    * mismatched layout fails loudly. STREAMING: call per micro-batch
    * inside `foreachBatch` with slice = batch id (the jobs
    * .ServingWarehouse wiring; StreamingSpec pins per-batch ingest ≡
    * one-shot batch slices).
    */
  def edgeIngest(pairs: DataFrame, srcCol: String, dstCol: String,
                 sliceCol: String, table: String, buckets: Int): Unit =
    Bucketing.appendBucketed(edgeSlices(pairs, srcCol, dstCol, sliceCol),
      table, Seq("src"), buckets, sortCols = Seq("src"))

  /** Retraction slices — the DELETE path of the edge warehouse (the
    * LSM posture: deletes append, history files stay untouched): the
    * retracted pair log re-aggregated with NEGATED counts, so the
    * [[edgeMerge]] sum cancels its contribution to exactly zero.
    * Requires the retraction to carry the SAME pairs the ingest saw
    * (content-addressed — a partial retraction cancels partially); an
    * unmatched retraction drives a weight negative and raises at
    * merge. Work ∝ retracted pairs only.
    */
  def edgeTombstones(pairs: DataFrame, srcCol: String, dstCol: String,
                     sliceCol: String): DataFrame =
    edgeSlices(pairs, srcCol, dstCol, sliceCol)
      .select(col("slice"), col("src"), col("dst"), (-col("w")).as("w"))

  /** Compact edge slices into ONE replacement slice: the merged
    * counts re-tagged with a fresh slice id — sum-merge associativity
    * makes compaction commute with reads (the indexCompact contract).
    */
  def edgeCompact(slices: DataFrame, newSlice: Long): DataFrame =
    edgeMerge(slices).select(lit(newSlice).as("slice"), col("src"),
      col("dst"), col("w"))

  /** [[edgeCompact]] CLOSED UNDER RETRACTIONS (the
    * [[graft.ops.TextAnalysis.indexCompactPartial]] posture for the
    * edge family): a compaction plan may bin a retraction slice apart
    * from the ingest slices it cancels — the strict [[edgeMerge]]
    * would raise there, so the per-bin fold preserves negative
    * partial weights as retraction rows (exact zeros drop) and the
    * integrity raise stays at the read-time global merge. Exact by
    * sum associativity.
    */
  def edgeCompactPartial(slices: DataFrame, newSlice: Long): DataFrame =
    slices.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .filter(col("w") =!= 0)
      .select(lit(newSlice).as("slice"), col("src"), col("dst"),
        col("w"))

  def triangles(pairs: DataFrame, aCol: String, bCol: String,
                checkpointDir: Option[String] = None): DataFrame =
    triangleCounts(Checkpoints.pin(undirectedEdges(pairs, aCol, bCol),
      checkpointDir, eager = false), checkpointDir)

  /** Triangle counting over an already-pinned canonical edge frame —
    * `und` and the oriented edges are each referenced several times
    * downstream, so both are lineage-pinned (the q198/pageRank
    * discipline: an unpinned frame re-derives its whole upstream —
    * including the caller's edge-building Window — once per
    * reference; the q225 plan held 45 copies of it before the pin).
    */
  private def triangleCounts(und: DataFrame,
                             checkpointDir: Option[String]): DataFrame = {
    val deg = nodeDegrees(und)
    val oriented = Checkpoints.pin(und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("dv").as("d"), col("v").as("n")))
          .otherwise(struct(col("du").as("d"), col("u").as("n")))
          .as("tord"))
      .select(col("s"), col("tord").getField("n").as("t"), col("tord")),
      checkpointDir, eager = false)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.tord") < col("e2.tord"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    val tri = wedges.join(oriented.select(col("s").as("b"), col("t").as("c")),
      Seq("b", "c"))
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient — [[triangles]] normalized by the
    * wedge capacity: `2·tri / (deg·(deg−1))` per node with degree ≥ 2
    * (degree-1 nodes have no wedges; they are observable by absence,
    * like zero-triangle nodes in [[triangles]] — here they DO emit,
    * with triangles = 0, because "how clustered is this hub" is a
    * question about every node with ≥ 2 neighbors). Counts are exact
    * integers; the coefficient is ONE correctly-rounded division —
    * bit-identical cross-engine (the q206 rule).
    */
  def clusteringCoefficient(pairs: DataFrame, aCol: String, bCol: String,
                            checkpointDir: Option[String] = None): DataFrame = {
    val und = Checkpoints.pin(undirectedEdges(pairs, aCol, bCol),
      checkpointDir, eager = false)
    val tri = triangleCounts(und, checkpointDir)
    nodeDegrees(und).filter(col("deg") >= 2L)
      .select(col("id").as("node"), col("deg"))
      .join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coefficient",
        round((lit(2L) * col("triangles")).cast("double") /
          (col("deg") * (col("deg") - 1L)).cast("double"), 6))
  }

  /** `rounds` synchronized k-core PEELING rounds: each round drops
    * every node whose degree in the SURVIVING graph is < k, then the
    * edges incident to dropped nodes. After a fixed number of rounds
    * the result is deterministic whether or not the peel has reached
    * its fixpoint, and the `converged` column SAYS which (true = the
    * last round dropped nobody, so this IS the k-core; false = an
    * approximation — rerun with more rounds): the observable-cap rule
    * applied to iteration counts. Emits surviving (node, deg,
    * converged).
    *
    * Shape: per round, one degree hash aggregate + two semi-joins to
    * keep edges whose BOTH endpoints survive — work ∝ surviving
    * |E| per round, lineage-pinned like the PageRank loop; no Window,
    * nothing driver-side.
    */
  def kCorePeel(pairs: DataFrame, aCol: String, bCol: String, k: Int,
                rounds: Int,
                checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    def pin(df: DataFrame): DataFrame =
      Checkpoints.pin(df, checkpointDir, eager = false)
    var edges = pin(undirectedEdges(pairs, aCol, bCol))
    var lastDropped: DataFrame = null
    for (_ <- 1 to rounds) {
      val surv = nodeDegrees(edges).filter(col("deg") >= k)
        .select(col("id"))
      lastDropped = nodeDegrees(edges).filter(col("deg") < k)
      edges = pin(edges
        .join(surv.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(surv.withColumnRenamed("id", "v"), Seq("v"), "left_semi"))
    }
    val converged = lastDropped.agg(
      (count(lit(1)) === 0L).as("converged"))
    nodeDegrees(edges).select(col("id").as("node"), col("deg"))
      .crossJoin(broadcast(converged))
  }

  /** k-hop BFS distances from a seed set over the canonical undirected
    * graph — "everything within k hops of the flagged nodes", the
    * fraud-ring / blast-radius read. Synchronous frontier expansion
    * over `rounds` fixed iterations: round r expands ONLY the
    * dist = r−1 frontier against the adjacency (earlier-settled nodes
    * are already expanded — BFS's invariant that the first visit is
    * the shortest) and min-folds into the settled frame. Emits
    * (node, dist ≤ rounds); seeds at 0 even when isolated; unreached
    * nodes are absent, not ∞ — the result stays |reached|-sized.
    *
    * Shape per round: one hash equi-join frontier ⋈ adjacency + one
    * hash aggregate — the Pregel BFS superstep as DataFrame ops, work
    * ∝ edges incident to the frontier; per-round frames are
    * lineage-pinned (the pageRank discipline — unpinned, the plan
    * doubles per round).
    */
  def kHopDistances(pairs: DataFrame, aCol: String, bCol: String,
                    seeds: DataFrame, seedCol: String, rounds: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val und = undirectedEdges(pairs, aCol, bCol)
    val adj = Checkpoints.pin(
      und.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(und.select(col("v").as("src"), col("u").as("dst"))),
      checkpointDir, eager = false)
    var dist = Checkpoints.pin(
      seeds.select(col(seedCol).as("node"))
        .filter(col("node").isNotNull).distinct()
        .withColumn("dist", lit(0L)),
      checkpointDir, eager = false)
    for (r <- 1 to rounds) {
      val next = dist.filter(col("dist") === (r - 1).toLong)
        .join(adj, col("node") === col("src"))
        .select(col("dst").as("node"), lit(r.toLong).as("dist"))
      dist = Checkpoints.pin(
        dist.unionAll(next).groupBy(col("node"))
          .agg(min(col("dist")).as("dist")),
        checkpointDir, eager = false)
    }
    dist
  }
}
