package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** Specs for the DIRECTED PageRank member of the graph family (the
  * undirected/personalized/weighted members are covered by the
  * q133/q137/q149 oracles and DedupSpec's CC/LPA twins).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int) =
    Graph.pageRankDirected(edges.toDF("src", "dst", "w"), "src", "dst",
        "w", iters, scale = 1000000L)
      .as[(Long, Long)].collect().toMap

  test("pageRankDirected: hand-traced two iterations on a weighted triangle") {
    // W_out: 1→{2,3} = 2, 2→{3} = 1, 3→{1 (w2)} = 2; micro-scale init
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 2L))
    // iter1: in(1)=1e6, in(2)=5e5, in(3)=1.5e6
    //   → r1 = (1e6, 575000, 1425000)
    // iter2: in(1)=1425000, in(2)=500000, in(3)=500000+575000
    //   → r2 = (1361250, 575000, 1063750)
    assert(ranks(edges, 1) ===
      Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    assert(ranks(edges, 2) ===
      Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRankDirected: direction respected — sink keeps no out-flow, source decays to base") {
    // 1→2 only: node 1 has no in-edges → base 150000 after one round;
    // node 2 is a pure SINK (would not even be a node if the graph
    // were read undirected-src-only) — its mass drops, not recycles
    val edges = Seq((1L, 2L, 1L))
    assert(ranks(edges, 1) === Map(1L -> 150000L, 2L -> 1000000L))
    // iter2: in(2) = (150000·1) div 1 → 150000 + 127500
    assert(ranks(edges, 2) === Map(1L -> 150000L, 2L -> 277500L))
  }

  test("pageRankDirected: rank is partition-layout independent; duplicate edges merge") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L),
      (2L, 1L, 5L), (3L, 2L, 1L))
    val a = ranks(edges, 3)
    val b = Graph.pageRankDirected(
        edges.toDF("src", "dst", "w").repartition(7), "src", "dst", "w",
        iters = 3, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    // duplicated (src,dst) rows sum their weights — same totals either way
    val dup = edges ++ Seq((1L, 2L, 0L)) // zero weight raises loudly
    val e = intercept[Exception] { ranks(dup, 1) }
    assert(e.getMessage.contains("positive integer"))
    val merged = ranks(Seq((1L, 2L, 2L), (1L, 2L, 1L), (2L, 1L, 3L)), 2)
    assert(merged === ranks(Seq((1L, 2L, 3L), (2L, 1L, 3L)), 2))
  }

  test("triangles: square-with-diagonal hand trace; duplicates, reversals and self-loops drop") {
    // square 1-2-3-4 with diagonal 1-3: triangles (1,2,3) and (1,3,4);
    // nodes 1 and 3 sit in both, 2 and 4 in one each. Noise: the 2-3
    // edge repeated, 4-1 given reversed, a self-loop, a pendant 4-5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L), (1L, 4L),
      (1L, 3L), (2L, 2L), (4L, 5L))
    val got = Graph.triangles(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    // triangle-free graph (a path) emits nothing
    assert(Graph.triangles(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"),
      "a", "b").count() === 0L)
    // counts are partition-layout independent
    val rep = Graph.triangles(edges.toDF("a", "b").repartition(7),
      "a", "b").as[(Long, Long)].collect().toMap
    assert(rep === got)
  }

  test("clusteringCoefficient: 2T/(d(d-1)) hand trace; zero-triangle hubs emit, degree-1 nodes don't") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L),
      (4L, 5L))
    val got = Graph.clusteringCoefficient(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      1L -> ((3L, 2L, 0.666667)), // both triangles, 3 wedge pairs
      2L -> ((2L, 1L, 1.0)),      // its single wedge closes
      3L -> ((3L, 2L, 0.666667)),
      4L -> ((3L, 1L, 0.333333)))) // pendant edge dilutes; node 5 absent
    // a star: hub has wedges but no closures — emits 0.0, not nothing
    val star = Graph.clusteringCoefficient(
        Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(star === Seq((1L, 3L, 0L, 0.0)))
  }

  test("kCorePeel: cascade peels pendants round by round; converged flag tells fixpoint from cutoff") {
    // triangle {1,2,3} with a tail 3-4-5: k=2 peels 5 (round 1) then
    // the newly-pendant 4 (round 2); round 3 drops nobody → converged
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val r3 = Graph.kCorePeel(edges.toDF("a", "b"), "a", "b",
        k = 2, rounds = 3)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(r3 === Set((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
    // stopping one round early: same survivors, but the flag says the
    // peel was still moving — an approximation, not the k-core
    val r2 = Graph.kCorePeel(edges.toDF("a", "b"), "a", "b",
        k = 2, rounds = 2)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(r2 === Set((1L, 2L, false), (2L, 2L, false), (3L, 2L, false)))
    // k above the max degree empties the graph
    assert(Graph.kCorePeel(edges.toDF("a", "b"), "a", "b",
      k = 5, rounds = 2).count() === 0L)
  }

  test("kHopDistances: BFS settles shortest hop counts; isolated seed emits 0; horizon truncates") {
    // path 1-2-3-4-5 plus shortcut 1-4: seed {1} reaches 4 in 2 via
    // the shortcut (not 3 via the path); seed 9 is isolated (not in
    // the graph) and still emits dist 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("a", "b")
    val seeds = Seq(1L, 9L).toDF("id")
    val r3 = Graph.kHopDistances(edges, "a", "b", seeds, "id", rounds = 3)
      .as[(Long, Long)].collect().toSet
    assert(r3 === Set((1L, 0L), (9L, 0L), (2L, 1L), (4L, 1L),
      (3L, 2L), (5L, 2L)))
    // horizon 1: only the direct neighbors settle — 3 and 5 absent,
    // not infinity (the |reached|-sized contract)
    val r1 = Graph.kHopDistances(edges, "a", "b", seeds, "id", rounds = 1)
      .as[(Long, Long)].collect().toSet
    assert(r1 === Set((1L, 0L), (9L, 0L), (2L, 1L), (4L, 1L)))
    // two seeds: every node takes the NEAREST seed's distance
    val two = Graph.kHopDistances(edges, "a", "b",
        Seq(1L, 5L).toDF("id"), "id", rounds = 2)
      .as[(Long, Long)].collect().toSet
    assert(two === Set((1L, 0L), (5L, 0L), (2L, 1L), (4L, 1L),
      (3L, 2L)))
    intercept[IllegalArgumentException] {
      Graph.kHopDistances(edges, "a", "b", seeds, "id", rounds = 0)
    }
  }

  test("edge warehouse: slice-merge ≡ one-pass counts for any split; reads agree store vs raw pairs") {
    // pair log with duplicates ACROSS the slice boundary — the merge
    // must sum per (src, dst) exactly what one pass counts
    val pairs = Seq(
      (1L, 2L, 0L), (1L, 2L, 1L), (1L, 2L, 2L), // spans all 3 slices
      (2L, 3L, 0L), (2L, 3L, 0L),               // duplicate within one
      (3L, 1L, 1L), (1L, 3L, 2L))
      .toDF("a", "b", "slice")
    val merged = Graph.edgeMerge(
        Graph.edgeSlices(pairs, "a", "b", "slice"))
      .as[(Long, Long, Long)].collect().toSet
    val onePass = pairs.groupBy($"a".as("src"), $"b".as("dst"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged === onePass &&
      merged.contains((1L, 2L, 3L)) && merged.contains((2L, 3L, 2L)))
    // a weighted read (PageRank) and an undirected read (triangles)
    // agree between the store form and the raw pair log
    val rawPairs = pairs.select($"a", $"b")
    val storeEdges = Graph.edgeMerge(
      Graph.edgeSlices(pairs, "a", "b", "slice"))
    val prStore = Graph.pageRankDirected(storeEdges, "src", "dst", "w",
      iters = 2, scale = 1000000L).as[(Long, Long)].collect().toMap
    val prRaw = Graph.pageRankDirected(
      rawPairs.groupBy($"a".as("src"), $"b".as("dst"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("w")),
      "src", "dst", "w", iters = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(prStore === prRaw)
    val triStore = Graph.triangles(storeEdges, "src", "dst")
      .as[(Long, Long)].collect().toSet
    val triRaw = Graph.triangles(rawPairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(triStore === triRaw && triStore.nonEmpty)
  }

  test("edge warehouse deletes/compaction: retractions cancel to zero, unmatched retraction raises, compaction commutes") {
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("a", "b").withColumn("slice",
        org.apache.spark.sql.functions.lit(0L))
    val ingest = Graph.edgeSlices(pairs, "a", "b", "slice")
    // retract ONE of the two (1→2) ingests and the whole (2→3) edge
    val retract = Graph.edgeTombstones(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b").withColumn("slice",
        org.apache.spark.sql.functions.lit(1L)),
      "a", "b", "slice")
    val merged = Graph.edgeMerge(ingest.unionByName(retract))
      .as[(Long, Long, Long)].collect().toSet
    // (1→2) drops to weight 1; (2→3) cancels to exactly zero and drops
    assert(merged === Set((1L, 2L, 1L), (3L, 1L, 1L), (1L, 3L, 1L)))
    // a retraction with no matching ingest raises at merge
    val phantom = Graph.edgeTombstones(
      Seq((9L, 9L)).toDF("a", "b").withColumn("slice",
        org.apache.spark.sql.functions.lit(2L)),
      "a", "b", "slice")
    val e = intercept[Exception] {
      Graph.edgeMerge(ingest.unionByName(phantom)).collect()
    }
    assert(e.getMessage.contains("retraction") ||
      e.getCause != null && e.getCause.getMessage.contains("retraction"))
    // compaction commutes: compact(ingest) ∪ retract merges the same
    val viaCompact = Graph.edgeMerge(
        Graph.edgeCompact(ingest, newSlice = 100L).unionByName(retract))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaCompact === merged)
  }
}
