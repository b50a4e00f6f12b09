package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pq

/** Product quantization: codebook learning, encoding, ADC scoring, and
  * the IVF-PQ candidate restriction (ops/Pq.scala). Hand-computable
  * 2-dim corpus, m=2 subspaces of 1 dim each.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  // ids 0/1 seed the codebooks; 2 sits near 0, 3 near 1
  private val corpus = emb(
    0L -> Seq(0f, 0f), 1L -> Seq(10f, 10f),
    2L -> Seq(1f, 1f), 3L -> Seq(9f, 9f))

  test("iters=0 codebooks are the init subvectors; encoding assigns nearest code per subspace") {
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding", m = 2, subDim = 1,
      initIds = Seq(0L, 1L), iters = 0)
    val got = cbs.as[(Long, Long, Seq[Double])].collect().toSet
    assert(got === Set((0L, 0L, Seq(0.0)), (0L, 1L, Seq(10.0)),
      (1L, 0L, Seq(0.0)), (1L, 1L, Seq(10.0))))
    val codes = Pq.encode(corpus, "vec_id", "embedding", cbs, m = 2, subDim = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(codes === Set(
      (0L, 0L, 0L), (0L, 1L, 0L),   // vec 0 → code 0 in both subspaces
      (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 0L), (2L, 1L, 0L),   // 1 is nearer 0 than 10
      (3L, 0L, 1L), (3L, 1L, 1L)))
  }

  test("one Lloyd round moves codes to member means; ordered and default means agree on tiny groups") {
    // sub 0 members of code 0: values {0, 1} → 0.5; code 1: {10, 9} → 9.5
    val ord = Pq.codebooks(corpus, "vec_id", "embedding", 2, 1,
      Seq(0L, 1L), iters = 1, orderedMeans = true)
      .as[(Long, Long, Seq[Double])].collect().toSet
    val dft = Pq.codebooks(corpus, "vec_id", "embedding", 2, 1,
      Seq(0L, 1L), iters = 1)
      .as[(Long, Long, Seq[Double])].collect().toSet
    val want = Set((0L, 0L, Seq(0.5)), (0L, 1L, Seq(9.5)),
      (1L, 0L, Seq(0.5)), (1L, 1L, Seq(9.5)))
    assert(ord === want)
    assert(dft === want) // 1-2 member sums: no fold-order ambiguity
  }

  test("ADC distances are the exact reconstruction distances; rank ascending with id tie-break") {
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding", 2, 1,
      Seq(0L, 1L), iters = 0)
    val got = Pq.adcSearch(corpus, "vec_id", "embedding", cbs,
        queryIds = Seq(0L), k = 3, m = 2, subDim = 1)
      .as[(Long, Long, Double, Long)].collect().toSet
    // query (0,0): vec2 reconstructs to (0,0) → 0; vecs 1 and 3 to
    // (10,10) → 200; the 200-tie breaks on neighbor id
    assert(got === Set(
      (0L, 2L, 0.0, 1L), (0L, 1L, 200.0, 2L), (0L, 3L, 200.0, 3L)))
  }

  test("IVF-PQ: a candidate restriction scores only the given pairs") {
    val cbs = Pq.codebooks(corpus, "vec_id", "embedding", 2, 1,
      Seq(0L, 1L), iters = 0)
    val cand = Seq((0L, 1L), (0L, 3L)).toDF("query_id", "neighbor_id")
    val got = Pq.adcSearch(corpus, "vec_id", "embedding", cbs,
        queryIds = Seq(0L), k = 5, m = 2, subDim = 1,
        candidates = Some(cand))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got === Set((0L, 1L, 200.0, 1L), (0L, 3L, 200.0, 2L)))
  }

  test("residual IVF-PQ: zero residuals for centroids; list-local LUT restricts to probed lists") {
    val coarse = emb(0L -> Seq(0f, 0f), 1L -> Seq(10f, 10f))
      .select($"vec_id".as("centroid_id"), $"embedding".as("c_vec"))
    val res = Pq.residuals(corpus, "vec_id", "embedding", coarse)
    val gotRes = res.as[(Long, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // centroids reconstruct themselves: residual exactly zero
    assert(gotRes(0L) === ((0L, Seq(0.0, 0.0))))
    assert(gotRes(1L) === ((1L, Seq(0.0, 0.0))))
    assert(gotRes(2L) === ((0L, Seq(1.0, 1.0))))   // 2 lives in list 0
    assert(gotRes(3L) === ((1L, Seq(-1.0, -1.0)))) // 3 in list 1
    // codebooks from the two nonzero residuals; query 0 probes only
    // its own list (nprobe=1) → neighbor 2 scored, list-1 members not
    val cbs = Pq.codebooks(res, "vec_id", "rvec", m = 2, subDim = 1,
      initIds = Seq(2L, 3L), iters = 0)
    val got = Pq.ivfPqSearch(corpus, "vec_id", "embedding", coarse, cbs,
        queryIds = Seq(0L), k = 5, nprobe = 1, m = 2, subDim = 1)
      .as[(Long, Long, Double, Long)].collect().toSet
    // q0 residual (0,0) vs neighbor 2's codeword (1,1): 1² + 1² = 2
    assert(got === Set((0L, 2L, 2.0, 1L)))
  }

  test("rerankExact: exact cosine over only the shortlist pairs, shared tie-break") {
    // query 2's shortlist omits nothing it shouldn't: vec 0 is the
    // zero vector (excluded by the norm guard); the pairs given are
    // the ONLY pairs scored — rerank never resurrects a missing
    // candidate: recall is shortlist coverage
    val shortlist = Seq((2L, 1L), (2L, 3L)).toDF("query_id", "neighbor_id")
    val got = graft.ops.Similarity.rerankExact(shortlist, corpus,
        "vec_id", "embedding", k = 2)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((2L, 1L), (2L, 3L)))
    // parallel vectors: cosine exactly 1.0 for both pairs; tie breaks
    // by neighbor id ascending (vec 1 before vec 3)
    assert(got.forall(_._3 === 1.0))
    // exact scores agree with the brute-force path on the same pairs
    val bf = graft.ops.Similarity.cosineKnn(corpus, "vec_id", "embedding",
        Seq(2L), k = 3)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { r => assert(r._3 === bf((r._1, r._2))) }
  }

  test("guards: k, m/subDim, initIds, iters") {
    intercept[IllegalArgumentException] {
      Pq.codebooks(corpus, "vec_id", "embedding", 0, 1, Seq(0L), 1)
    }
    intercept[IllegalArgumentException] {
      Pq.codebooks(corpus, "vec_id", "embedding", 2, 1, Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      Pq.codebooks(corpus, "vec_id", "embedding", 2, 1, Seq(0L), -1)
    }
    intercept[IllegalArgumentException] {
      Pq.adcSearch(corpus, "vec_id", "embedding",
        Pq.codebooks(corpus, "vec_id", "embedding", 2, 1, Seq(0L), 0),
        Seq(0L), 0, 2, 1)
    }
  }
}
