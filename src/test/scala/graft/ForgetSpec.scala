package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Forget, TextAnalysis}

/** Specs for the erasure cascade ([[Forget]]) and the slice-derived
  * dictionary tier ([[TextAnalysis.dictSlices]] family) — the round's
  * deployment-lifecycle additions.
  */
class ForgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b a steam"), (2L, "b a b c stream"), (3L, "c a b esteem"),
    (4L, "a b steam"), (5L, "b c b c a b")).toDF("doc_id", "text")

  private def sliced = corpus.withColumn("slice", pmod($"doc_id", lit(2)))

  // ---------------- dictionary slice family ----------------

  test("dictMergeSlices(dictSlices(...)) ≡ termDictionary over merged postings, per generation and after a tombstone") {
    val ing = TextAnalysis.indexSlices(sliced, "doc_id", "text", "slice")
    // generation read (slice 0 only) and the full fold both match the
    // postings-derived dictionary over the same subset
    for (frame <- Seq(ing, ing.filter($"slice" === 0))) {
      val viaSlices = TextAnalysis.dictMergeSlices(
          TextAnalysis.dictSlices(frame))
        .as[(String, Long, Long)].collect().toSet
      val rebuilt = TextAnalysis.termDictionary(
          TextAnalysis.indexMergeSlices(frame))
        .as[(String, Long, Long)].collect().toSet
      assert(viaSlices === rebuilt)
    }
    // tombstone: doc 2 erased — the delta fold must equal the
    // dictionary rebuilt from corpus-minus, including the extinction
    // of "stream" (only doc 2 holds it)
    val tomb = TextAnalysis.indexTombstones(
      corpus.filter($"doc_id" === 2).withColumn("slice", lit(9L)),
      "doc_id", "text", "slice")
    val viaSlices = TextAnalysis.dictMergeSlices(
        TextAnalysis.dictSlices(ing.unionByName(tomb)))
      .as[(String, Long, Long)].collect().toSet
    val rebuilt = TextAnalysis.termDictionary(
        TextAnalysis.indexMergeSlices(
          TextAnalysis.indexSlices(
            sliced.filter($"doc_id" =!= 2), "doc_id", "text", "slice")))
      .as[(String, Long, Long)].collect().toSet
    assert(viaSlices === rebuilt)
    assert(!viaSlices.exists(_._1 == "stream")) // extinct term dropped
  }

  test("delneigh/tgram slice folds ≡ rebuilt neighborhood stores, incl. tombstoned terms dropping with their expansions") {
    val ing = TextAnalysis.indexSlices(sliced, "doc_id", "text", "slice")
    val tomb = TextAnalysis.indexTombstones(
      corpus.filter($"doc_id" === 2).withColumn("slice", lit(9L)),
      "doc_id", "text", "slice")
    val dslices = TextAnalysis.dictSlices(ing.unionByName(tomb))
    val dict = TextAnalysis.dictMergeSlices(dslices)
    assert(
      TextAnalysis.delneighMergeSlices(TextAnalysis.delneighSlices(dslices))
        .as[(String, String, Long)].collect().toSet ===
      TextAnalysis.deletionNeighborhood(dict)
        .as[(String, String, Long)].collect().toSet)
    assert(
      TextAnalysis.tgramMergeSlices(TextAnalysis.tgramSlices(dslices))
        .as[(String, String, Long)].collect().toSet ===
      TextAnalysis.trigramNeighborhood(dict.filter(length($"token") >= 3))
        .as[(String, String, Long)].collect().toSet)
    // the erased doc's unique term left no trace in either expansion
    assert(TextAnalysis.tgramMergeSlices(TextAnalysis.tgramSlices(dslices))
      .filter($"token" === "stream").isEmpty)
  }

  test("dictMergeSlices raises on a tombstone without a matching ingest") {
    val orphan = TextAnalysis.dictSlices(TextAnalysis.indexTombstones(
      Seq((9L, "ghost")).toDF("doc_id", "text")
        .withColumn("slice", lit(0L)),
      "doc_id", "text", "slice"))
    val e = intercept[Exception] {
      TextAnalysis.dictMergeSlices(orphan).collect()
    }
    assert(e.getMessage.contains("dictMergeSlices"))
  }

  // ---------------- erasure cascade ----------------

  test("rowErase drops exactly the forgotten keys; familyAudit's removed count matches what rowErase sheds") {
    val store = Seq((1L, "x"), (2L, "y"), (2L, "z"), (3L, "w"))
      .toDF("doc_id", "v")
    val forget = Seq(2L).toDF("doc_id")
    val surv = Forget.rowErase(store, "doc_id", forget)
      .as[(Long, String)].collect().toSet
    assert(surv === Set((1L, "x"), (3L, "w")))
    val audit = Forget.familyAudit("f", store, "doc_id", forget)
      .as[(String, Long, Long, Long)].collect().head
    assert(audit === (("f", 4L, 2L, 2L)))
    assert(audit._4 === surv.size.toLong)
  }

  test("dupMapErase: members drop, reps reassign to the min surviving member, sub-pair groups vanish — no forgotten id survives as member or label") {
    // group A: rep 1 with members 1,2,5 (1 forgotten → new rep 2)
    // group B: rep 3 with members 3,4 (4 forgotten → singleton drops)
    val dupMap = Seq((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "rep")
    val forget = Seq(1L, 4L).toDF("doc_id")
    val out = Forget.dupMapErase(dupMap, forget)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((2L, 2L), (5L, 2L)))
    val ids = out.flatMap(p => Seq(p._1, p._2))
    assert(!ids.contains(1L) && !ids.contains(4L))
  }

  test("erase: every family's frame serves corpus-minus-F — merged index/chunk postings, positional survivors, row stores, dup map") {
    val forgottenIds = Seq(2L)
    val forgotten = corpus.filter($"doc_id".isin(forgottenIds: _*))
    val survivors = sliced.filter(!$"doc_id".isin(forgottenIds: _*))
    val index = TextAnalysis.indexSlices(sliced, "doc_id", "text", "slice")
    val positional =
      TextAnalysis.positionalSlices(sliced, "doc_id", "text", "slice")
    val chunks = TextAnalysis.indexSlices(
      Stores.chunkCids(corpus).withColumn("slice", lit(0L)),
      "cid", "chunk", "slice")
    val norms = TextAnalysis.docNorms(corpus, "doc_id", "text")
    val meta = corpus.select($"doc_id", lit("en").as("lang"))
    val facets = meta.select($"doc_id", lit("lang").as("facet"),
      $"lang".as("value"))
    val codes = corpus.select($"doc_id".as("vec_id"), lit(0).as("sub"),
      lit(1).as("code"))
    val dupMap = Seq((1L, 1L), (2L, 1L), (4L, 1L)).toDF("doc_id", "rep")
    val e = Forget.erase(index, positional, chunks, norms, meta, facets,
      codes, dupMap, forgotten, tombSlice = 99L)
    // index: merged postings ≡ postings of the surviving corpus
    assert(TextAnalysis.indexMergeSlices(e.index)
      .as[(String, Long, Long)].collect().toSet ===
      TextAnalysis.indexMergeSlices(
        TextAnalysis.indexSlices(survivors, "doc_id", "text", "slice"))
        .as[(String, Long, Long)].collect().toSet)
    // chunks: same identity in the cid domain
    assert(TextAnalysis.indexMergeSlices(e.chunks)
      .as[(String, Long, Long)].collect().toSet ===
      TextAnalysis.indexMergeSlices(
        TextAnalysis.indexSlices(
          Stores.chunkCids(corpus.filter($"doc_id" =!= 2))
            .withColumn("slice", lit(0L)), "cid", "chunk", "slice"))
        .as[(String, Long, Long)].collect().toSet)
    // positional: merged survivors ≡ rescan of the surviving corpus
    assert(TextAnalysis.positionalMergeSlices(e.positional)
      .as[(String, Long, Long, Seq[Int])].collect().toSet ===
      TextAnalysis.positionalPostings(corpus.filter($"doc_id" =!= 2),
        "doc_id", "text")
        .as[(String, Long, Long, Seq[Int])].collect().toSet)
    // row stores: no forgotten id anywhere
    assert(e.norms.filter($"doc_id" === 2).isEmpty)
    assert(e.docMeta.filter($"doc_id" === 2).isEmpty)
    assert(e.facets.filter($"doc_id" === 2).isEmpty)
    assert(e.pqCodes.filter($"vec_id" === 2).isEmpty)
    // dup map: member 2 gone, group relabeled by min survivor (1)
    assert(e.dupMap.as[(Long, Long)].collect().toSet ===
      Set((1L, 1L), (4L, 1L)))
  }
}
