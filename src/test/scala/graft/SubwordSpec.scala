package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubwordCount
import graft.ops.TextAnalysis

/** Greedy longest-match subword counting (functions/SubwordCount.scala)
  * and the corpus-derived vocabulary (TextAnalysis.subwordVocab).
  */
class SubwordSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val vocab = Seq("the", "sis", "in", "inn")

  private def countOf(text: String, v: Seq[String] = vocab): Long =
    Seq(text).toDF("t")
      .select(SubwordCount(spark, col("t"), v).as("n"))
      .as[Long].head()

  test("greedy longest-match per word with single-char fallback") {
    assert(countOf("thesis") === 2L)     // the + sis
    assert(countOf("innthe") === 2L)     // inn (longest, not in) + the
    assert(countOf("inthesis") === 3L)   // in + the + sis
    assert(countOf("xyz") === 3L)        // three fallback chars
    assert(countOf("thesis innthe xyz inthesis") === 10L)
  }

  test("spaces delimit words; empty text and space runs count nothing") {
    assert(countOf("") === 0L)
    assert(countOf("   ") === 0L)
    assert(countOf("a  b") === 2L)       // fallback chars; empty word free
    // pieces never cross a space: "the sis" is the + sis, not a
    // 7-char "thesis"-spanning match
    assert(countOf("the sis") === 2L)
    assert(countOf("ab", Seq("ab")) === 1L)
  }

  test("vocab must be a literal array; wrong arity fails cleanly") {
    val df = Seq(("x", Seq("x"))).toDF("t", "v")
    val e = intercept[AnalysisException] {
      df.select(call_function("subword_count", col("t"), col("v"))).collect()
    }
    assert(e.getMessage.contains("literal"))
    SubwordCount.ensureRegistered(spark)
    val a = intercept[AnalysisException] {
      spark.sql("SELECT subword_count('x')").collect()
    }
    assert(a.getMessage.contains("subword_count"))
    // SQL registration round-trip
    assert(spark.sql("SELECT subword_count('ab cd', array('ab')) AS n")
      .as[Long].head() === 3L)            // ab + c + d
  }

  test("broadcast-bound form: same counts as literal; plan size O(1) in |vocab|") {
    // identical counts on the shared test vocab, interpreted + codegen
    val texts = Seq("thesis", "innthe", "inthesis", "xyz", "the sis", "a  b")
    val df = texts.toDF("t")
    val lit = df.select(SubwordCount(spark, col("t"), vocab).as("n"))
      .as[Long].collect().toSeq
    val bc = df.select(SubwordCount.broadcastBound(spark, col("t"), vocab).as("n"))
      .as[Long].collect().toSeq
    assert(bc === lit)

    // a 50k-piece vocabulary: the literal plan embeds every piece, the
    // broadcast plan carries only the handle — its executed-plan string
    // must not grow with |vocab| (the production-vocab requirement)
    val big = (0 until 50000).map(i => s"piece$i") ++ vocab
    val bigDf = df.select(SubwordCount.broadcastBound(spark, col("t"), big).as("n"))
    assert(bigDf.as[Long].collect().toSeq === lit)  // extra pieces never match
    val planLen = bigDf.queryExecution.executedPlan.toString.length
    assert(planLen < 10000,
      s"broadcast-bound plan grew with vocab size: $planLen chars")
    val litPlanLen = df.select(SubwordCount(spark, col("t"), big).as("n"))
      .queryExecution.analyzed.toString.length
    assert(litPlanLen > 50000 * 6,
      s"sanity: the literal form should embed the vocab ($litPlanLen chars)")
  }

  test("bpeMerges: classic corpus learns (e,s),(es,t),(l,o); ties and early stop respected") {
    // low×5, lower×2, newest×6, widest×3 — the Sennrich worked example
    // shape: (e,s) and (s,t) tie at 9, left-asc picks (e,s); then
    // (es,t) 9; then (l,o) 7
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest").toDF("text")
    val got = TextAnalysis.bpeMerges(docs, "text", numMerges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L)))

    // early stop: no pair repeats after the first merge → one rule only
    val tiny = Seq("aa aa ab").toDF("text")
    val t = TextAnalysis.bpeMerges(tiny, "text", numMerges = 5)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(t === Seq((1L, "a", "a", "aa", 2L)))

    // layout independence: same merge table at a different partitioning
    val got2 = TextAnalysis.bpeMerges(docs.repartition(7), "text", numMerges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got2 === got)
  }

  test("bpeEncode: held-out inference matches rank-order merge application; batching invariant") {
    // train on the Sennrich corpus: 4 merges = (e,s),(es,t),(l,o),(lo,w)
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest").toDF("text")
    val merges = TextAnalysis.bpeMerges(docs, "text", numMerges = 4)
    assert(merges.orderBy("step").select("merged").as[String].collect().toSeq ===
      Seq("es", "est", "lo", "low"))

    // held-out words tokenized by hand through the 4 rules in order
    val held = Seq("lowest slow west").toDF("text")
    val got = TextAnalysis.bpeEncode(held, "text", merges)
      .select("word", "pieces").as[(String, Seq[String])].collect().toMap
    assert(got === Map(
      "lowest" -> Seq("low", "est"),   // es → est → lo → low
      "slow"   -> Seq("s", "low"),     // untouched until lo, then low
      "west"   -> Seq("w", "est")))

    // batchSize=1 (one projection per rule) ≡ one fold: the batching
    // is a plan-shape choice, never a semantics choice
    val one = TextAnalysis.bpeEncode(held, "text", merges, batchSize = 1)
      .select("word", "pieces").as[(String, Seq[String])].collect().toMap
    assert(one === got)

    // on the training corpus, encode reproduces the trainer's final
    // symbolization: counts carry the corpus frequency
    val enc = TextAnalysis.bpeEncode(docs, "text", merges)
      .select("word", "cnt", "pieces")
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, c, p) => (w, (c, p)) }.toMap
    assert(enc("low") === ((5L, Seq("low"))))
    assert(enc("newest") === ((6L, Seq("n", "e", "w", "est"))))
    assert(enc("widest") === ((3L, Seq("w", "i", "d", "est"))))
    assert(enc("lower") === ((2L, Seq("low", "e", "r"))))
  }

  test("subwordVocab: top-K by frequency, lexicographic tie-break, collect is K-sized") {
    val docs = Seq(
      (1L, "red red red blue blue green"),
      (2L, "red blue azure")).toDF("doc_id", "text")
    // counts: red 4, blue 3, azure 1, green 1 → tie azure < green
    assert(TextAnalysis.subwordVocab(docs, "text", 3) ===
      Seq("red", "blue", "azure"))
    // end-to-end: vocab top-2 → red=1, blue=1, green/azure fall back
    val got = TextAnalysis.subwordCounts(docs, "doc_id", "text",
        TextAnalysis.subwordVocab(docs, "text", 2))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> (3L + 2L + 5L),   // 3×red + 2×blue + "green" as 5 chars
      2L -> (1L + 1L + 5L)))  // red + blue + "azure" as 5 chars
  }
}
