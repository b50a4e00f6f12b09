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
