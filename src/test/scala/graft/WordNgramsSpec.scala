package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordNgrams

/** word_ngrams must be value-identical to the higher-order-function
  * formulation it replaces (split → transform/sequence → slice →
  * array_join) — including the split(" ", -1) empty-token semantics on
  * consecutive/leading/trailing spaces, and on multi-byte UTF-8.
  */
class WordNgramsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def viaHof(text: String, n: Int): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(expr(
        s"""CASE WHEN size(split(t, ' ')) >= $n
           |     THEN transform(sequence(1, size(split(t, ' ')) - ${n - 1}),
           |            i -> array_join(slice(split(t, ' '), i, $n), ' '))
           |     ELSE array() END""".stripMargin).as("g"))
      .as[Seq[String]].collect().head

  private def viaNative(text: String, n: Int): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(WordNgrams(spark, col("t"), n).as("g"))
      .as[Seq[String]].collect().head

  test("matches the HOF form on edge-shaped texts for n in 1..4") {
    val texts = Seq(
      "the quick brown fox", "single", "", " ", "a  b", "  lead", "trail  ",
      "a b c d e f g", "naïve café über — 多字节 字符 test",
      "x " * 50 + "y")
    for (t <- texts; n <- 1 to 4) {
      assert(viaNative(t, n) === viaHof(t, n), s"diverged on <$t> n=$n")
    }
  }

  test("fewer than n tokens yields an empty array (explode drops the row)") {
    assert(viaNative("one two", 3) === Seq.empty)
    val rows = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(col("doc_id"), explode(WordNgrams(spark, col("text"), 3)))
      .count()
    assert(rows === 0L)
  }

  test("affine_min_hashes matches the per-family array_min(transform) it fuses") {
    import graft.functions.{AffineMinHashes, Hashing}
    val M = Hashing.AffineMod
    val hs = Seq(12345L, 987654321L, 0L, M - 1, 42L)
    val df = Seq(Tuple1(hs)).toDF("hs")
    val n = 8
    val want = (0 until n).map { h =>
      val (a, b) = Hashing.affine(h)
      df.select(expr(s"array_min(transform(hs, x -> ($a * x + $b) % $M))"))
        .as[Long].collect().head
    }
    val got = df.select(AffineMinHashes(spark, col("hs"), n))
      .as[Seq[Long]].collect().head
    assert(got === want)
    // empty input: null minima, exactly like array_min over empty
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(AffineMinHashes(spark, col("hs"), 3))
      .as[Seq[java.lang.Long]].collect().head
    assert(empty === Seq(null, null, null))
  }
}
