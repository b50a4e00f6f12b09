package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native winnow_fps expression vs a naive Scala reference: the
  * rolling-hash update, window-min clamping, distinctness, and the
  * short-text edges must match the O(len·k) recompute exactly.
  */
class WinnowFpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Naive recompute: hash every k-gram independently (no rolling),
    * then window minima, then distinct.
    */
  private def reference(text: String, k: Int, w: Int): Set[Long] = {
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length
    val nH = math.max(n - k + 1, 1)
    val hs = (0 until nH).map { i =>
      bytes.slice(i, math.min(i + k, n))
        .foldLeft(0L)((a, b) => (a * 257L + (b & 0xffL)) % 1000000007L)
    }
    val nW = math.max(nH - w + 1, 1)
    (0 until nW).map(i => hs.slice(i, math.min(i + w, nH)).min).toSet
  }

  private def viaSpark(text: String, k: Int, w: Int): Set[Long] =
    Seq(Tuple1(text)).toDF("t")
      .select(explode(graft.functions.WinnowFps(spark, col("t"), k, w)).as("fp"))
      .as[Long].collect().toSet

  test("wrong arity from SQL is a clean AnalysisException naming the signature") {
    graft.functions.WinnowFps.ensureRegistered(spark)
    graft.functions.Md5Long60.ensureRegistered(spark)
    graft.functions.VectorExprs.ensureRegistered(spark)
    for (sql <- Seq("SELECT winnow_fps('x')", "SELECT md5_long60()",
        "SELECT array_dot(array(1.0D))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql))
      assert(e.getMessage.contains("WRONG_NUM_ARGS") ||
        e.getMessage.toLowerCase.contains("requires"), s"unclear error for $sql: $e")
    }
  }

  test("matches the naive recompute on random ASCII text") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh "
    for (len <- Seq(1, 5, 7, 8, 9, 23, 24, 100, 400); trial <- 1 to 3) {
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(viaSpark(s, 8, 16) === reference(s, 8, 16),
        s"mismatch at len=$len trial=$trial")
    }
  }

  test("short-text clamps: len < k hashes the whole text; len < k+w-1 one window") {
    assert(viaSpark("abc", 8, 16) === reference("abc", 8, 16))
    assert(viaSpark("abc", 8, 16).size === 1)
    assert(viaSpark("", 8, 16) === Set(0L)) // empty gram folds to 0
  }

  test("identical texts produce identical fingerprint sets; k=1 w=1 keeps every byte hash") {
    val s = "the quick brown fox"
    assert(viaSpark(s, 8, 16) === viaSpark(s, 8, 16))
    assert(viaSpark("aba", 1, 1) === Set('a'.toLong, 'b'.toLong))
  }

  test("winnowing guarantee survives the hash swap: shared >= w+k-1 substring shares a fp") {
    val shared = "0123456789abcdefghijklm" // 23 = w + k - 1 chars
    val a = viaSpark("XXXX" + shared + "YYYY", 8, 16)
    val b = viaSpark("QQQQQQ" + shared + "ZZ", 8, 16)
    assert((a intersect b).nonEmpty)
  }
}
