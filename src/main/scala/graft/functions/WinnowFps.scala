package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03) in ONE codegen'd pass —
  * `winnow_fps(text, k, w)` returns the distinct window-min k-gram
  * hashes of `text` as ARRAY<BIGINT>.
  *
  * The composable formulation (TextAnalysis pre-round-7: a
  * transform/sequence lambda hashing every k-gram with md5, then a
  * second lambda taking slice minima) runs O(len·k) interpreted md5
  * calls per document — higher-order-function lambdas have no codegen.
  * This node hashes with a Rabin-Karp rolling polynomial
  * (h = Σ byte·B^j mod M, B=257, M=1e9+7): O(len) multiply-adds for
  * the gram hashes plus the window-min sweep, no allocations beyond
  * the output. 7.8× on the q68 bench entry.
  *
  * Semantics (clamping matches the HOF form it replaces):
  *  - gram positions i ∈ [0, max(len-k+1, 1)): full k-byte grams, or
  *    one short gram when len < k (hash of the whole text; 0 if empty)
  *  - window positions i ∈ [0, max(nGrams-w+1, 1)): min of the gram
  *    hashes i..i+w-1, clamped at the end
  *  - result: the distinct minima, first-occurrence order
  *
  * Hashing is over UTF-8 BYTES; the DuckDB oracle recomputes it with
  * per-character unicode() code points — identical on ASCII corpora
  * (the driver's documents table is ASCII; non-ASCII would diverge
  * engine-to-engine, same caveat as the q48 byte/char oracle).
  *
  * The winnowing guarantee is hash-agnostic: any shared substring of
  * length ≥ w + k - 1 still yields a shared fingerprint. Reference:
  * hot-item-analysis uses whole-record hashing only; partial-overlap
  * detection is an LLM-pipeline extension.
  */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires STRING text, got ${first.dataType.catalogString}")
    else if (second.dataType != IntegerType || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("winnow_fps requires INT k and w")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure("winnow_fps k and w must be literals")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    WinnowFps.fps(text.asInstanceOf[UTF8String].getBytes,
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k, w) => s"graft.functions.WinnowFps.fps($t.getBytes(), $k, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFps =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFps {
  private val B = 257L
  private val M = 1000000007L

  /** Distinct window-min rolling k-gram hashes (see class doc). Shared
    * by the interpreted and generated paths — one source of truth.
    */
  def fps(bytes: Array[Byte], k: Int, w: Int): ArrayData = {
    require(k >= 1, "winnow_fps: k must be >= 1")
    require(w >= 1, "winnow_fps: w must be >= 1")
    val n = bytes.length
    val nH = math.max(n - k + 1, 1)
    val hs = new Array[Long](nH)
    // gram 0 (possibly short when n < k)
    var h = 0L
    var j = 0
    val end0 = math.min(k, n)
    while (j < end0) { h = (h * B + (bytes(j) & 0xffL)) % M; j += 1 }
    hs(0) = h
    if (nH > 1) {
      // full k-grams: roll — drop byte i-1, append byte i+k-1
      var bk1 = 1L // B^(k-1) mod M
      var p = 1
      while (p < k) { bk1 = bk1 * B % M; p += 1 }
      var i = 1
      while (i < nH) {
        h = ((h - (bytes(i - 1) & 0xffL) * bk1 % M + M) % M * B +
          (bytes(i + k - 1) & 0xffL)) % M
        hs(i) = h
        i += 1
      }
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (nH <= w) {
      // single clamped window: min of all gram hashes
      var m = hs(0)
      var i = 1
      while (i < nH) { if (hs(i) < m) m = hs(i); i += 1 }
      out += m
    } else {
      // monotonic-deque sliding minimum: each index enters and leaves
      // the deque once — O(nH) total, not O(nH·w)
      val dq = new Array[Int](nH)
      var head = 0
      var tail = 0 // deque is dq[head, tail), hashes increasing
      var i = 0
      while (i < nH) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i
        tail += 1
        val start = i - w + 1
        if (start >= 0) {
          while (dq(head) < start) head += 1
          val m = hs(dq(head))
          if (seen.add(m)) out += m
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  private val info = new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps")

  /** Arity-checked builder (shared with GraftExtensions; [[Arity]]):
    * a wrong-arity SQL call fails as a clean AnalysisException naming
    * the signature, not an IndexOutOfBoundsException (ADVICE r7).
    */
  private[functions] val builder =
    Arity.checked("winnow_fps", "3 (text STRING, k INT, w INT)", 3)(
      es => WinnowFps(es(0), es(1), es(2)))

  /** Idempotent per-session SQL registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("winnow_fps")
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column form (registers on the active session at use). */
  def apply(spark: SparkSession, text: Column, k: Int, w: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("winnow_fps", text,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(w))
  }
}
