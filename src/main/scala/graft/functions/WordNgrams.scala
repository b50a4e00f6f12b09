package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: space-separated word n-grams of a text
  * column in ONE codegen'd pass — `word_ngrams(text, n)` returns
  * ARRAY<STRING> of the n-grams, empty when the text has fewer than n
  * tokens.
  *
  * The composable formulation (TextAnalysis pre-round-8:
  * `transform(sequence(1, size(ws) - n + 1), i -> array_join(slice(ws,
  * i, n), ' '))` over `ws = split(text, ' ')`) interprets every lambda
  * element and allocates a token array, a position array, and a
  * per-gram slice + joined string. This node exploits an identity of
  * the split/join round-trip: `split(text, " ", -1)` keeps EMPTY
  * tokens between consecutive separators, so rejoining any token run
  * with the same single-space separator reconstructs the EXACT
  * original substring — each n-gram is therefore just the byte range
  * [start(token i), end(token i+n-1)) of the input, emitted as a
  * zero-copy-ish slice. One scan for the space positions, one
  * fromBytes per gram, no interpreted lambdas. Values are
  * bit-identical to the HOF form (same strings), so the q71/q72
  * DuckDB oracles keep hashing unchanged.
  *
  * Byte-level space detection (0x20) is UTF-8-safe: no continuation
  * byte equals 0x20, so multi-byte characters can never split.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires STRING text, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("word_ngrams requires a literal INT n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    WordNgrams.grams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.WordNgrams.grams($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

object WordNgrams {

  /** The n-grams of `text` as substring slices (see class doc). */
  def grams(text: UTF8String, n: Int): ArrayData = {
    require(n >= 1, "word_ngrams: n must be >= 1")
    val bytes = text.getBytes
    val len = bytes.length
    // token k spans [starts(k), ends(k)); boundaries are single spaces
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) tokens += 1; i += 1 }
    val nGrams = tokens - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    // starts(k) = byte offset of token k (0-based)
    val starts = new Array[Int](tokens)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      // gram g covers tokens [g, g+n): bytes [starts(g), end of token g+n-1)
      val from = starts(g)
      val until = if (g + n < tokens) starts(g + n) - 1 else len
      out(g) = UTF8String.fromBytes(bytes, from, until - from)
      g += 1
    }
    new GenericArrayData(out)
  }

  private val info = new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams")

  /** Arity-checked builder (shared with GraftExtensions; [[Arity]]). */
  private[functions] val builder =
    Arity.checked("word_ngrams", "2 (text STRING, n INT)", 2)(
      es => WordNgrams(es(0), es(1)))

  /** Idempotent per-session SQL registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("word_ngrams")
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column form (registers on the active session at use). */
  def apply(spark: SparkSession, text: Column, n: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("word_ngrams", text,
      org.apache.spark.sql.functions.lit(n))
  }
}
