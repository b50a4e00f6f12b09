package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst expression: the engine's 60-bit md5 hash
  * (`graft.functions.Hashing`) as ONE codegen'd expression node instead
  * of the 4-node conv(substring(md5(cast))) chain.
  *
  * Value-identical to the chain (the first 15 hex chars of md5 are the
  * top 60 bits of the digest's first 8 bytes), so every oracle keeps
  * matching. The win is inside higher-order-function lambdas (minhash's
  * per-shingle hashing): lambda bodies are interpreted per element, so
  * per-node overhead and the intermediate hex-string allocations of the
  * chain dominate — one node with a ThreadLocal digest removes both.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long60 requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_long60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5 — equals parsing the first 15 hex chars. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var r = 0L
    var i = 0
    while (i < 8) { r = (r << 8) | (d(i) & 0xffL); i += 1 }
    r >>> 4
  }

  private val info = new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60")

  /** Arity-checked builder (shared with GraftExtensions; [[Arity]]). */
  private[functions] val builder =
    Arity.checked("md5_long60", "1 (input BINARY)", 1)(es => Md5Long60(es.head))

  /** Idempotent per-session SQL registration (`SELECT md5_long60(x)`). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("md5_long60")
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column form (registers on the column's active session at use). */
  def apply(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("md5_long60", c)
  }
}

/** SparkSessionExtensions hook: `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` makes the engine's functions
  * (md5_long60, array_dot, array_sqdiff) and planner strategies (the
  * as-of join) available on any session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      Md5Long60.builder))
    e.injectFunction((FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      WinnowFps.builder))
    e.injectFunction((FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      WordNgrams.builder))
    e.injectFunction((FunctionIdentifier("affine_min_hashes"),
      new ExpressionInfo(classOf[AffineMinHashes].getName, "affine_min_hashes"),
      AffineMinHashes.builder))
    e.injectFunction((FunctionIdentifier("subword_count"),
      new ExpressionInfo(classOf[SubwordCount].getName, "subword_count"),
      SubwordCount.builder))
    VectorExprs.registrations.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
  }
}
