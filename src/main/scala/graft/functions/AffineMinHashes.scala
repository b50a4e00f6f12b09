package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expression: ALL of MinHash's affine-family minima in
  * ONE pass — `affine_min_hashes(hs, n)` returns ARRAY<BIGINT> where
  * element h is `min over x in hs of (a_h·x + b_h) mod 2^30` with
  * (a_h, b_h) = [[Hashing.affine]].
  *
  * The composable formulation (Dedup.minhashBands pre-round-8: one
  * `array_min(transform(hs, x -> (a·x + b) % M))` column PER hash
  * family) traverses the shingle-hash array numHashes times, each an
  * interpreted lambda with boxed longs. This node computes every
  * family's minimum in a single fused loop. Values are identical —
  * same affine parameters, same mod — so the minhash band hashes (and
  * the q21/q22/q65 oracles built on them) are unchanged. Null entries
  * are skipped and an empty/all-null input yields null minima,
  * matching array_min.
  */
case class AffineMinHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _)
        if right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        "affine_min_hashes requires (hs ARRAY<BIGINT>, n literal INT), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "affine_min_hashes"

  override protected def nullSafeEval(hs: Any, n: Any): Any =
    AffineMinHashes.mins(hs.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (hs, n) => s"graft.functions.AffineMinHashes.mins($hs, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AffineMinHashes =
    copy(left = newLeft, right = newRight)
}

object AffineMinHashes {
  private val M = Hashing.AffineMod

  // (a, b) parameter arrays per family count, cached across rows
  private val params =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def paramsFor(n: Int): (Array[Long], Array[Long]) =
    params.computeIfAbsent(n, k => {
      val as = new Array[Long](k); val bs = new Array[Long](k)
      var h = 0
      while (h < k) {
        val (a, b) = Hashing.affine(h); as(h) = a; bs(h) = b; h += 1
      }
      (as, bs)
    })

  /** One-pass minima over all `n` affine families (see class doc). */
  def mins(hs: ArrayData, n: Int): ArrayData = {
    require(n >= 1, "affine_min_hashes: n must be >= 1")
    val (as, bs) = paramsFor(n)
    val len = hs.numElements()
    val out = new Array[Long](n)
    java.util.Arrays.fill(out, Long.MaxValue)
    var any = false
    var i = 0
    while (i < len) {
      if (!hs.isNullAt(i)) {
        any = true
        val x = hs.getLong(i)
        var h = 0
        while (h < n) {
          val v = (as(h) * x + bs(h)) % M
          if (v < out(h)) out(h) = v
          h += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](n)(null))
    else new GenericArrayData(out)
  }

  private val info =
    new ExpressionInfo(classOf[AffineMinHashes].getName, "affine_min_hashes")

  /** Arity-checked builder (shared with GraftExtensions; [[Arity]]). */
  private[functions] val builder =
    Arity.checked("affine_min_hashes", "2 (hs ARRAY<BIGINT>, n INT)", 2)(
      es => AffineMinHashes(es(0), es(1)))

  /** Idempotent per-session SQL registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("affine_min_hashes")
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column form (registers on the active session at use). */
  def apply(spark: SparkSession, hs: Column, n: Int): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("affine_min_hashes", hs,
      org.apache.spark.sql.functions.lit(n))
  }
}
