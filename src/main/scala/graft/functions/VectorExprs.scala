package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native codegen'd vector arithmetic over embedding columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, (x, y) -> ...))`
  * — runs every lambda element interpreted (higher-order functions have
  * no codegen) and allocates an intermediate array per row. These
  * expressions emit one fused loop inside whole-stage codegen: no
  * allocation, no per-element virtual calls. Semantics match the HOF
  * form bit-for-bit: elements are widened float→double before the
  * multiply, accumulation is a sequential double sum in index order, so
  * every DuckDB oracle (list_sum over list_transform, same order) keeps
  * hashing identically.
  *
  * Both expressions accept float and double arrays (mixed sides fine),
  * require equal lengths (raising an error beats the silent null that
  * zip_with's null-padding produces — ADVICE r1), and treat null
  * elements as contributing 0.
  */
abstract class ArrayPairFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  /** Java source for one term given element accesses `x` and `y`. */
  protected def termCode(x: String, y: String): String
  /** Interpreted form of one term. */
  protected def term(x: Double, y: Double): Double

  private def getter(e: Expression, arr: String, i: String): String =
    elemType(e).get match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  private def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    elemType(e).get match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (la.numElements() != ra.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: array lengths differ (${la.numElements()} vs ${ra.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < la.numElements()) {
      if (!la.isNullAt(i) && !ra.isNullAt(i))
        acc += term(getElem(left, la, i), getElem(right, ra, i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      val nullGuard =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
            right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($l.isNullAt($i) || $r.isNullAt($i)) continue;"
        else ""
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: array lengths differ (" + $n + " vs " + $r.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += ${termCode(getter(left, l, i), getter(right, r, i))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ — the dot product; `array_dot(v, v)` is the squared L2 norm. */
case class ArrayDotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_dot"
  override protected def termCode(x: String, y: String): String = s"$x * $y"
  override protected def term(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (xᵢ−yᵢ)² — squared euclidean distance. */
case class ArraySquaredDiffSum(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "array_sqdiff"
  override protected def termCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySquaredDiffSum =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private[functions] val registrations: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      Arity.checked("array_dot", "2 (a ARRAY<FLOAT|DOUBLE>, b ARRAY<FLOAT|DOUBLE>)", 2)(
        es => ArrayDotProduct(es(0), es(1)))),
    (FunctionIdentifier("array_sqdiff"),
      new ExpressionInfo(classOf[ArraySquaredDiffSum].getName, "array_sqdiff"),
      Arity.checked("array_sqdiff", "2 (a ARRAY<FLOAT|DOUBLE>, b ARRAY<FLOAT|DOUBLE>)", 2)(
        es => ArraySquaredDiffSum(es(0), es(1)))))

  /** Idempotent per-session SQL registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
