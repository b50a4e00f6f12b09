package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs

/** The native array_dot / array_sqdiff expressions: value parity with
  * the interpreted higher-order-function form (seeded random cases),
  * mixed float/double inputs, null elements, length mismatch, and
  * codegen (the default local[*] path compiles them via whole-stage
  * codegen).
  */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("array_dot equals the aggregate(zip_with(...)) formulation bit-for-bit") {
    VectorExprs.ensureRegistered(spark)
    val rnd = new scala.util.Random(42)
    val cases = (1 to 200).map { _ =>
      val n = rnd.nextInt(65)
      (Array.fill(n)(rnd.nextFloat() * 20 - 10), Array.fill(n)(rnd.nextFloat() * 20 - 10))
    }
    val rows = cases.toDF("a", "b")
      .select(
        expr("array_dot(a, b)").as("native"),
        expr("""aggregate(zip_with(a, b,
               |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               |  0D, (acc, v) -> acc + v)""".stripMargin).as("hof"))
      .collect()
    rows.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("array_sqdiff computes the squared L2 distance; mixed float/double sides") {
    VectorExprs.ensureRegistered(spark)
    val row = Seq((Array(1f, 2f, 3f), Array(2.0, 0.0, 3.5)))
      .toDF("f", "d")
      .select(expr("array_sqdiff(f, d)").as("fd"), expr("array_dot(d, f)").as("df"))
      .head()
    assert(row.getDouble(0) === (1.0 + 4.0 + 0.25))
    assert(row.getDouble(1) === (2.0 + 0.0 + 10.5))
  }

  test("null arrays give null; null elements contribute zero") {
    VectorExprs.ensureRegistered(spark)
    val withNullElem = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(2.0), Some(5.0), Some(4.0))))
      .toDF("a", "b")
      .select(expr("array_dot(a, b)")).head()
    assert(withNullElem.getDouble(0) === (2.0 + 12.0))
    val nullArray = Seq((Array(1.0), Option.empty[Array[Double]]))
      .toDF("a", "b").select(expr("array_dot(a, b)")).head()
    assert(nullArray.isNullAt(0))
  }

  test("length mismatch raises instead of null-padding") {
    VectorExprs.ensureRegistered(spark)
    val ex = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
        .select(expr("array_dot(a, b)")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("expressions survive SQL via GraftExtensions-style registration") {
    VectorExprs.ensureRegistered(spark)
    Seq((Array(1f, 1f), Array(1f, 1f))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT array_dot(a, b) FROM v").head().getDouble(0) === 2.0)
  }
}
