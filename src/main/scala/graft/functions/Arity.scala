package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared arity guard for the engine's SQL function builders (ADVICE
  * r7): a wrong-arity call (`SELECT winnow_fps(text)`) fails as a
  * clean AnalysisException naming the expected signature instead of an
  * IndexOutOfBoundsException escaping from `exprs(n)` inside the
  * builder. One place, so every registration (md5_long60, winnow_fps,
  * array_dot, array_sqdiff — and the next native function) gets the
  * same failure mode.
  */
private[functions] object Arity {

  /** Wrap `build` so it only sees exactly `n` argument expressions. */
  def checked(name: String, expected: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n)
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> expected,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }
}
