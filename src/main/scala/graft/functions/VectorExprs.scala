package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native dot product over two `array<double>` columns.
 *
 * Spark's higher-order functions (`aggregate`, `zip_with`) are interpreted
 * — each invocation allocates an intermediate array and evaluates a
 * lambda per element, a codegen fence on the similarity-search hot path
 * (at 100 TB: billions of pairs x 64 lambda evals). This expression is a
 * tight codegen'd loop over the unsafe array data: no allocation, no
 * virtual calls, stays inside whole-stage codegen.
 *
 * Summation is left-to-right like the `aggregate`-based formulation, so
 * results are bit-identical with the interpreted equivalent.
 */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Null ELEMENTS make the result null even when the array columns
  // themselves are non-nullable — without this override the interpreted
  // null is coerced to 0.0 and codegen emits an assignment to a
  // false-literal isNull slot.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"array_dot requires two array<double> arguments, got $other")
    }

  // Null ELEMENTS propagate null (like Spark's arithmetic), checked inside
  // the loop — two well-predicted branches, still codegen'd and alloc-free.
  // A LENGTH MISMATCH is also null, never a silently-truncated partial dot:
  // ragged embeddings are corrupt input, and a plausible-looking partial
  // product would poison every downstream similarity ranking.
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object VectorExprs {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Codegen'd dot product; accepts array<float> (cast is codegen'd too). */
  def array_dot(a: Column, b: Column): Column =
    GraftShims.toColumn(ArrayDot(
      GraftShims.toExpression(asDouble(a)), GraftShims.toExpression(asDouble(b))))

  /** Codegen'd cosine similarity, all math in double. */
  def array_cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    array_dot(ad, bd) / (sqrt(array_dot(ad, ad)) * sqrt(array_dot(bd, bd)))
  }
}
