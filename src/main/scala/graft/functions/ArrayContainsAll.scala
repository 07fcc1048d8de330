package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `array_contains_all(haystack, needles)`: true iff every element of
 * `needles` occurs in `haystack` (string arrays; null elements never match).
 *
 * The subset-match probe is the inner loop of rule-based prediction
 * (antecedent ⊆ basket, `pfp/FPGrowth.scala:170-171`): a native codegen'd
 * nested loop over the unsafe arrays, in place of an interpreted
 * `forall(...array_contains...)` HOF chain or a deserializing UDF.
 * Antecedents are 1-3 items and baskets ~10, so the nested loop beats any
 * hashing setup cost.
 */
case class ArrayContainsAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"array_contains_all requires two array<string> arguments, got $other")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val hay = l.asInstanceOf[ArrayData]
    val needles = r.asInstanceOf[ArrayData]
    var i = 0
    while (i < needles.numElements()) {
      if (needles.isNullAt(i)) return false
      val n = needles.getUTF8String(i)
      var found = false
      var j = 0
      while (!found && j < hay.numElements()) {
        if (!hay.isNullAt(j) && hay.getUTF8String(j).equals(n)) found = true
        j += 1
      }
      if (!found) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hay, needles) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val found = ctx.freshName("found")
      val n = ctx.freshName("needle")
      val utf8 = classOf[UTF8String].getName
      s"""
         |${ev.value} = true;
         |for (int $i = 0; ${ev.value} && $i < $needles.numElements(); $i++) {
         |  if ($needles.isNullAt($i)) { ${ev.value} = false; break; }
         |  $utf8 $n = $needles.getUTF8String($i);
         |  boolean $found = false;
         |  for (int $j = 0; !$found && $j < $hay.numElements(); $j++) {
         |    if (!$hay.isNullAt($j) && $hay.getUTF8String($j).equals($n)) {
         |      $found = true;
         |    }
         |  }
         |  if (!$found) ${ev.value} = false;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayContainsAll =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_contains_all"
}

object ArrayContainsAll {
  def array_contains_all(hay: Column, needles: Column): Column =
    GraftShims.toColumn(ArrayContainsAll(
      GraftShims.toExpression(hay), GraftShims.toExpression(needles)))
}
