package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `item_bit_mask(items)`: OR of each item's bit in a fixed <=64-entry
 * dictionary (items outside the dictionary contribute 0); null array ->
 * null mask.
 *
 * This is the per-row half of the relational bitset prediction probe
 * ([[graft.fpm.Predictor.predictRelational]]): the mask computed once per
 * row turns the per-(row, rule) subset test into two integer ANDs. The
 * same fold expressed with Spark's `aggregate` HOF is a CodegenFallback —
 * it doesn't just run interpreted itself, it evicts the ENTIRE probe
 * pipeline (projection, broadcast nested-loop join) from whole-stage
 * codegen, measured ~3x on the 147k x 600 probe. This expression is a
 * tight codegen'd loop with the dictionary bound as a reference object.
 *
 * The dictionary is a plain constructor field (not a child expression):
 * it is driver-built bounded metadata, and embedding it as a literal map
 * would re-evaluate `map_from_arrays` machinery per batch.
 */
case class ItemBitMask(child: Expression, dict: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"item_bit_mask requires array<string>, got $other")
  }

  // UTF8String-keyed view so probe-side lookups never re-encode; built
  // once per executor on deserialization.
  @transient private lazy val utf8Dict: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](dict.size * 2)
    dict.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var mask = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val b = utf8Dict.get(arr.getUTF8String(i))
        if (b != null) mask |= b.longValue()
      }
      i += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // raw type + cast: janino compiles pre-generics Java
      val dictRef = ctx.addReferenceObj("itemBitDict", utf8Dict, "java.util.HashMap")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      s"""
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    java.lang.Long $bits = (java.lang.Long) $dictRef.get($arr.getUTF8String($i));
         |    if ($bits != null) ${ev.value} |= $bits.longValue();
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ItemBitMask =
    copy(child = newChild)
}

object ItemBitMask {
  def item_bit_mask(items: Column, dict: Map[String, Long]): Column =
    GraftShims.toColumn(ItemBitMask(GraftShims.toExpression(items), dict))
}
