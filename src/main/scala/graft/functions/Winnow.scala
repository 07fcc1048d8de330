package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `winnow(tokens)`: winnowing fingerprint selection (Schleimer, Wilkerson,
 * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
 * SIGMOD'03 — the MOSS algorithm). Over the document's k-token grams,
 * hashed with the same 64-bit Karp-Rabin as `rolling_hash`, slide a
 * window of `w` gram hashes and select each window's MINIMUM hash
 * (rightmost position on ties). The selected (position, hash) set is the
 * document's fingerprint sketch, with the paper's guarantee: any shared
 * run of w + k - 1 tokens between two documents yields at least one
 * shared selected fingerprint — position-robust containment detection
 * that md5 whole-doc fingerprints (q19) and gram-set Jaccard (q13)
 * bracket from either side.
 *
 * Output: array<struct<pos, hash>> ascending by (1-based) gram position.
 * Fewer grams than `w` -> one window over all grams; fewer tokens than
 * `k` -> empty array.
 *
 * Native expression with `doGenCode` (delegating to [[WinnowAlg]], a
 * static call — no CodegenFallback fence): the whole selection runs
 * inside whole-stage codegen on the scan, per-row O(tokens x w), no
 * shuffle and no state — the 100 TB shape of sketch extraction.
 */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, s"winnow needs positive gram size and window, got ($k, $w)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"winnow requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowAlg.select(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"${ev.value} = graft.functions.WinnowAlg.select($arr, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object Winnow {
  def winnow(tokens: Column, k: Int, w: Int): Column =
    GraftShims.toColumn(Winnow(GraftShims.toExpression(tokens), k, w))
}

/** The winnowing selection itself — a separate object so generated Java
  * calls a plain static method (a case-class companion would not get a
  * static forwarder for janino to bind). */
object WinnowAlg {

  def select(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val g = n - k + 1
    if (g <= 0) return new GenericArrayData(Array.empty[Any])
    // k-gram Karp-Rabin hashes, gram text = tokens joined by one space
    // (identical bytes to the oracle's array_to_string(slice, ' '))
    val hs = new Array[Long](g)
    var j = 0
    while (j < g) {
      var h = 0L
      var t = 0
      while (t < k) {
        if (t > 0) h = h * RollingHash.Base + (' '.toInt & 0xffL)
        // null elements hash as empty (SQL arrays may carry nulls even
        // though the tokenizer never produces them)
        if (!tokens.isNullAt(j + t)) {
          val bytes = tokens.getUTF8String(j + t).getBytes
          var b = 0
          while (b < bytes.length) {
            h = h * RollingHash.Base + (bytes(b) & 0xffL)
            b += 1
          }
        }
        t += 1
      }
      hs(j) = h
      j += 1
    }
    // slide the window; selections are non-decreasing in position, so an
    // ordered distinct is just "skip if same as last selected"
    val ww = math.min(w, g)
    val positions = new scala.collection.mutable.ArrayBuffer[Int]()
    var s = 0
    while (s + ww <= g) {
      var best = s
      var q = s + 1
      while (q < s + ww) {
        if (hs(q) <= hs(best)) best = q // <= keeps the RIGHTMOST minimum
        q += 1
      }
      if (positions.isEmpty || positions(positions.length - 1) != best) {
        positions += best
      }
      s += 1
    }
    val rows = new Array[Any](positions.length)
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      rows(i) = new GenericInternalRow(Array[Any]((p + 1).toLong, hs(p)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
