package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL surface for the engine's native expressions: `rolling_hash(str)`,
 * `array_dot(a, b)`, `array_cosine(a, b)`.
 *
 * Two registration paths:
 *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
 *    (cluster-wide, survives session cloning);
 *  - [[GraftFunctions.register]] for an existing session (tests, REPL).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // the full as-of extension stack, same as the live-session wiring in
    // AsOfJoinNative.asOfJoin: strategy AND the filter-pushdown rule
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
  }
}

object GraftFunctions {

  private def cast(e: Expression, to: String): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DataType.fromDDL(to))

  private[functions] val definitions
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)),
    ("array_dot",
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) =>
        ArrayDot(cast(exprs(0), "array<double>"), cast(exprs(1), "array<double>"))),
    ("array_cosine",
      new ExpressionInfo(classOf[ArrayDot].getName, "array_cosine"),
      (exprs: Seq[Expression]) => {
        val a = cast(exprs(0), "array<double>")
        val b = cast(exprs(1), "array<double>")
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(ArrayDot(a, b), Multiply(Sqrt(ArrayDot(a, a)), Sqrt(ArrayDot(b, b))))
      }),
    ("array_contains_all",
      new ExpressionInfo(classOf[ArrayContainsAll].getName, "array_contains_all"),
      (exprs: Seq[Expression]) => ArrayContainsAll(exprs(0), exprs(1))),
    ("heavy_hitters",
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "usage: heavy_hitters(col, k) with literal k")
        HeavyHittersAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }),
    ("morton_key",
      new ExpressionInfo(graft.operators.Layout.getClass.getName, "morton_key"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3 && exprs(2).foldable,
          "usage: morton_key(x, y, bits) with literal bits")
        val bits = exprs(2).eval().asInstanceOf[Number].intValue()
        require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
        // Catalyst nodes built directly: a Column-API delegation via the
        // shims arrives UNRESOLVED in the registry path (ColumnNode
        // wrappers fail codegen), so the fold is mirrored from
        // graft.operators.Layout.mortonKey — equality is spec-pinned
        // (FunctionsSpec "identical to the Column-API fold").
        import org.apache.spark.sql.catalyst.expressions.{
          BitwiseAnd, BitwiseOr, Literal, ShiftLeft, ShiftRight}
        def masked(e: Expression) =
          BitwiseAnd(cast(e, "bigint"), Literal((1L << bits) - 1))
        val (x, y) = (masked(exprs(0)), masked(exprs(1)))
        (0 until bits).foldLeft[Expression](Literal(0L)) { (acc, i) =>
          BitwiseOr(BitwiseOr(acc,
            ShiftLeft(BitwiseAnd(ShiftRight(x, Literal(i)), Literal(1L)), Literal(2 * i))),
            ShiftLeft(BitwiseAnd(ShiftRight(y, Literal(i)), Literal(1L)), Literal(2 * i + 1)))
        }
      }),
    ("winnow",
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
          "usage: winnow(tokens, k, w) with literal k, w")
        Winnow(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())
      }),
    ("kmv_minhash",
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_minhash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "usage: kmv_minhash(hashCol, k) with literal k")
        KmvAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }),
    ("bloom_agg",
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
          "usage: bloom_agg(keys, numBits, numHashes) with literal sizes")
        BloomFilterAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())
      }))

  /** Register on a live session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
