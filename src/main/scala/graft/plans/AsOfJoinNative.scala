package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{
  DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/**
 * As-of join as a REAL planner extension — the full custom-operator stack
 * Spark offers when composition isn't wanted: a logical node, a planner
 * `Strategy`, and a physical `SparkPlan` whose `doExecute` merges the two
 * sorted sides in one pass. Semantically identical to the merge-window
 * composition in [[graft.operators.AsOf.asOfJoin]] (spec-enforced equality,
 * and q75 runs it against q44's exact DuckDB `ASOF LEFT JOIN` oracle);
 * the physical shape is the same ONE hash exchange per side plus a
 * per-partition sort — but the merge needs no window-function state
 * machine, touches each row exactly once with O(1) carried state (the
 * single latest right row), and never materializes the unioned
 * double-width rows the window variant carries through its sort.
 *
 * The node carries its key/time/tie columns as ordinary expressions, so
 * the optimizer treats it like any binary operator: `DeduplicateRelations`
 * re-ids a self-joined right side (exactly q75's shape — both sides
 * derive from `events`) and rewrites them, and column pruning drops
 * unused child outputs THROUGH the join (the exec re-binds to whatever
 * the pruned child emits — spec-pinned by the "prunes" test). Keys,
 * times, and the tie column are from the ORDERED-PRIMITIVE family —
 * long/int/timestamp/timestamp_ntz/date (validated at the API; left and
 * right must agree per role) — every one of which Catalyst stores as a
 * primitive int or long, so the merge loop stays primitive (`getLong`/
 * `getInt`-backed accessors) with no per-row ordering objects.
 *
 * Right rows with a null key or time never match (SQL `<=` semantics);
 * unmatched left rows emit with a null right side under the default
 * LEFT-OUTER semantics, or are dropped under INNER (`inner = true`).
 * Among right rows tied on (key, time), the greatest `tie` value wins —
 * the sort makes that the last of the run, mirroring the composed
 * variant's `last(...)` over its `__tie`-ordered window.
 */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    isInner: Boolean)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    if (isInner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/**
 * Optimizer rule completing the extension stack (`LogicalPlan` + `Rule`
 * + `Strategy` + `SparkPlan`): Catalyst's own `PushDownPredicates`
 * cannot see through a custom node, so a `Filter` sitting on an
 * [[AsOfJoinPlan]] would run AFTER the merge — above both exchanges —
 * even when it references only left-side columns. This rule pushes the
 * left-only deterministic conjuncts into the left child, where the
 * stock rules carry them the rest of the way down (to the parquet scan
 * as `PushedFilters` when the child is a scan). Safe under both join
 * modes: every output row's left half IS an input left row (outer emits
 * all of them, inner a subset), so a left-only predicate commutes with
 * the join. Right-side conjuncts are NOT pushable: dropping a right row
 * changes which EARLIER row becomes some left row's as-of match.
 */
object AsOfJoinFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * `spark.experimental.extraStrategies` (live sessions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTime, p.rightKey, p.rightTime, p.rightTie,
        p.isInner) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    isInner: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isInner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  // One hash exchange per side, co-partitioned on the key — the same
  // contract SortMergeJoinExec declares; EnsureRequirements inserts the
  // exchanges and the per-partition sorts below.
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // Left rows pass through in their sorted order, on their partitioning —
  // declare both so downstream operators skip redundant exchanges/sorts.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def ordinal(e: Expression, attrs: Seq[Attribute]): Int =
    BindReferences.bindReference(e, attrs).asInstanceOf[BoundReference].ordinal

  // Every ordered-primitive type reads as a long without boxing: int-backed
  // types (int, date = days) widen losslessly; long-backed types (long,
  // timestamp/_ntz = micros) read directly. Monomorphic two-way dispatch —
  // the JIT inlines it in the merge loop.
  private def longGetter(dt: DataType): (InternalRow, Int) => Long = dt match {
    case IntegerType | DateType => (r, i) => r.getInt(i).toLong
    case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
    case other =>
      throw new IllegalStateException(s"unsupported as-of column type $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lAttrs = left.output
    val rAttrs = right.output
    val outAttrs = output
    val lk = ordinal(leftKey, lAttrs)
    val lt = ordinal(leftTime, lAttrs)
    val rk = ordinal(rightKey, rAttrs)
    val rt = ordinal(rightTime, rAttrs)
    val keyOf = longGetter(leftKey.dataType)
    val timeOf = longGetter(leftTime.dataType)
    val rKeyOf = longGetter(rightKey.dataType)
    val rTimeOf = longGetter(rightTime.dataType)
    val inner = isInner
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rAttrs.length)
      val joined = new JoinedRow
      // bind against the NULLABLE output attrs (not the children's): the
      // right side of an unmatched outer row is all null, and a
      // non-nullable BoundReference would skip the null check and read
      // zeros (inner output never carries the null row, so its tighter
      // nullability is safe there)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)

      // Shared merge state over the two sorted sides. rHead = next
      // unconsumed right row; curMatch = latest consumed right row of
      // curKey (copied: unsafe rows are reused).
      abstract class MergeIterator extends Iterator[InternalRow] {
        protected var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null
        protected var curKey = 0L
        protected var curMatch: InternalRow = null
        protected def advance(): Unit =
          rHead = if (rIt.hasNext) rIt.next() else null

        // null under outer = emit with null right; null under inner = drop
        protected def matchFor(l: InternalRow): InternalRow = {
          if (l.isNullAt(lk) || l.isNullAt(lt)) return null
          val lKey = keyOf(l, lk)
          val lTime = timeOf(l, lt)
          if (curMatch != null && curKey != lKey) curMatch = null
          var scan = true
          while (scan && rHead != null) {
            if (rHead.isNullAt(rk)) advance() // null keys never match
            else {
              val rKey = rKeyOf(rHead, rk)
              if (rKey < lKey) advance() // left is past this key for good
              else if (rKey > lKey) scan = false
              else if (rHead.isNullAt(rt)) advance() // null time: no match
              else if (rTimeOf(rHead, rt) <= lTime) {
                curMatch = rHead.copy(); curKey = rKey; advance()
              } else scan = false
            }
          }
          if (curMatch != null && curKey == lKey) curMatch else null
        }
      }

      if (!inner) {
        // Left outer: every left row emits, so hasNext is pure
        // (lIt.hasNext) and the reused projection buffer is written only
        // in next() — the standard only-next()-invalidates contract.
        new MergeIterator {
          override def hasNext: Boolean = lIt.hasNext
          override def next(): InternalRow = {
            val l = lIt.next()
            val m = matchFor(l)
            proj(joined(l, if (m != null) m else nullRight))
          }
        }
      } else {
        // Inner: unmatched left rows are dropped, so hasNext must look
        // ahead. The lookahead stashes a COPY of the left row (the sort
        // iterator reuses its buffer) and the match reference (curMatch
        // objects are stable copies, only the curMatch FIELD is
        // reassigned later) — the projection into the reused output
        // buffer still happens in next(), never in hasNext, so a row
        // handed out by next() stays valid until the following next().
        new MergeIterator {
          private var pendingLeft: InternalRow = null
          private var pendingMatch: InternalRow = null
          override def hasNext: Boolean = {
            while (pendingLeft == null && lIt.hasNext) {
              val l = lIt.next()
              val m = matchFor(l)
              if (m != null) { pendingLeft = l.copy(); pendingMatch = m }
            }
            pendingLeft != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty iterator")
            val r = proj(joined(pendingLeft, pendingMatch))
            pendingLeft = null; pendingMatch = null
            r
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-level API over the native operator. */
object AsOfJoinNative {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val OrderedPrimitives: Set[DataType] = Set(
    LongType, IntegerType, TimestampType, TimestampNTZType, DateType)

  /**
   * As-of join: every left row + the right row with the greatest
   * `rightTime <= leftTime` within `leftKey == rightKey` (ties on time
   * resolved toward the greatest `rightTie`). With `inner = false` (the
   * default) unmatched left rows emit with a null right side; with
   * `inner = true` they are dropped. Right columns are returned as-is —
   * alias before joining if names collide with the left side.
   *
   * ROUTING: when all five named columns are from the ordered-primitive
   * family — long, int, timestamp, timestamp_ntz, or date — the custom
   * one-pass merge exec runs (primitive comparisons, O(1) carried
   * state). Any other type (strings, decimals, ...) AUTO-FALLS-BACK to
   * the composed merge-window plan ([[graft.operators.AsOf.asOfJoin]])
   * with identical semantics under the columns' NATIVE ordering
   * (lexicographic for strings, exact for decimals) and the same
   * one-exchange-per-side shape — logged, never an error and never a
   * silent cross-product. Either way the two key columns (and the two
   * time columns) must agree on their type across sides, so the
   * comparison is like-for-like.
   */
  def asOfJoin(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String,
      inner: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    GraftShims.addStrategy(spark, AsOfJoinStrategy)
    GraftShims.addOptimization(spark, AsOfJoinFilterPushdown)
    // A shared attribute means the same frame on both sides: after the
    // analyzer re-ids the right child, this node's right-side expressions
    // would dangle. Alias the right side first (cheap, and q75 shows the
    // pattern) — failing here beats a bind error at execution.
    val shared = leftDf.queryExecution.analyzed.outputSet
      .intersect(rightDf.queryExecution.analyzed.outputSet)
    require(shared.isEmpty,
      s"right side shares attributes with left ($shared); alias right columns first")
    def attr(df: DataFrame, name: String, side: String): Attribute = {
      val plan = df.queryExecution.analyzed
      val a = plan.output.find(_.name == name)
      require(a.isDefined,
        s"$side column '$name' not found in ${df.columns.mkString(",")}")
      a.get
    }
    val lKey = attr(leftDf, leftKey, "left")
    val lTime = attr(leftDf, leftTime, "left")
    val rKey = attr(rightDf, rightKey, "right")
    val rTime = attr(rightDf, rightTime, "right")
    val rTie = attr(rightDf, rightTie, "right")
    require(lKey.dataType == rKey.dataType,
      s"key types differ across sides: ${lKey.dataType} vs ${rKey.dataType}")
    require(lTime.dataType == rTime.dataType,
      s"time types differ across sides: ${lTime.dataType} vs ${rTime.dataType}")
    val nonPrimitive = Seq(
      ("left", leftKey, lKey), ("left", leftTime, lTime),
      ("right", rightKey, rKey), ("right", rightTime, rTime),
      ("right", rightTie, rTie))
      .filterNot { case (_, _, a) => OrderedPrimitives(a.dataType) }
    if (nonPrimitive.nonEmpty) {
      log.info(
        "as-of columns outside the ordered-primitive family ({}) — falling " +
          "back to the composed merge-window plan (same semantics, native " +
          "type ordering)",
        nonPrimitive.map { case (s, n, a) => s"$s.$n: ${a.dataType}" }
          .mkString(", "))
      return composedFallback(leftDf, rightDf, leftKey, rightKey,
        leftTime, rightTime, rightTie, inner)
    }
    val plan = AsOfJoinPlan(
      leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
      lKey, lTime, rKey, rTime, rTie, inner)
    GraftShims.ofRows(spark, plan)
  }

  /** The composed route for types the native exec can't compare as
    * primitives: [[graft.operators.AsOf.asOfJoinRawTime]] (the merge
    * window under the time columns' own ordering) reshaped to this API's
    * flat left-columns ++ right-columns output. Same exchange count as
    * the native plan (one per side); the window state machine replaces
    * the one-pass merge — the perf cliff is gone, only the constant
    * factor differs. */
  private def composedFallback(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String,
      inner: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    val rightCols = rightDf.columns.toSeq
    require(leftDf.columns.intersect(rightCols).isEmpty,
      "the composed as-of fallback flattens the right payload by NAME — " +
        s"alias colliding columns first " +
        s"(${leftDf.columns.intersect(rightCols).mkString(", ")})")
    // unify the key under one reserved name so the single-window merge
    // keys both sides identically even when the API names differ; a
    // right row with a null key never matches (native semantics), and a
    // null LEFT key simply forms a right-free partition -> null match
    val k = "__asof_k"
    require(!(leftDf.columns ++ rightCols).contains(k),
      s"input uses the reserved column name $k")
    val lTmp = leftDf.withColumn(k, col(leftKey))
    val rTmp = rightDf.where(col(rightKey).isNotNull).withColumn(k, col(rightKey))
    val m = "__asof_m"
    val joined = graft.operators.AsOf.asOfJoinRawTime(
      lTmp, rTmp, Seq(k), col(leftTime), col(rightTime),
      rightPayload = rightCols, matchedCol = m, tieBreak = Seq(rightTie))
    val base = if (inner) joined.where(col(m).isNotNull) else joined
    base.select(
      leftDf.columns.toSeq.map(col) ++
        rightCols.map(c => col(s"$m.$c").as(c)): _*)
  }
}
