package graft.plans

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftx.Bridge

/** Whole-operator Catalyst extension (SURVEY.md §2 mapping (c)): native
  * top-k-per-group as a `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * stack, registered through `SparkSessionExtensions` (GraftExtensions).
  *
  * Why an operator and not the window idiom: `row_number() OVER
  * (PARTITION BY g ORDER BY o) <= k` shuffles and SORTS every input row —
  * at 100 TB that is a full-data exchange plus an n·log(n) sort per
  * partition, to then discard all but k rows per group. This operator
  * plans as partial → exchange → final: the PARTIAL instance runs
  * map-side and keeps a bounded k-row buffer per group, so the exchange
  * carries at most k rows per (group × input partition) — the same
  * partial-aggregation asymmetry that makes hash aggregates scale, applied
  * to a selection operator. The FINAL instance (after a hash exchange on
  * the grouping keys, inserted by `EnsureRequirements` from its declared
  * `ClusteredDistribution`) merges the survivors exactly.
  *
  * Exactness requires the ordering to be TOTAL (callers pass a unique
  * tiebreak, as the window idiom also needs for determinism): partial
  * top-k under a total order is closed under merge.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Physical operator; one class, two roles. `partial = true` consumes any
  * distribution (map-side, bounded memory: ≤ 2k rows buffered per live
  * group); `partial = false` declares `ClusteredDistribution(groupExprs)`
  * so the planner co-locates each group before the exact merge.
  *
  * Memory model: the in-heap map holds ≤ 2k rows per LIVE GROUP per
  * partition with no spill path — right for the bounded-k selection this
  * operator exists for, wrong for effectively-unbounded k (the window
  * idiom's spillable sort wins there; the auto-rewrite refuses k beyond
  * [[RewriteRankFilterToTopK.MaxRewriteK]] for exactly that reason).
  * The final instance emits rows sorted by (group, order) — the same
  * observable within-partition order the window plan produces. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val kk = k
    val isPartial = partial
    val budget = TopKPerGroup.partialBufferRowBudget
    child.execute().mapPartitions({ it =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(g, childOutput)
      val ord = RowOrdering.create(o, childOutput)
      // overflow-safe amortized-truncation threshold (2k, clamped)
      val trunc = math.min(2L * kk, (Int.MaxValue - 8).toLong).toInt
      val groups = new java.util.HashMap[UnsafeRow, ArrayBuffer[UnsafeRow]]()
      val rowOrd = ord.on((r: UnsafeRow) => r: InternalRow)

      if (isPartial) {
        // Streaming partial: per-group memory is bounded at 2k by the
        // amortized truncation, but the number of LIVE GROUPS is not — a
        // high-group-cardinality partition would grow the map without
        // bound where the window idiom's sort would have spilled. Guard:
        // once totalBuffered hits the row budget, further rows PASS
        // THROUGH unbuffered (each row is either buffered or emitted,
        // never both) — the partial cut is only an optimization, the
        // final instance merges exactly either way.
        new Iterator[InternalRow] {
          private var pending: InternalRow = null
          private var flush: Iterator[UnsafeRow] = null
          private var totalBuffered = 0L
          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val u = toUnsafe(it.next())
              val key = keyProj(u)
              var buf = groups.get(key)
              if (buf == null && totalBuffered < budget) {
                buf = new ArrayBuffer[UnsafeRow]
                groups.put(key.copy(), buf)
              }
              if (buf == null || totalBuffered >= budget) {
                pending = u.copy() // budget exhausted: degrade to pass-through
              } else {
                buf += u.copy()
                totalBuffered += 1
                if (buf.length >= trunc) {
                  val kept = buf.sorted(rowOrd).take(kk)
                  totalBuffered -= (buf.length - kept.length)
                  buf.clear()
                  buf ++= kept
                }
              }
            }
            if (pending == null && flush == null)
              flush = groups.values.asScala.iterator.flatMap(_.sorted(rowOrd).take(kk))
          }
          override def hasNext: Boolean = {
            advance()
            pending != null || flush.hasNext
          }
          override def next(): InternalRow = {
            advance()
            if (pending != null) { val r = pending; pending = null; r }
            else flush.next()
          }
        }
      } else {
        // Final instance: exact merge — must see every surviving row of a
        // group, so no pass-through; memory here is OUTPUT-scale (≤ k rows
        // per group survive the partial, truncation keeps ≤ 2k buffered).
        while (it.hasNext) {
          val u = toUnsafe(it.next())
          val key = keyProj(u) // project once (review r11); copy only on put
          var buf = groups.get(key)
          if (buf == null) {
            buf = new ArrayBuffer[UnsafeRow]
            groups.put(key.copy(), buf)
          }
          buf += u.copy()
          if (buf.length >= trunc) {
            val kept = buf.sorted(rowOrd).take(kk)
            buf.clear()
            buf ++= kept
          }
        }
        val perGroup = groups.values.asScala.iterator.flatMap(_.sorted(rowOrd).take(kk))
        // restore the window idiom's observable within-partition order
        // (group asc nulls first, then the user order) — output-sized
        val groupOrd = g.map(SortOrder(_, Ascending))
        val outOrd = RowOrdering.create(groupOrd ++ o, childOutput)
        perGroup.toIndexedSeq.sorted(outOrd.on((r: UnsafeRow) => r: InternalRow)).iterator
      }
    }, preservesPartitioning = true)
  }
}

/** Planner strategy: TopKPerGroupNode → final(partial(child)). Grouping
  * keys are float-normalized HERE — expressions are resolved by planning
  * time (the API hands the node unresolved `col(...)`s), and both entry
  * paths (explicit API + rewrite rule) funnel through this strategy. */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val ng = TopKPerGroup.normalizedGroups(g)
      TopKPerGroupExec(ng, o, k, partial = false,
        TopKPerGroupExec(ng, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Partial-side buffered-row budget per task (guards total map size
    * across groups, not per group — see the pass-through note in
    * doExecute). 1M rows ≈ low hundreds of MB of UnsafeRow copies at
    * typical widths, comfortably inside an executor's task share; beyond
    * it the partial degrades gracefully to a pass-through. @volatile var
    * so the spec can shrink it to force the degraded path. */
  @volatile var partialBufferRowBudget: Long = 1L << 20

  /** Grouping keys must be normalized the way Window/Aggregate keys are
    * (NormalizeFloatingNumbers): raw UnsafeRow grouping would split
    * 0.0 / -0.0 (and NaN bit patterns) into distinct groups and silently
    * diverge from the window idiom. No-op for non-floating types.
    * RESOLVED expressions only (needs dataType) — called from the
    * planner strategy, never on API-constructed unresolved columns. */
  private[plans] def normalizedGroups(g: Seq[Expression]): Seq[Expression] =
    g.map(Bridge.normalizeFloats)

  /** Public entry: top `k` rows per group under a TOTAL `orderCols` order.
    * Requires a session built with GraftExtensions (for the strategy). */
  def apply(df: DataFrame, k: Int, groupCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    // Clear API error (review r11): empty grouping otherwise dies deep in
    // physical planning with an internal ClusteredDistribution require.
    // Global top-k is df.orderBy(...).limit(k) — already optimal
    // (TakeOrderedAndProject), no custom operator needed.
    require(groupCols.nonEmpty,
      "TopKPerGroup requires at least one group column; for a global " +
        "top-k use df.orderBy(...).limit(k)")
    require(orderCols.nonEmpty, "TopKPerGroup requires at least one order column")
    val sess = df.sparkSession
    val g = groupCols.map(Bridge.expr(sess, _))
    val o = orderCols.map(Bridge.expr(sess, _)).map {
      case s: SortOrder => s
      case e            => SortOrder(e, Ascending)
    }
    Bridge.ofRows(sess, TopKPerGroupNode(g, o, k, Bridge.analyzedPlan(df)))
  }
}
