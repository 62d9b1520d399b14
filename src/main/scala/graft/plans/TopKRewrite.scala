package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the universal top-k idiom
  *
  *   `Project(cols without rn) ← Filter(rn ≤ k) ← Window(rn = row_number)`
  *
  * into the native [[TopKPerGroupNode]] whenever the rank column is
  * discarded — users keep writing the portable window form and the
  * engine silently substitutes the partial/final bounded-buffer operator
  * (≤ k rows per group per partition cross the exchange, no full-input
  * sort; see TopKPerGroupExec). Spark's own InferWindowGroupLimit runs in
  * a LATER optimizer batch and only prunes rows ahead of the window sort;
  * this rewrite removes the window entirely.
  *
  * Guards (bail = keep the window plan):
  *  - exactly one window expression, and it is a plain `row_number()`;
  *  - the filter condition is solely `rn <= k` / `rn < k` / `rn = 1`;
  *  - the projection references only child columns (rank is dropped);
  *  - the window has both partition and order specs;
  *  - k ≤ [[MaxRewriteK]] (bounded-buffer memory stays the win);
  *  - grouping keys are float-normalized like Window's own would be.
  * Ties: row_number under a non-total order is already nondeterministic
  * in the window form; the rewrite preserves the deterministic cases and
  * is no worse on the nondeterministic ones. */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** Largest k the rewrite will touch: beyond this the bounded-buffer
    * operator's in-heap per-group state (no spill) loses to the window
    * plan's spillable sort, so an effectively-unbounded k (a "keep
    * everything" sentinel) must keep its original plan. */
  val MaxRewriteK = 1024

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(), _: WindowSpecDefinition), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      // limitOf evaluated ONCE (review r11 — the old guard+body form
      // re-derived it per matched node); no valid k → node unchanged
      limitOf(cond, al.toAttribute) match {
        case Some(k) if k > 0 && k <= MaxRewriteK =>
          Project(projectList, TopKPerGroupNode(partitionSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
