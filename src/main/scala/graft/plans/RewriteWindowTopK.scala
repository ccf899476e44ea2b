package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (tier (c)'s `Rule[LogicalPlan]` leg): rewrite the
  * `ROW_NUMBER() OVER (PARTITION BY k ORDER BY s) <= n` filter-over-window
  * pattern into [[TopKPerKeyNode]], so ANY user query written in the
  * idiomatic window style gets the bounded-heap partial/final plan instead
  * of a full per-group sort — they don't need to know the operator exists.
  *
  * Deliberately narrow guards (single row_number window expression,
  * attribute-only partition keys, a plain `rank <= lit` / `< lit` / `= 1`
  * comparison): anything else keeps Spark's own plan. Spark's
  * InferWindowGroupLimit may already have inserted a WindowGroupLimit under
  * the Window — that node presorts groups, which is exactly the work this
  * operator avoids, so it is stripped.
  *
  * Injected via [[graft.functions.GraftExtensions]] alongside the strategy
  * that plans the node.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private def limitFrom(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) =>
      Some(v)
    case LessThan(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) =>
      Some(v - 1)
    case EqualTo(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) && v == 1 =>
      Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(parts, order, _)), _)
            if parts.nonEmpty && parts.forall(_.isInstanceOf[Attribute]) &&
              order.nonEmpty =>
          limitFrom(cond, a.toAttribute) match {
            case Some(k) if k > 0 =>
              // WindowGroupLimit under the window presorts each group —
              // redundant below the heap operator
              val child = w.child match {
                case wgl: WindowGroupLimit => wgl.child
                case c => c
              }
              TopKPerKeyNode(parts.map(_.asInstanceOf[Attribute]), order, k,
                a.toAttribute, child)
            case _ => f
          }
        case _ => f
      }
  }
}
