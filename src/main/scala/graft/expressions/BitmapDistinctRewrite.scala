package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite `COUNT(DISTINCT <bigint attr>)` into the
  * native mergeable-bitmap aggregate [[BitmapDistinct]].
  *
  * Why: Catalyst plans distinct aggregation via RewriteDistinctAggregates
  * — an Expand (one row per distinct-group per input row) plus a second
  * keyed exchange whose volume grows with distinct (group, id)
  * observations; MIXED distinct + non-distinct aggregates in one
  * Aggregate pay the Expand on every row. The bitmap aggregate is an
  * ordinary two-phase aggregate whose partial state is the bitmap itself,
  * so after this rewrite the whole Aggregate (distinct and plain
  * aggregates alike) plans as ONE hash aggregate pair — no Expand, one
  * exchange (measured 0.32 s vs 0.52 s on the oracle-paired
  * agg_bitmap / agg_bitmap_native twin even at sf0.1).
  *
  * Fires only when provably equivalent:
  *   - the distinct child is a single `bigint` ATTRIBUTE (no expression
  *     re-evaluation questions, no other types);
  *   - no FILTER clause on the aggregate (BitmapDistinct has no filter
  *     path);
  *   - both ignore nulls, so semantics match exactly: COUNT(DISTINCT x)
  *     skips null x, and so does the bitmap update.
  *
  * The trade this opts into (why it is NOT default-on in the extension):
  * per-group memory becomes live-id-domain/64 bytes — dense id spaces
  * compress 64:1, but a sparse 60-bit domain degrades toward 16 bytes/id.
  * Deployments with hashed/sparse ids should prefer the HLL sketch or
  * plain COUNT(DISTINCT); the rule therefore gates on
  * `spark.graft.rewriteDistinctCount = true` (session-settable, default
  * off) so the choice is explicit per workload.
  *
  * Runs inside the operator-optimization batch, i.e. BEFORE the
  * RewriteDistinctAggregates batch — after that rewrite the COUNT
  * DISTINCT shape no longer exists to match (spec pins the ordering by
  * asserting no Expand survives).
  */
object BitmapDistinctRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rewriteDistinctCount", "false").toBoolean) return plan
    plan.transform {
      case agg @ Aggregate(_, aggExprs, _, _) =>
        val rewritten = aggExprs.map(_.transform {
          case AggregateExpression(Count(Seq(a: Attribute)), Complete, true, None, _)
              if a.dataType == LongType =>
            BitmapDistinct(a).toAggregateExpression()
        }.asInstanceOf[NamedExpression])
        // only allocate a new node when something actually matched — the
        // optimizer batch re-runs to fixed point, and copying every
        // Aggregate each iteration is pure churn
        if (rewritten.zip(aggExprs).forall { case (r, o) => r eq o }) agg
        else agg.copy(aggregateExpressions = rewritten)
    }
  }
}
