package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: collapse the interpreted higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProductI64]] kernel. The HOF chain evaluates
  * three lambda expression trees per element, interpreted; the native
  * expression is one fused multiply-accumulate loop inside whole-stage
  * codegen (~20% on the sim_topk shape, measured in PLANS.md) — and with
  * this rule a user who writes the natural declarative form gets the
  * kernel without knowing it exists, the same contract as Catalyst's own
  * `RewriteAsOfJoin`/`OptimizeCsvJsonExprs` rewrites.
  *
  * Fires only when the shapes are provably equivalent:
  *   - both inputs are `array<bigint>` with `containsNull = false`
  *     (a null element makes the HOF yield NULL where the native loop
  *     would read garbage — so nullable-element arrays are left alone);
  *   - zero literal is `0L` and merge/finish are the exact fold shape
  *     (multiply of the two zip lambda vars in either order, add of the
  *     accumulator and element in either order, identity finish);
  *   - multiply and add agree on eval mode, and it is LEGACY or ANSI
  *     (TRY declines — its null-on-overflow has no kernel form). The
  *     kernel inherits the mode: LEGACY folds with wrapping arithmetic,
  *     ANSI (the Spark 4 session default) with Math.*Exact, so an
  *     overflow still raises exactly as the interpreted fold would.
  *
  * One pinned divergence, inherited from the kernel family's contract
  * (VectorExpressions): on a LENGTH MISMATCH the HOF pads with null and
  * yields NULL, while the kernel raises — fail-fast beats a silent null
  * for malformed vector data. Sessions that need the null behavior on
  * ragged arrays should not install the rule (it ships via
  * [[GraftExtensions]], never force-registered).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def longArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, NumericEvalContext(mulMode, _)),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(Add(ax, av, NumericEvalContext(addMode, _)),
            Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
        if mulMode == addMode && mulMode != EvalMode.TRY
          && longArrayNoNulls(a) && longArrayNoNulls(b)
          && ((sameVar(mx, zx) && sameVar(my, zy)) || (sameVar(mx, zy) && sameVar(my, zx)))
          && ((sameVar(ax, acc) && sameVar(av, elem)) || (sameVar(ax, elem) && sameVar(av, acc)))
          && sameVar(fin, facc) =>
      DotProductI64(a, b, failOnError = mulMode == EvalMode.ANSI)
  }
}
