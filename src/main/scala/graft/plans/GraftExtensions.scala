package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `sorted_intersect_count(x, x)` is the element count
  * of x — the merge loop over two identical arrays matches every
  * element, sorted or not. `Size` preserves null semantics exactly
  * (null in → null out, matching the expression's null-intolerance),
  * so the rewrite is sound for every input, unlike a naive
  * `cosine_sim(x, x) → 1.0` fold would be (null → 1.0, zero vector's
  * NaN → 1.0).
  */
object SelfIntersectFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case SortedIntersectCount(a, b) if a.semanticEquals(b) && a.deterministic =>
      Size(a)
  }
}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions under SQL names (so `spark.sql("... cosine_sim(a, b)
  * ...")` works) and graft's optimizer rules. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectOptimizerRule(_ => SelfIntersectFold)
  }
}

object GraftExtensions {
  /** Same registrations applied to an already-running session (keeps
    * the two enablement paths equivalent).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, "cosine_sim",
      children => CosineSimilarity(children(0), children(1)))
    if (!spark.experimental.extraOptimizations.contains(SelfIntersectFold))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfIntersectFold
  }
}
