package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `cosine_sim(x, x)` is 1.0 by definition (for any
  * non-degenerate x) — fold it so self-similarity terms vanish from
  * pair-join plans instead of running the dot-product kernel per row.
  */
object SelfCosineFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(a, b) if a.semanticEquals(b) && a.deterministic =>
      Literal(1.0, DoubleType)
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
    ext.injectOptimizerRule(_ => SelfCosineFold)
  }
}

object GraftExtensions {
  /** Same registrations applied to an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, "cosine_sim",
      children => CosineSimilarity(children(0), children(1)))
}
