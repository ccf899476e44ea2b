package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: installs the engine's native
  * functions into every session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * This is the (c)-tier registration path from the build guidelines —
  * extension-injected functions resolve in pure SQL with no session-side
  * `register` call, which is what a deployed cluster uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      CosineSimilarity.build _))
    ext.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      HilbertIndex.build _))
    // whole-operator tier: the top-k-per-key physical strategy, plus the
    // optimizer rule that rewrites row_number()<=k window plans onto it
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
