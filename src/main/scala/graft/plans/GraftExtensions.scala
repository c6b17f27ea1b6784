package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MaxMultiplicity, QDotLong, SlidingMin}

/** Session-extension entry point: install the engine's custom Catalyst
  * surface via `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  *
  * Deliberately small. Per SURVEY §4, every reference-parity operator
  * is expressible with Catalyst built-ins — predicate pushdown, column
  * pruning, join selection and partial aggregation come free from the
  * optimizer, and hand-written rules would only duplicate it. Custom
  * code enters exactly where built-ins cannot express or cannot reach
  * the needed shape:
  *
  *  - scalar kernels -> native `Expression` with codegen
  *    ([[graft.functions.CosineSimilarity]], injected here as SQL
  *    function `cosine_sim`);
  *  - whole-operator semantics -> composed built-ins first
  *    ([[graft.operators.AsOfJoin]] is one window pass, no custom
  *    SparkPlan needed); a `Rule[LogicalPlan]` + `SparkStrategy` +
  *    physical node would slot in via `injectOptimizerRule` /
  *    `injectPlannerStrategy` below if an operator ever demands its
  *    own execution (none does at the current surface).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction(
      (new FunctionIdentifier("sliding_min"),
        new ExpressionInfo(classOf[SlidingMin].getName, "sliding_min"),
        (children: Seq[Expression]) => SlidingMin(children(0), children(1))))
    ext.injectFunction(
      (new FunctionIdentifier("qdot_long"),
        new ExpressionInfo(classOf[QDotLong].getName, "qdot_long"),
        (children: Seq[Expression]) => QDotLong(children(0), children(1))))
    ext.injectFunction(
      (new FunctionIdentifier("max_multiplicity"),
        new ExpressionInfo(classOf[MaxMultiplicity].getName, "max_multiplicity"),
        (children: Seq[Expression]) => MaxMultiplicity(children(0))))
  }
}
