package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration surface for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `GraftExtensions` for session construction time
  *    (`SparkSession.builder.withExtensions(new GraftExtensions)`, or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`) — makes
  *    `graft_dot` available to pure-SQL users;
  *  - `ensureRegistered(spark)` for programmatic use against an existing
  *    session (idempotent) — the engine's frame-level operators call it
  *    through `df.sparkSession`, so callers need no setup.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      DotProduct.info,
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cos"),
      CosineSim.info,
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      Shingles.info,
      (children: Seq[Expression]) => Shingles(children(0), children(1))))
    // analysis-time guardrail: ban the partition-less ordered Window
    // engine-wide (graft.plans.PlanGuardrails — conf-gated escape hatch)
    ext.injectCheckRule(spark => graft.plans.PlanGuardrails.check(spark))
    // whole-operator extension: per-key bounded-heap top-k
    // (graft.plans.TopKPerKey — logical node + strategy + physical exec)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // optimizer rewrite: Project(Filter(row_number <= k, Window)) with the
    // rank dropped → the heap operator, automatically (conf-gated)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
  }
}

object GraftFunctions {
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (children: Seq[Expression]) => DotProduct(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cos",
      (children: Seq[Expression]) => CosineSim(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      (children: Seq[Expression]) => Shingles(children(0), children(1)),
      "built-in")
  }
}
