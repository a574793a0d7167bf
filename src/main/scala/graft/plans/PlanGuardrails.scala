package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Analysis-time plan guardrail, injected via
  * `SparkSessionExtensions.injectCheckRule` (see
  * [[graft.functions.GraftExtensions]]): every plan analyzed in a
  * graft-configured session is screened for the engine's one
  * unconditionally-banned shape — the partition-less ordered Window.
  *
  * `row_number().over(Window.orderBy(...))` with no `partitionBy` funnels
  * EVERY row through a single task: correct at fixture scale, a silent
  * 1000×-slowdown (or OOM) at corpus scale.  The round-3 audit found two of
  * these hiding inside green queries; the engine-wide rewrite is
  * `Relational.withGlobalRowOffsets` (two-stage per-page offsets).  This
  * check turns that lesson from a review finding into an analysis error —
  * the query FAILS at plan time, in any session built by
  * [[graft.GraftSession]], before a single row moves.
  *
  * Deliberately narrow: cartesian joins are NOT banned here (a cross join
  * against a 1-row aggregate — densify width, corpus-N — is legitimate and
  * analysis time cannot see cardinality; the exchange-budget and
  * no-cartesian specs police those per-query).  Escape hatch for a
  * knowingly-bounded global window:
  * `spark.graft.guardrails.noGlobalWindow=false`. */
object PlanGuardrails {

  val ConfKey = "spark.graft.guardrails.noGlobalWindow"

  def check(spark: SparkSession)(plan: LogicalPlan): Unit =
    if (spark.conf.get(ConfKey, "true") == "true")
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty =>
          throw new IllegalStateException(
            "graft guardrail: partition-less ordered Window — every row " +
              "would flow through ONE task at scale.  Partition the window, " +
              "use Relational.withGlobalRowOffsets for global numbering, or " +
              s"set $ConfKey=false for a knowingly-bounded input.")
        case _ => ()
      }
}
