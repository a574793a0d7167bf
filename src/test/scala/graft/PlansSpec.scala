package graft

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.plans.PlanGuardrails

/** Analysis-time guardrails (graft.plans.PlanGuardrails, injected by
  * GraftExtensions into every GraftSession).  The rule logic is exercised
  * directly against analyzed plans; the injection path itself is exercised
  * operationally by every Verify/Bench/Explain run (all 127 registered
  * queries must analyze clean under the check). */
class PlansSpec extends SparkFunSuite {
  import spark.implicits._

  test("guardrail trips on partition-less ordered Window, passes partitioned + offset forms") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "v")
    val bad = df.withColumn("rn", row_number().over(W.orderBy("k")))
    val e = intercept[IllegalStateException](
      PlanGuardrails.check(spark)(bad.queryExecution.analyzed))
    assert(e.getMessage.contains("withGlobalRowOffsets"), "error must name the fix")

    PlanGuardrails.check(spark)(
      df.withColumn("rn", row_number().over(W.partitionBy("v").orderBy("k")))
        .queryExecution.analyzed)
    PlanGuardrails.check(spark)(
      graft.engine.Relational.withGlobalRowOffsets(df, "v", "k")
        .queryExecution.analyzed)
  }

  test("guardrail honors the conf escape hatch for knowingly-bounded inputs") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val bad = df.withColumn("rn", row_number().over(W.orderBy("k")))
    val ss = spark.newSession()
    ss.conf.set(PlanGuardrails.ConfKey, "false")
    PlanGuardrails.check(ss)(bad.queryExecution.analyzed) // must not throw
  }
}
