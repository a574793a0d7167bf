package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.engine.{Relational, Tables}

class IoSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange (co-located join)") {
    val left = (1L to 200L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 200L).map(i => (i, i * 2)).toDF("k2", "rv")
    Tables.writeBucketed(left, "spec_left_b", "k", 4)
    Tables.writeBucketed(right, "spec_right_b", "k2", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("spec_left_b")
        .join(spark.table("spec_right_b"), col("k") === col("k2"))
      assert(joined.count() === 200)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, "bucketed join must not shuffle either side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("saltedSum equals the direct aggregation") {
    val df = (1L to 5000L).map(i => (if (i % 100 == 0) "cold" else "hot", i))
      .toDF("key", "v")
    val direct = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = Relational.saltedSum(df, Seq("key"), col("v"), col("v"), 16, "s")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted === direct)
  }

  test("probeSchema reads only the footer and returns field names") {
    val dir = java.nio.file.Files.createTempDirectory("probe").toString + "/t"
    Seq((1, "x")).toDF("a", "b").write.parquet(dir)
    assert(Tables.probeSchema(spark, dir).fieldNames.toSet === Set("a", "b"))
  }
}
