package graft

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions.{col, udaf}

import graft.functions.WeightedMean

/** Custom-surface suite: the typed Aggregator (WeightedMean). */
class FunctionsSpec extends SparkFunSuite {
  import spark.implicits._

  private val wmean = udaf(new WeightedMean(), Encoders.product[(Double, Double)])

  test("WeightedMean: exact value, partition-order independent, NaN on zero weight") {
    val df = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 0.5)).toDF("v", "w")
    val expected = (10.0 * 1.0 + 20.0 * 3.0 + 30.0 * 0.5) / 4.5
    for (parts <- Seq(1, 2, 7)) {
      val got = df.repartition(parts).agg(wmean(col("v"), col("w")))
        .collect().head.getDouble(0)
      assert(got === expected, s"partitioning ($parts) must not change the mean")
    }
    val zw = Seq((10.0, 0.0)).toDF("v", "w")
      .agg(wmean(col("v"), col("w"))).collect().head.getDouble(0)
    assert(zw.isNaN, "zero total weight is NaN, not a silent 0 or a crash")
  }

  test("WeightedMean matches the decimal-sum column form (the dsum contract)") {
    val df = (1L to 500L).map(i => (i * 0.37, (i % 9 + 1).toDouble)).toDF("v", "w")
    val viaUdaf = df.agg(wmean(col("v"), col("w"))).collect().head.getDouble(0)
    val viaCols = df.agg(
        (F.sum((col("v") * col("w")).cast("decimal(38,6)")).cast("double")
          / F.sum(col("w").cast("decimal(38,6)")).cast("double")))
      .collect().head.getDouble(0)
    assert(viaUdaf === viaCols,
      "hand-rolled quantization must equal Catalyst's double->decimal cast")
  }
}
