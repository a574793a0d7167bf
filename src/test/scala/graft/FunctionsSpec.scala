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

  test("Shingles expression is byte-identical to the composable HOF form") {
    // the r16 codegen'd shingler must reproduce the transform/slice/
    // array_join chain exactly — incl. the three edge semantics the chain
    // implies: null/short input -> EMPTY array (the otherwise branch),
    // null ELEMENTS skipped by the join (array_join default), empty-string
    // elements kept
    val rows = Seq(
      "alpha beta gamma delta eps",
      "one two three",
      "too short",
      "",
      null,
      "a  b c d" // double space -> empty token from split
    )
    val df = rows.toDF("text")
      .select(col("text"), F.split(F.trim(col("text")), " ").as("t"))
    for (w <- Seq(2, 3, 4)) {
      val composable = F.when(F.size(col("t")) >= w,
          F.transform(F.sequence(F.lit(1), F.size(col("t")) - (w - 1)),
            i => F.array_join(F.slice(col("t"), i, F.lit(w)), " ")))
        .otherwise(F.array().cast("array<string>"))
      val got = df.select(graft.engine.Text.shinglesOf(col("t"), w).as("n"),
          composable.as("c"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"w=$w: native shingles diverged from the composable form")
      }
    }
    // null ELEMENT skip semantics (split never produces them, but the
    // contract must hold for any caller)
    val withNull = Seq(1).toDF("i")
      .select(F.array(F.lit("x"), F.lit(null).cast("string"), F.lit("y"),
        F.lit("z")).as("t"))
    val n = withNull.select(graft.engine.Text.shinglesOf(col("t"), 3).as("n"))
      .collect().head.getSeq[String](0)
    val c = withNull.select(F.transform(F.sequence(F.lit(1), F.lit(2)),
        i => F.array_join(F.slice(col("t"), i, F.lit(3)), " ")).as("c"))
      .collect().head.getSeq[String](0)
    assert(n === c && n === Seq("x y", "y z"),
      "null elements must be skipped by the join, exactly like array_join")
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
