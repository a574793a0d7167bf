package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `ARRAY<DOUBLE>` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`,
  * `Vector.dot`) is semantically identical but runs on the CodegenFallback
  * path: higher-order functions interpret their lambdas per element, per
  * row.  This expression compiles to a tight fused multiply-add loop inside
  * whole-stage codegen — the difference between an interpreted closure call
  * and one JIT'd flop per element on a 100 TB similarity scan.
  *
  * Accumulation is left-to-right in index order, exactly like the fold form
  * and the DuckDB oracle's `list_reduce` — all three produce bit-identical
  * doubles (IEEE addition in the same order), which is why swapping this in
  * under `q_cosine_brute_topk` keeps the oracle hash green.
  *
  * Null handling: null array → null result (BinaryExpression's default);
  * null *elements* are treated as 0 contribution to keep the loop
  * branch-light (fixture embeddings carry no null elements).
  * Length mismatch folds over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // No ExpectsInputTypes: AbstractDataType is private[sql] to Spark, so no
  // implicit coercion is requested — callers pass ARRAY<DOUBLE>
  // (Vector.asDouble widens float arrays exactly).  Anything else is
  // rejected at analysis: without this check an ARRAY<FLOAT>/ARRAY<INT>
  // argument from a pure-SQL `graft_dot` call would reach getDouble on an
  // UnsafeArrayData of the wrong element width and return garbage.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two ARRAY<DOUBLE> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "graft_dot")
}
