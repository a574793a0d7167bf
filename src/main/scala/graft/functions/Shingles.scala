package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd w-token shingles over a token array — one tight loop per row.
  *
  * The composable form (`Text.shinglesOf`:
  * `transform(sequence(1, n-w+1), i -> array_join(slice(t, i, w), " "))`)
  * is semantically identical but stacks three interpreted evaluations per
  * SHINGLE: higher-order `transform` runs its lambda on the fallback path,
  * `slice` copies a w-element array per index, and `array_join` walks that
  * copy — measured ~half the task time of the shingle-family queries, and
  * re-run in every stage that consumes the shingle relation (the relation
  * is deliberately recomputed rather than materialized: at corpus scale
  * the shingles are ~w× the text bytes, so recompute-in-stage is the
  * right trade and per-row cost is exactly what matters).  This
  * expression emits the joined w-grams directly from the source array —
  * no index sequence, no per-shingle slice copy — inside whole-stage
  * codegen.
  *
  * Exact-equivalence contract with the composable form (the DuckDB oracles
  * restate that form in SQL, so every byte must match):
  *  - NULL input array and size < w both yield an EMPTY array, never null
  *    (`when(size(t) >= w, ...).otherwise(array())` — size(NULL) is NULL,
  *    which falls through to the otherwise branch);
  *  - NULL elements are SKIPPED by the join, matching `array_join`'s
  *    default (UTF8String.concatWs has identical skip-null semantics);
  *  - empty-string elements are kept, `" "` separator between every
  *    retained pair.
  *
  * `w` must be a foldable non-negative INT — it shapes the generated code.
  */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        val wv = right.eval()
        if (wv == null || wv.asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure(
            s"graft_shingles width must be a literal >= 1, got $wv")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires (ARRAY<STRING>, literal INT), got ${l.sql} and ${r.sql}")
    }

  private lazy val w: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // empty array on null/short input — never null (the `otherwise` branch)
  override def nullable: Boolean = false

  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return new GenericArrayData(new Array[Any](0))
    val arr = t.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(new Array[Any](0))
    val m = n - (w - 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](w)
      var j = 0
      while (j < w) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Shingles.Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = left.genCode(ctx)
    val sep = ctx.addReferenceObj("sep", Shingles.Sep,
      "org.apache.spark.unsafe.types.UTF8String")
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    val n = ctx.freshName("n")
    val m = ctx.freshName("m")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val out = ctx.freshName("out")
    val parts = ctx.freshName("parts")
    val resultCode =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (${childGen.isNull} || ${childGen.value}.numElements() < $w) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  int $n = ${childGen.value}.numElements();
         |  int $m = $n - ${w - 1};
         |  Object[] $out = new Object[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    $utf8[] $parts = new $utf8[$w];
         |    for (int $j = 0; $j < $w; $j++) {
         |      $parts[$j] = ${childGen.value}.isNullAt($i + $j)
         |        ? null : ${childGen.value}.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $utf8.concatWs($sep, $parts);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Shingles {
  private[functions] val Sep: UTF8String = UTF8String.fromString(" ")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Shingles].getName, "graft_shingles")
}
