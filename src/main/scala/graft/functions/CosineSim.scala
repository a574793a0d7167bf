package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused codegen'd cosine similarity over two `ARRAY<DOUBLE>` columns.
  *
  * The composed form (`graft_dot(a,b) / (sqrt(graft_dot(a,a)) *
  * sqrt(graft_dot(b,b)))`) walks both arrays THREE times per candidate
  * pair; on the LSH/IVF re-rank paths that is the entire inner loop of a
  * 100 TB similarity scan.  This expression accumulates all three sums in
  * ONE pass — per element: one load of each side, three fused
  * multiply-adds — inside whole-stage codegen.
  *
  * Bit-parity with the composed form (asserted in VectorSpec, which is what
  * keeps the DuckDB oracles green after swapping it in): each of the three
  * accumulators sums in index order exactly as its standalone `graft_dot`
  * would — fusing loops reorders NO additions — and the final
  * `dot / (sqrt(na) * sqrt(nb))` is the same IEEE expression tree.
  *
  * Null handling mirrors the composed form: null array → null (binary
  * default); a null ELEMENT contributes 0 to the products it touches
  * (`a·b` skips index i when either side is null there; `a·a` only when
  * `a` is); lengths may differ — `a·b` folds the common prefix, each norm
  * its own full length.  Zero-norm input divides by zero → ±Infinity/NaN,
  * identical to the composed form in both engines. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cos requires two ARRAY<DOUBLE> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cos"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.max(na, nb)
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      val aOk = i < na && !x.isNullAt(i)
      val bOk = i < nb && !y.isNullAt(i)
      if (aOk) { val v = x.getDouble(i); sa += v * v; if (bOk) dot += v * y.getDouble(i) }
      if (bOk) { val v = y.getDouble(i); sb += v * v }
      i += 1
    }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val aOk = ctx.freshName("aOk")
      val bOk = ctx.freshName("bOk")
      val v = ctx.freshName("v")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |double $dot = 0.0; double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $aOk = $i < $na && !$a.isNullAt($i);
         |  boolean $bOk = $i < $nb && !$b.isNullAt($i);
         |  if ($aOk) {
         |    double $v = $a.getDouble($i);
         |    $sa += $v * $v;
         |    if ($bOk) { $dot += $v * $b.getDouble($i); }
         |  }
         |  if ($bOk) {
         |    double $v = $b.getDouble($i);
         |    $sb += $v * $v;
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSim].getName, "graft_cos")
}
