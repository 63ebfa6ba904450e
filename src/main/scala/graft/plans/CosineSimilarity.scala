package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression: cosine similarity of two numeric vectors,
 * `dot(a,b) / (‖a‖·‖b‖)`, accumulated left-to-right in doubles.
 *
 * Why an Expression and not a UDF / higher-order functions: the
 * `zip_with` + `aggregate` formulation materialises an intermediate array
 * and boxes per element; this compiles (via `doGenCode`) into a primitive
 * loop over the two `ArrayData` buffers inside whole-stage codegen — the
 * hot-path shape a 100 TB similarity scan needs. Interpreted `nullSafeEval`
 * matches codegen bit-for-bit (same accumulation order), so results are
 * identical whichever path Spark picks.
 *
 * Null semantics: null input → null; null elements are skipped on both
 * sides of every product; zero norm → null.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val (la, lb) = (av.numElements(), bv.numElements())
    def at(v: ArrayData, i: Int, float: Boolean): Double =
      if (float) v.getFloat(i).toDouble else v.getDouble(i)
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    var dot = 0.0
    var i = 0
    val n = math.min(la, lb)
    while (i < n) {
      if (!av.isNullAt(i) && !bv.isNullAt(i)) dot += at(av, i, fa) * at(bv, i, fb)
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < la) { if (!av.isNullAt(i)) { val x = at(av, i, fa); na += x * x }; i += 1 }
    var nb = 0.0
    i = 0
    while (i < lb) { if (!bv.isNullAt(i)) { val x = at(bv, i, fb); nb += x * x }; i += 1 }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(v: String, i: String, float: Boolean): String =
      if (float) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $dot += (${getter(a, i, fa)}) * (${getter(b, i, fb)});
         |  }
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) { double $x = ${getter(a, i, fa)}; $na += $x * $x; }
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if (!$b.isNullAt($i)) { double $x = ${getter(b, i, fb)}; $nb += $x * $x; }
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
