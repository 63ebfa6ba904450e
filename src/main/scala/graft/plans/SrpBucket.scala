package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Native Catalyst expression: signed-random-projection LSH bucket id of a
 * numeric vector — bit `p` of the result is `[dot(v, w_p) > 0]` for
 * `nPlanes` pseudo-random ±1 hyperplanes.
 *
 * The hyperplane weights are the engine-portable parity formula shared with
 * the SQL oracles (`Registry.planeDotSql`): for plane `p`, dimension `d`,
 * `w = +1` iff `(1 + p·64 + d)² · 2654435761 mod 1e9+7` is odd, else `-1`.
 * Every product stays below 2⁶³ so the arithmetic is overflow-free and
 * evaluates identically in any engine. Dots accumulate left-to-right in
 * doubles — the same order as the `aggregate`-over-`zip_with` HOF
 * formulation this replaces, so bucket ids are bit-identical.
 *
 * Why an Expression and not higher-order functions: the HOF formulation is
 * interpreted (HOFs don't participate in codegen) and walks the vector once
 * per plane with a boxed intermediate array each time. This compiles (via
 * `doGenCode`) to ONE primitive loop computing all plane dots — the shape a
 * corpus-wide bucketing scan needs at 100 TB. It also accepts the raw
 * `array<float>` column directly (casting per element), removing the
 * `transform(embedding, cast)` pre-pass.
 *
 * Null semantics (matching the HOF stack it replaces, where a null dot
 * falls to the `otherwise(0)` branch of every plane): null input → bucket
 * 0; any null element → bucket 0. NaN semantics: SQL comparison treats NaN
 * as GREATER than every value (Spark and DuckDB alike), so a NaN dot sets
 * its plane's bit — Java's `>` alone would silently flip those bits to 0.
 */
case class SrpBucket(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 62, s"nPlanes must be in [1, 62], got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects array<float>/array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val float = elemIsFloat
      val dots = new Array[Double](nPlanes)
      var d = 0
      while (d < n) {
        if (arr.isNullAt(d)) return 0L // null element nulls every plane's dot
        val x = if (float) arr.getFloat(d).toDouble else arr.getDouble(d)
        var p = 0
        while (p < nPlanes) {
          val vi = 1L + p * 64L + d
          val par = vi * vi * 2654435761L % 1000000007L % 2L
          dots(p) += (if (par == 1L) x else -x)
          p += 1
        }
        d += 1
      }
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        // SQL `dot > 0` is true for NaN (NaN compares greatest)
        if (dots(p) > 0 || java.lang.Double.isNaN(dots(p))) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val getter =
      if (elemIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    val a = childGen.value
    val dots = ctx.freshName("dots")
    val nulled = ctx.freshName("nulled")
    val d = ctx.freshName("d")
    val p = ctx.freshName("p")
    val x = ctx.freshName("x")
    val vi = ctx.freshName("vi")
    val compute =
      s"""
         |double[] $dots = new double[$nPlanes];
         |boolean $nulled = false;
         |for (int $d = 0; $d < $a.numElements(); $d++) {
         |  if ($a.isNullAt($d)) { $nulled = true; break; }
         |  double $x = ${getter(a, d)};
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    long $vi = 1L + $p * 64L + $d;
         |    $dots[$p] += ($vi * $vi * 2654435761L % 1000000007L % 2L == 1L) ? $x : -$x;
         |  }
         |}
         |if (!$nulled) {
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    // SQL `dot > 0` is true for NaN (NaN compares greatest)
         |    if ($dots[$p] > 0 || Double.isNaN($dots[$p])) ${ev.value} |= (1L << $p);
         |  }
         |}
       """.stripMargin
    val nullCheck =
      if (child.nullable) s"if (!${childGen.isNull}) {\n$compute\n}"
      else compute
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        $nullCheck
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)

  override def prettyName: String = "srp_bucket"
}
