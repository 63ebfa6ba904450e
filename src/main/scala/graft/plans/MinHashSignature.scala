package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst expression: the full MinHash signature of a token array —
 * 3-gram shingle hashes fed through `nHashes` affine permutations
 * `(a_p·h + b_p) mod 1e9+7`, keeping the minimum of each. One primitive
 * long-loop pass per row.
 *
 * Why an Expression and not higher-order functions: the HOF formulation
 * (`transform` per permutation + `array_min`) is interpreted (higher-order
 * functions don't participate in codegen), allocates one boxed array per
 * permutation per row, and its 16-expression projection is a large plan to
 * compile. This compiles (via `doGenCode`) to two nested primitive loops —
 * the shape a corpus-scale dedup scan needs. Interpreted `nullSafeEval`
 * matches codegen exactly (same arithmetic, same order).
 *
 * The modulus keeps every product below 2⁶³ (h < 1e9+7, a_p < 2³¹), so the
 * arithmetic is overflow-free — the same reason the SQL-portable variants
 * in `graft.queries` use it.
 *
 * Semantics: null input → null; null tokens hash as empty strings; fewer
 * than 3 tokens → all-sentinel signature (callers filter those rows).
 */
case class MinHashSignature(child: Expression, nHashes: Int = 16)
    extends UnaryExpression {

  import MinHashSignature._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val n = tk.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = tokenHash(if (tk.isNullAt(i)) null else tk.getUTF8String(i))
      i += 1
    }
    val sigs = Array.fill(nHashes)(Long.MaxValue)
    var j = 0
    while (j + 2 < n) {
      val h = ((th(j) * 31 + th(j + 1)) % Mod * 31 + th(j + 2)) % Mod
      var p = 0
      while (p < nHashes) {
        val v = (h * (PermA0 + PermAStep * p) + (PermB0 + PermBStep * p)) % Mod
        if (v < sigs(p)) sigs(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSignature.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, tk => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val sigs = ctx.freshName("sigs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $tk.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $th[$i] = $cls.tokenHash($tk.isNullAt($i) ? null : $tk.getUTF8String($i));
         |}
         |long[] $sigs = new long[$nHashes];
         |java.util.Arrays.fill($sigs, Long.MAX_VALUE);
         |for (int $j = 0; $j + 2 < $n; $j++) {
         |  long $h = (($th[$j] * 31L + $th[$j + 1]) % ${Mod}L * 31L + $th[$j + 2]) % ${Mod}L;
         |  for (int $p = 0; $p < $nHashes; $p++) {
         |    long $v = ($h * (${PermA0}L + ${PermAStep}L * $p) + (${PermB0}L + ${PermBStep}L * $p)) % ${Mod}L;
         |    if ($v < $sigs[$p]) $sigs[$p] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** 1e9+7: permutation field modulus — keeps all products under 2⁶³. */
  val Mod: Long = 1000000007L
  val PermA0: Long = 1103515245L
  val PermAStep: Long = 7919L
  val PermB0: Long = 12345L
  val PermBStep: Long = 104729L

  /** Polynomial byte hash `h = (h·31 + byte) mod 1e9+7` — engine-portable
    * (any SQL engine reproduces it over the character codes), which is what
    * lets the whole minhash+LSH pipeline carry an exact SQL oracle. On
    * ASCII text byte values ARE the character codes the oracle sums. */
  def tokenHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    if (s == null) return 0L
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) { h = (h * 31 + (s.getByte(i) & 0xff)) % Mod; i += 1 }
    h
  }
}
