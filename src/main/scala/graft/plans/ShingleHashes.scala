package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the distinct 64-bit hashes of a token array's
 * word 3-grams — bit-identical to
 * `array_distinct(transform(..., xxhash64(concat_ws(' ', slice(tk, i, 3)))))`
 * (same UTF-8 byte stream, same xxhash64 seed), but computed in one
 * primitive pass per row instead of an interpreted higher-order-function
 * stack that allocates a sliced array and a concatenated string per shingle.
 *
 * This feeds the inverted-index dedup (`Pipeline.e2JaccardNearDup`): because
 * the hash equals the SQL formulation's, swapping it in changes nothing the
 * DuckDB oracle can observe.
 *
 * Null semantics: null input → null; null tokens are skipped by the
 * separator join, exactly like SQL `concat_ws`.
 */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, tk =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.compute($tk));")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private val Space = UTF8String.fromString(" ")

  /** Distinct xxhash64(seed 42) values of the 3-gram shingles, in
    * first-occurrence order (the `array_distinct` convention). */
  def compute(tk: ArrayData): Array[Long] = {
    val n = tk.numElements()
    if (n < 3) return Array.emptyLongArray
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, n * 2))
    val out = new Array[Long](n - 2)
    var m = 0
    var j = 0
    while (j + 2 < n) {
      val s = UTF8String.concatWs(Space, toks(j), toks(j + 1), toks(j + 2))
      val h = XXH64.hashUTF8String(s, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      j += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }
}
