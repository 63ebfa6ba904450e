package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst expression: polynomial hashes of a token array's
 * NON-OVERLAPPING fixed-width spans — bit-identical to hashing each token
 * with [[MinHashSignature.tokenHash]] and folding `(h·31 + tokenHash) mod
 * 1e9+7` over every `width`-token window at stride `width` (the last span
 * may be shorter), but computed in one primitive pass per row instead of a
 * `transform(sequence(...), i -> aggregate(slice(...)))` interpreted HOF
 * stack that allocates a sliced array per span.
 *
 * This feeds span-level (paragraph) dedup (`Pipeline.e19SpanDedup`): the
 * portable modular arithmetic is exactly what the SQL oracle replays, so
 * swapping the native expression in changes nothing the oracle can observe.
 *
 * Span count: `max(0, ceil((n − width) / width)) + 1` for non-empty arrays —
 * one span when `n ≤ width` (matching the chunking convention of `e16`).
 * Null semantics: null input → null; null tokens hash as empty strings
 * (tokenHash(null) = 0), like the HOF formulation.
 */
case class SpanHashes(child: Expression, width: Int) extends UnaryExpression {
  require(width > 0, s"span width must be positive, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_hashes expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SpanHashes.compute(input.asInstanceOf[ArrayData], width))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SpanHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, tk =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$cls.compute($tk, $width));")
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)

  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  import MinHashSignature.Mod

  /** One polynomial span hash per `width`-token stride window. */
  def compute(tk: ArrayData, width: Int): Array[Long] = {
    val n = tk.numElements()
    if (n == 0) return Array.emptyLongArray
    val nSpans = (n + width - 1) / width
    val out = new Array[Long](nSpans)
    var spanIdx = 0
    var i = 0
    while (i < n) {
      val end = math.min(i + width, n)
      var h = 0L
      var j = i
      while (j < end) {
        val th = MinHashSignature.tokenHash(if (tk.isNullAt(j)) null else tk.getUTF8String(j))
        h = (h * 31 + th) % Mod
        j += 1
      }
      out(spanIdx) = h
      spanIdx += 1
      i += width
    }
    out
  }
}
