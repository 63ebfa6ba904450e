package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst expression: per-token polynomial hash
 * (`MinHashSignature.tokenHash` — `h·31 + byte mod 1e9+7`) over a token
 * array, one primitive pass per row. The portable hash is what lets
 * consumers (SimHash bit votes, custom bucketing) carry exact SQL oracles;
 * being a native expression keeps the per-token loop out of interpreted
 * higher-order-function evaluation.
 */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenHashes.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, tk =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cls.compute($tk));")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

object TokenHashes {
  def compute(tk: ArrayData): Array[Long] = {
    val n = tk.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = MinHashSignature.tokenHash(if (tk.isNullAt(i)) null else tk.getUTF8String(i))
      i += 1
    }
    out
  }
}
