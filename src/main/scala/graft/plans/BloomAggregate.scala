package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst AGGREGATE: a per-group bloom filter over the STRING
 * rendering of `child` — `words` longs, `hashes` probes per value, bit
 * positions `pmod(xxhash64(i, value), words*64)` for `i = 0..hashes-1`.
 *
 * BIT-COMPATIBLE with the SQL probe side ([[graft.spark.FileStats]]'s
 * `bloomMayContain`, which recomputes `pmod(xxhash64(lit(i), v), bits)`
 * per literal): both run Spark's own `XxHash64Function` chain — seed 42,
 * each argument folding the running hash — so a filter built here answers
 * exactly the probes built there.
 *
 * Why an imperative aggregate and not the expression formulation
 * (`bit_or(aggregate(positions, ...))` × 64 words): that shape evaluates
 * 64 lambda aggregates per row — `hashes × words` lambda iterations — and
 * compiles a 64-aggregate codegen unit whose Janino compile cost lands on
 * whichever query's cache miss pays it (a bimodal +2 s observed on the
 * bloom-writing bench entries). This does `hashes` hash calls and
 * `hashes` bit-sets per row in one typed buffer, no codegen unit at all.
 *
 * Null inputs contribute no bits (the probe side conservatively keeps
 * files whose values were all NULL via the zone/dv tiers).
 */
case class BloomAggregate(
    child: Expression,
    words: Int = 64,
    hashes: Int = 4,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val bits = words * 64L

  // xxhash64(lit(i), v) = hash(v, seed = hash(i, 42)) — precompute the
  // per-probe seeds once (they depend only on the probe index)
  private lazy val seeds: Array[Long] =
    Array.tabulate(hashes)(i => XxHash64Function.hash(i.toLong, LongType, 42L))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a string child (cast the column), got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < hashes) {
        val h = XxHash64Function.hash(s, StringType, seeds(i))
        val p = (((h % bits) + bits) % bits).toInt // Spark pmod semantics
        buffer(p >> 6) |= 1L << (p & 63)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    var i = 0
    while (i < words) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](words)
    var i = 0
    while (i < words) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggregate =
    copy(child = newChild)

  override def prettyName: String = "bloom_agg"
}
