package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` for long keys with a HARD buffer cap — the
  * memory-safe spelling of the bucket/posting-list aggregation in the
  * LSH and inverted-index dedup paths.
  *
  * Collects at most `cap + 1` elements per group and then stops
  * appending; a result of size `cap + 1` therefore means "the true
  * group is larger than `cap`" and the caller's existing
  * `size(ids) BETWEEN 2 AND cap` filter drops it — bit-identical
  * semantics to `collect_list` + post-filter, because a group whose
  * true size is ≤ `cap` can never hit the stop condition anywhere
  * (each partial keeps everything until `cap + 1`, and the merged
  * total equals the true count), so its list is complete and exact.
  *
  * Exists because the built-in `collect_list` materializes the WHOLE
  * group in one aggregation buffer before any downstream size filter
  * runs: a mega-hot bucket — the empty-document LSH bucket, a
  * stopword shingle with df ~10⁷ at a 10⁹-doc corpus — becomes a
  * multi-hundred-MB array in a single buffer and kills the executor
  * even though the filter would discard it a moment later. With the
  * cap inside the aggregate, every buffer (partial and final) is
  * ≤ `cap + 1` longs, map-side partial aggregation included; the hot
  * bucket costs 808 bytes instead of 800 MB. Order within the list is
  * as-encountered (same contract as `collect_list`); every caller
  * sorts/dedups downstream (`pairCombos`).
  */
case class CappedCollectLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(b: mutable.ArrayBuffer[Long],
      input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (b.length <= cap) {
      val v = child.eval(input)
      if (v != null) b += v.asInstanceOf[Long]
    }
    b
  }

  override def merge(b: mutable.ArrayBuffer[Long],
      o: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < o.length && b.length <= cap) { b += o(i); i += 1 }
    b
  }

  override def eval(b: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(b.toArray)

  override def serialize(b: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = mutable.ArrayBuffer.empty[Long]
    while (bb.remaining() >= 8) b += bb.getLong
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CappedCollectLongs =
    copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "capped_collect_longs"
}
