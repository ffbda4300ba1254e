package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Weighted argmax aggregate: `top1_by_count(key, weight)` returns the
  * key with the largest total weight in the group, ties broken by the
  * smallest key — one hash-aggregation pass instead of the
  * window-sort + row_number + re-aggregate plan the built-ins force
  * (SURVEY.md §2.10: the reference's correlated LIMIT-1 subqueries,
  * daily_etl_pipeline.py:535-549).
  *
  * State is a per-group key→weight map, merged map-side like any
  * partial aggregate; state size is bounded by group key cardinality
  * (event types, users-per-day — small), NOT by row count, so the
  * aggregate is safe at any fact size. Supports string and long keys.
  */
case class Top1ByCount(
    key: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  override def children: Seq[Expression] = Seq(key, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, weight.dataType) match {
      case (StringType | LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "top1_by_count requires (string|bigint key, bigint weight), got " +
          s"${key.dataType.sql}, ${weight.dataType.sql}")
    }

  override def dataType: DataType = key.dataType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val k = key.eval(input)
    if (k != null) {
      val w = weight.eval(input)
      if (w != null) {
        // UTF8String from an unsafe row may be backed by reused memory;
        // copy before keeping it across rows.
        val stable = k match {
          case s: UTF8String => s.clone()
          case other => other
        }
        buf.update(stable, buf.getOrElse(stable, 0L) + w.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, w) =>
      buf.update(k, buf.getOrElse(k, 0L) + w)
    }
    buf
  }

  private def keyLess(a: Any, b: Any): Boolean = (a, b) match {
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case _ => false
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    var bestK: Any = null
    var bestW = Long.MinValue
    buf.foreach { case (k, w) =>
      if (w > bestW || (w == bestW && keyLess(k, bestK))) {
        bestK = k
        bestW = w
      }
    }
    bestK
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val isString = key.dataType == StringType
    buf.foreach { case (k, w) =>
      out.writeLong(w)
      if (isString) {
        val bytes = k.asInstanceOf[UTF8String].getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      } else {
        out.writeLong(k.asInstanceOf[Long])
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    val isString = key.dataType == StringType
    var i = 0
    while (i < n) {
      val w = in.readLong()
      val k: Any = if (isString) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        UTF8String.fromBytes(b)
      } else in.readLong()
      buf.update(k, w)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): Top1ByCount =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): Top1ByCount =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), weight = newChildren(1))

  override def prettyName: String = "top1_by_count"
}
