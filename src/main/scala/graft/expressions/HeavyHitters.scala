package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a TypedImperativeAggregate
  * (SURVEY.md §2.13 names this API as the path for beyond-reference
  * aggregate semantics): `graft_heavy_hitters(col, capacity)` returns the
  * up-to-`capacity` most frequent values with estimated counts and error
  * bounds, in ONE pass with O(capacity) memory per partial aggregate.
  *
  * This is the 100 TB substitute for `explode → groupBy token → top-k`
  * vocabulary statistics: the exact form shuffles every distinct token;
  * the sketch ships one `capacity`-entry summary per partition and merges
  * them associatively on the driver side of the shuffle (Agarwal et al.,
  * "Mergeable Summaries", PODS'12 — count-sum merge then trim). Estimated
  * counts overstate by at most the recorded per-entry `err`; when
  * `capacity` exceeds the number of distinct values the result is EXACT
  * with err = 0 (the property the spec pins against the exact oracle
  * query q_token_topk).
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(capacity > 0, "graft_heavy_hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_heavy_hitters expects a string column, got ${other.simpleString}")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("cnt", LongType),
    StructField("err", LongType))))

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  override def update(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String].toString
    buf.get(s) match {
      case Some((c, e)) => buf.update(s, (c + 1, e))
      case None if buf.size < capacity => buf.update(s, (1L, 0L))
      case None =>
        // evict the minimum-count entry; the newcomer inherits its count
        // as an upper bound (count overestimates by at most `err`)
        val (mk, (mc, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(mk)
        buf.update(s, (mc + 1, mc))
    }
    buf
  }

  override def merge(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      other: mutable.LinkedHashMap[String, (Long, Long)])
      : mutable.LinkedHashMap[String, (Long, Long)] = {
    other.foreach { case (k, (c, e)) =>
      buf.get(k) match {
        case Some((c0, e0)) => buf.update(k, (c0 + c, e0 + e))
        case None => buf.update(k, (c, e))
      }
    }
    if (buf.size <= capacity) buf
    else {
      // trim to the top `capacity` by (count desc, value asc) — the
      // mergeable-summaries reduction; deterministic under ties
      val kept = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      val out = mutable.LinkedHashMap.empty[String, (Long, Long)]
      kept.foreach { case (k, ce) => out.update(k, ce) }
      out
    }
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val rows = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c, e))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      out.writeUTF(k); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val k = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.update(k, (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_heavy_hitters"
}

object HeavyHitters {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HeavyHitters].getCanonicalName, "graft_heavy_hitters")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_heavy_hitters takes (column, capacity)")
    val cap = children(1) match {
      case e if e.foldable && e.dataType == IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"graft_heavy_hitters capacity must be an int literal, got $other")
    }
    HeavyHitters(children.head, cap).toAggregateExpression()
  }
}
