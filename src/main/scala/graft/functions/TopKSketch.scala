package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / space-saving frequent-items sketch as a
  * `TypedImperativeAggregate` (the custom-aggregate extension surface,
  * SURVEY.md §4): top string values by count in bounded memory.
  *
  * Buffer = at most `capacity` (value, count) pairs; `merge` adds
  * counterpart counts then re-prunes, so partial aggregates combine from any
  * partitioning — the property that makes it cluster-safe. Counts are exact
  * whenever the number of distinct values in a group is <= capacity (the
  * dashboard case: event types, return flags); otherwise they are the
  * standard Misra-Gries underestimates with error <= n/capacity.
  *
  * At 100 TB this replaces a full groupBy-per-group subquery for "top N
  * values per group" dashboards with constant memory per group.
  */
case class TopKSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  // Fail at construction, not mid-task: capacity=0 would reach
  // buf.valuesIterator.min on an empty buffer at the first insert — an
  // opaque executor-side 'empty.min' retried by Spark before the query dies
  // (review finding).
  require(capacity >= 1, s"topk_sketch capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => add(buf, k, c) }
    buf
  }

  /** Weighted Misra-Gries insert (mergeable-summaries form): an unseen key
    * arriving at a full buffer decrements every resident by
    * m = min(c, current minimum) — the minimum resident dies when m reaches
    * it, freeing a slot for the incoming key's residual weight c - m. This
    * keeps heavy hitters across merges (a key with count > n/capacity can
    * never be fully cancelled), preserving the error <= n/capacity bound;
    * the old "drop the incoming key" path lost merged heavy hitters. */
  private def add(buf: mutable.HashMap[String, Long], k: String, c: Long): Unit = {
    if (c <= 0L) return
    if (buf.contains(k) || buf.size < capacity) {
      buf.update(k, buf.getOrElse(k, 0L) + c)
    } else {
      val m = math.min(c, buf.valuesIterator.min)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val nv = buf(key) - m
        if (nv <= 0) dead += key else buf.update(key, nv)
      }
      dead.foreach(buf.remove)
      val residual = c - m
      if (residual > 0) buf.update(k, residual) // slot freed by the dead minimum
    }
  }

  /** Result: map value -> count, capped at capacity entries. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "topk_sketch"
}

object TopKSketch {
  /** Register as SQL function `topk_sketch(col, capacity)` so callers can use
    * `expr(...)` without non-public Column constructors. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch",
      exprs => TopKSketch(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "scala_udf")

  /** Column-level form via the catalyst bridge — NOT by string-rendering
    * the Column through the SQL parser: `expr(c.toString)` breaks for any
    * name needing quoting or any derived column whose rendering doesn't
    * re-parse (review finding; the bridge is the same pattern the other
    * custom expressions use, which made the parser round-trip obsolete). */
  def topkSketch(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      TopKSketch(Bridge.expression(c), capacity).toAggregateExpression())
  }

  /** Back-compat overload (the SparkSession was only used to register the
    * SQL function, which the bridge form no longer needs). */
  def topkSketch(spark: org.apache.spark.sql.SparkSession, c: Column,
                 capacity: Int): Column =
    topkSketch(c, capacity)
}
