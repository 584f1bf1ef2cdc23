package graft.engine.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded n-extremes aggregate over ANY orderable type: the n smallest
  * (`desc = false`) or largest elements of the group under catalyst
  * natural ordering, ascending/descending respectively — exactly
  * `slice(sort_array(collect_list(x), [not] desc), 1, n)`, which is how
  * the DuckDB ≥1.1 top-n aggregates (`min(x, n)`, `max(x, n)`, and the
  * struct-sorted `arg_min/arg_max(a, v, n)`) were previously served.
  * The collect-then-sort spelling buffers the WHOLE group per key
  * before slicing — an OOM cliff on large groups at scale; this
  * aggregate's state is capped at n elements (insert-sorted, O(n) per
  * update with an early reject against the current cutoff), and merges
  * are bounded the same way. NULL inputs are skipped, matching
  * collect_list. Ties are full-value ties (indistinguishable in the
  * output), so insertion order cannot show.
  *
  * Unlike [[TopKEdgeAgg]] (the fixed-width codegen top-k for the kNN
  * hot path) this is a TypedImperativeAggregate: generic element types
  * can't ride fixed-width buffer slots. The function surface it serves
  * is interactive-scale per group, where ObjectHashAggregate is plenty;
  * the point is bounded STATE, not peak throughput.
  */
case class BoundedTopNAgg(
    child: Expression,
    n: Int,
    desc: Boolean,
    extract: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(n >= 0, s"top-n aggregate needs n >= 0, got $n")

  /** With `extract = true` the child must be a struct whose FIRST field
    * is the sort key and SECOND the carried argument; the result is the
    * array of the arguments alone (the `arg_min/arg_max(a, v, n)`
    * form). Fusing the extraction into the aggregate keeps the
    * AGGREGATE at the call root — `OVER w` then attaches natively,
    * where the previous `transform(agg, s -> s.x)` spelling nested the
    * aggregate under a transform the window machinery planned as a
    * missing-GROUP-BY aggregate query (the r11 loud-error residual).
    */
  private def argField: StructField =
    child.dataType.asInstanceOf[StructType].fields(1)

  override def dataType: DataType =
    if (extract) ArrayType(argField.dataType, containsNull = argField.nullable)
    else ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    (if (extract) "arg_" else "") + (if (desc) "max_n" else "min_n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (extract && (!child.dataType.isInstanceOf[StructType] ||
        child.dataType.asInstanceOf[StructType].fields.length < 2))
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName requires a struct<key, arg> input, got " +
            child.dataType.simpleString)
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
  }

  @transient private lazy val ordering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
    if (desc) base.reverse else base
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  private def insert(buf: mutable.ArrayBuffer[Any], v: Any): Unit = {
    if (n == 0) return
    if (buf.length >= n && ordering.compare(v, buf.last) >= 0) return
    // binary search for the insertion point (first element > v)
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, v)
    if (buf.length > n) buf.remove(n)
  }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow)
      : mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    if (extract) {
      val ft = argField.dataType
      new GenericArrayData(
        buf.map(_.asInstanceOf[InternalRow].get(1, ft)).toArray)
    } else new GenericArrayData(buf.toArray)

  // serialize the bounded buffer as one array-typed unsafe row — the
  // Collect-family idiom, element type fully generic. NOTE: the buffer
  // always holds the CHILD values (full structs in extract mode), so
  // the serializer is typed on the buffer, not on `dataType`.
  @transient private lazy val serProj =
    UnsafeProjection.create(
      Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    serProj.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      buf += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopNAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopNAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : BoundedTopNAgg = copy(child = newChild)
}
