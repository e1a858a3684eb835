package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-count sketches WITH set algebra (DataSketches
  * Theta) — what HLL (#21) cannot do: estimate |A ∪ B|, |A ∩ B| and
  * |A \ B| from per-group sketches WITHOUT re-scanning the data. The
  * 100 TB use: per-segment user sketches persisted once (a few KB
  * each), then any audience overlap/exclusion question is sketch
  * algebra on the driver — the same persistence move as the KLL row
  * (#110), extended from quantiles to set operations.
  *
  * Surface (registered by [[ThetaSketch.register]] / `Engine.init`):
  *  - `theta_sketch_agg(x[, nominalEntries])` → binary compact sketch
  *    (x: any integral/string column; error ≈ 1/√k, exact below k)
  *  - `theta_union_agg(sketch)` → binary union of sketches (re-merge
  *    persisted/grouped partials)
  *  - `theta_est(sk)` / `theta_union_est(a, b)` /
  *    `theta_intersect_est(a, b)` / `theta_anotb_est(a, b)` → double
  *    estimates (scalar UDFs — they run on final, group-count-sized
  *    rows only, never in the per-row hot path)
  *
  * The aggregation buffer is a live theta `Union` (Union supports
  * raw updates), serialized as its compact result only at shuffle
  * boundaries — the same TypedImperativeAggregate shape as
  * [[KllQuantile]]. Sketch bytes are engine-specific; the oracled
  * row (#126) emits EXACT set cardinalities plus tolerance booleans,
  * the same encoding trick as #110/#119.
  */
object ThetaSketch {

  /** 4096 nominal entries ⇒ RSE ≈ 1.6%; exact below 4096 distincts. */
  val DEFAULT_NOMINAL = 4096

  private def heapify(bytes: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_sketch_agg", exprs => {
        val k = if (exprs.length > 1) exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"theta_sketch_agg: nominalEntries must be a literal, got $other")
        } else DEFAULT_NOMINAL
        ThetaSketchAgg(exprs.head, k)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_union_agg", exprs => ThetaUnionAgg(exprs.head), "scala_udf")
    spark.udf.register("theta_est",
      (a: Array[Byte]) => heapify(a).getEstimate)
    spark.udf.register("theta_union_est", (a: Array[Byte], b: Array[Byte]) =>
      SetOperation.builder().buildUnion().union(heapify(a), heapify(b)).getEstimate)
    spark.udf.register("theta_intersect_est", (a: Array[Byte], b: Array[Byte]) =>
      SetOperation.builder().buildIntersection()
        .intersect(heapify(a), heapify(b)).getEstimate)
    spark.udf.register("theta_anotb_est", (a: Array[Byte], b: Array[Byte]) =>
      SetOperation.builder().buildANotB().aNotB(heapify(a), heapify(b)).getEstimate)
  }
}

/** Sketch column values into a theta Union buffer; nulls skipped. */
case class ThetaSketchAgg(
    child: Expression,
    nominal: Int = ThetaSketch.DEFAULT_NOMINAL,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominal).buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long         => buf.update(l)
      case i: Int          => buf.update(i.toLong)
      case s: Short        => buf.update(s.toLong)
      case b: Byte         => buf.update(b.toLong)
      case s: UTF8String   => buf.update(s.toString)
      case s: String       => buf.update(s)
      case d: Double       => buf.update(d)
      case other => throw new IllegalArgumentException(
        s"theta_sketch_agg expects an integral/string column, got ${other.getClass}")
    }
    buf
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(nominal).buildUnion()
    u.union(Memory.wrap(bytes)); u
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union BINARY theta sketches (re-merge persisted/grouped partials). */
case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes)); u
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}
