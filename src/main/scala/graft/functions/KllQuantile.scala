package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable quantile sketches (DataSketches KLL) — the 100 TB
  * percentile path. `q_agg_percentiles` (#89) is exact and stays the
  * oracled row, but exact percentiles materialize/sort the full value
  * domain per group; a KLL sketch is a few KB with a PROVEN rank
  * error (~1.65% at k=200, ~0.8% at k=400), updates in O(1), and
  * merges associatively — so partial aggregation, sketch-per-table
  * persistence and later union all work, exactly like the HLL
  * distinct row (#21b). Ships as TypedImperativeAggregates (the same
  * mechanism as Spark's own hll_sketch_agg): the live sketch object
  * rides the aggregation buffer and only serializes at shuffle
  * boundaries.
  *
  * Surface (registered by [[KllQuantile.register]] / `Engine.init`):
  *  - `kll_sketch_agg(x[, k])`  → binary sketch of DOUBLE values
  *  - `kll_union_agg(sketch)`   → binary union of sketches (re-merge
  *    persisted/grouped partials)
  *  - `kll_quantiles(sketch, array(p…))` → array<double> estimates
  *    (scalar UDF — runs on final, group-count-sized rows only)
  *
  * Engine-specific by construction (sketch bytes differ across
  * engines) — no DuckDB oracle; ExtrasSuite pins the rank-error
  * bound against the exact sort and merge-equivalence.
  */
object KllQuantile {

  val DEFAULT_K = 200

  private def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Idempotently register the two aggregates + the extractor UDF. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_sketch_agg", exprs => {
        val k = if (exprs.length > 1) exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"kll_sketch_agg: k must be a literal, got $other")
        } else DEFAULT_K
        KllSketchAgg(exprs.head, k)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_union_agg", exprs => {
        val k = if (exprs.length > 1) exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"kll_union_agg: k must be a literal, got $other")
        } else 0 // 0 = adopt the first input sketch's k
        KllUnionAgg(exprs.head, k)
      }, "scala_udf")
    spark.udf.register("kll_quantiles",
      (bytes: Array[Byte], probs: Seq[Double]) => {
        val s = heapify(bytes)
        if (s.isEmpty) probs.map(_ => Double.NaN).toArray
        else probs.map(p => s.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)).toArray
      })
  }
}

/** Sketch DOUBLE values into a KLL(k) sketch; null inputs skipped. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllQuantile.DEFAULT_K,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case d: Double => buf.update(d)
      case f: Float  => buf.update(f.toDouble)
      case n: Number => buf.update(n.doubleValue())
      case other => throw new IllegalArgumentException(
        s"kll_sketch_agg expects a numeric column, got ${other.getClass}")
    }
    buf
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union BINARY KLL sketches (re-merge persisted or grouped partials —
  * the mergeable-sketch persistence move, same as hll_union_agg).
  *
  * k = 0 (the default) sizes the merge buffer from the FIRST input
  * sketch, so `kll_sketch_agg(x, 400)` partials union at k=400
  * accuracy instead of silently degrading to the k=200 default (KLL
  * merge takes min-k). An explicit literal k pins it:
  * `kll_union_agg(sketch, 400)`. */
case class KllUnionAgg(
    child: Expression,
    k: Int = 0,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(if (k > 0) k else KllQuantile.DEFAULT_K)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (k <= 0 && buf.isEmpty && buf.getK != other.getK) {
        // re-seed the still-empty buffer at the incoming sketch's k —
        // merging into the k=200 default would clamp accuracy to min-k
        val fresh = KllDoublesSketch.newHeapInstance(other.getK)
        fresh.merge(other); fresh
      } else { buf.merge(other); buf }
    }
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    if (a.isEmpty) b else { a.merge(b); a }
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
}
