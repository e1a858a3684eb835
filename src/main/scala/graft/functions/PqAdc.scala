package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native Catalyst expression: PQ asymmetric-distance computation
  * over BYTE-PACKED codes — `pq_adc(codes: binary, lut: array<double>)
  * = Σ_j lut[j·k + unsigned(codes[j])]`, with `k` inferred as
  * `|lut| / |codes|` (the LUT is laid out subspace-major by the
  * query side, [[graft.api.PqIndex]]).
  *
  * Why an expression and not a HOF: Spark has no higher-order
  * functions over `binary`, and unpacking bytes to `array<int>` at
  * scan time would undo the packing this exists for. Like
  * [[FloatVecDot]], the generated code is a tight primitive loop
  * inside whole-stage codegen — this is THE hot loop of a PQ probe
  * (|queries|·|probed corpus|·m adds), so no per-element dispatch is
  * affordable. Bytes are masked to unsigned: code 255 is a valid
  * codebook index, not -1.
  *
  * Fold order (ascending subspace, double accumulator) matches the
  * previous `aggregate(transform(...))` HOF composition bit-for-bit.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (binary, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.length
    if (m == 0 || lut.numElements() % m != 0) {
      throw new IllegalArgumentException(
        s"pq_adc: |lut|=${lut.numElements()} not a positive multiple of |codes|=$m")
    }
    val k = lut.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * k + (codes(j) & 0xFF))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.length;
         |if ($m == 0 || $b.numElements() % $m != 0) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: |lut|=" + $b.numElements() + " not a positive multiple of |codes|=" + $m);
         |}
         |int $k = $b.numElements() / $m;
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $b.getDouble($j * $k + (((int) $a[$j]) & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Register `pq_adc` for `expr(...)`/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc", exprs => PqAdc(exprs(0), exprs(1)), "scala_udf")
}
