package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType, ArrayType, MapType}

/** Regression guard for the round-1 driver-hash failures: DECIMAL is
  * fine (required, §2.5.1) for internal arithmetic, but any DecimalType
  * in a FINAL output schema hash-mismatches the DuckDB oracle
  * (Decimal('44.00') vs float 44.0 repr). Every query must end with a
  * double cast on money columns.
  */
class SchemaGuardSuite extends GraftSuite {

  private def decimalFields(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType  => Seq(path)
    case s: StructType   => s.fields.flatMap(f => decimalFields(f.dataType, s"$path.${f.name}"))
    case a: ArrayType    => decimalFields(a.elementType, s"$path[]")
    case m: MapType      => decimalFields(m.keyType, s"$path.key") ++
                            decimalFields(m.valueType, s"$path.value")
    case _               => Nil
  }

  test("no query output schema contains DecimalType") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema = q(spark, sf0001).schema
      schema.fields.flatMap(f => decimalFields(f.dataType, f.name)).map(c => s"$name:$c")
    }
    assert(offenders.isEmpty,
      s"decimal output columns (cast to double before output): ${offenders.mkString(", ")}")
  }
}
