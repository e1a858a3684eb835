package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Output-schema invariants over the ENTIRE query inventory.
  *
  * The driver's oracle hashes values after sorting columns by name,
  * and DuckDB renders DECIMAL with different scale/precision text
  * than Spark — so §2.5.1's rule is that every money-ish aggregate is
  * cast to DOUBLE before it leaves a query. This suite re-instates
  * the round-1 regression guard (dropped when SchemaGuardSuite was
  * repurposed for timestamp-flavor drift, ADVICE r11): NO query
  * output schema may contain a DecimalType anywhere, including nested
  * inside arrays/maps/structs.
  *
  * Analysis-only — `.schema` resolves the plan without executing it,
  * so the scan covers all 124+ queries in seconds. Queries whose
  * CONSTRUCTION runs jobs (iterative fixpoints, index builds) still
  * only pay their sf0.001 cost.
  */
class OutputSchemaSuite extends GraftSuite {

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType => s.fields.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}")).toSeq
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path.key") ++ decimalPaths(m.valueType, s"$path.value")
    case _ => Nil
  }

  test("no query output schema contains DecimalType (driver-hash rule §2.5.1)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema =
        try fn(spark, sf0001).schema
        catch {
          case e: Throwable =>
            fail(s"$name failed to ANALYZE at sf0.001: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      schema.fields.flatMap(f => decimalPaths(f.dataType, s"$name/${f.name}"))
    }
    assert(offenders.isEmpty,
      s"DecimalType leaked into query output (cast money to double): ${offenders.mkString(", ")}")
  }
}
