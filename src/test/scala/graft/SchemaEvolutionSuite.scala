package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Schema-evolution position, pinned (round-1 verdict, missing item 5;
  * position documented in PgCdcSimSource's scaladoc): a fixed-schema
  * engine ingesting an evolving source must behave as
  *  1. widest-declared-schema reads OLD files with missing columns
  *     as null (no failure, no loss);
  *  2. narrow-declared-schema reads NEW files ignoring the
  *     not-yet-declared column (no failure);
  *  3. a restart that widens the declared schema on the SAME
  *     checkpoint picks up subsequent data with the new column —
  *     evolution is a restart concern, not data loss.
  */
class SchemaEvolutionSuite extends GraftSuite {

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))
  private val v2 = v1.add(StructField("extra", LongType, nullable = true))

  private def writeV1(dir: String, ids: Range): Unit = {
    val sess = spark
    import sess.implicits._
    ids.map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
  }
  private def writeV2(dir: String, ids: Range): Unit = {
    val sess = spark
    import sess.implicits._
    ids.map(i => (i.toLong, s"p$i", i.toLong * 10)).toDF("id", "payload", "extra")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  private def drain(dir: String, schema: StructType, name: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000))
  }

  test("widest schema reads pre-evolution files: missing column is null") {
    val dir = java.nio.file.Files.createTempDirectory("evo_wide").toString
    writeV1(dir, 0 until 10)
    writeV2(dir, 10 until 20)
    drain(dir, v2, "evo_wide")
    val rows = spark.table("evo_wide").collect()
    assert(rows.length == 20)
    assert(rows.filter(_.getLong(0) < 10).forall(_.isNullAt(2)),
      "v1 rows must surface the evolved column as null")
    assert(rows.filter(_.getLong(0) >= 10).forall(r => r.getLong(2) == r.getLong(0) * 10),
      "v2 rows carry their values")
  }

  test("narrow schema reads post-evolution files: undeclared column ignored, no failure") {
    val dir = java.nio.file.Files.createTempDirectory("evo_narrow").toString
    writeV1(dir, 0 until 5)
    writeV2(dir, 5 until 10)
    drain(dir, v1, "evo_narrow")
    val rows = spark.table("evo_narrow").collect()
    assert(rows.length == 10 && rows.forall(_.length == 2),
      "all rows readable through the narrow schema")
  }

  test("restart with widened schema on the same checkpoint: new column flows, no data loss") {
    val base = java.nio.file.Files.createTempDirectory("evo_restart").toString
    val dir = s"$base/data"; val cp = s"$base/cp"; val out = s"$base/out"
    writeV1(dir, 0 until 10)
    def run(schema: StructType): Unit = {
      val q = spark.readStream.schema(schema).parquet(dir)
        .select(schema.fieldNames.map(col): _*)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
    }
    run(v1)
    writeV2(dir, 10 until 20) // column appears mid-stream
    run(v2)                   // restart, widened declaration, same WAL
    // sink parquet now holds v1-era files (2 cols) and v2-era files
    // (3 cols): read back with the widened schema
    val rows = spark.read.schema(v2).parquet(out).collect()
    assert(rows.length == 20, s"no loss across the evolution restart: ${rows.length}")
    assert(rows.filter(_.getLong(0) >= 10).forall(r => !r.isNullAt(2) && r.getLong(2) == r.getLong(0) * 10),
      "post-evolution rows carry the new column after restart")
    assert(rows.filter(_.getLong(0) < 10).forall(_.isNullAt(2)),
      "pre-evolution rows read as null for the late column")
  }
}
