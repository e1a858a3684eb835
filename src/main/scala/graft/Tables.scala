package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table readers for the driver-generated parquet fixtures
  * (`/root/testdata/sf*`; schemas in FIXTURES.md).
  *
  * Every query goes through these so that scale-sensitive read
  * options live in exactly one place. At 100 TB these readers are
  * where partition pruning / file-listing parallelism would be
  * configured; on the fixtures they are plain parquet scans that
  * Catalyst prunes and pushes filters into.
  */
object Tables {

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS)
    * which Spark 4.1.2 refuses to read unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (SURVEY.md §2.5.3).
    * With the conf set, `ts` arrives as LongType nanoseconds since
    * epoch; we truncate (integer `div`) to microseconds — verified to
    * match DuckDB's own ns→µs truncation exactly.
    *
    * The driver's Verify/Bench sessions do NOT set the conf, so it is
    * set here, before every read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
