package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Inferred-schema memo (r18 optimization round). Parquet schema
    * inference launches a footer-reading Spark JOB per
    * `spark.read.parquet` call — measured 103 ms/call at sf0.1 vs
    * 8 ms with the schema supplied, and every query invocation
    * re-reads its tables (the bench pays it 3 reps × tables/query).
    * The schema of a fixture path is metadata, not a result: caching
    * it is the same move as Spark's own FileStatusCache (and at
    * 100 TB the schema comes from a catalog/manifest, never repeated
    * inference — guide §6). Keyed by path + the two session confs
    * that change what a timestamp column infers as (Tables.events'
    * nanos/NTZ recipe), so differently-configured sessions can never
    * alias. Capped like dfGuardMemo; assumes fixture paths are
    * immutable within a JVM (regenerating data under the SAME path
    * needs a new JVM — same documented staleness class as the file
    * status cache itself). */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // SPARK_GRAFT_NO_SCHEMA_MEMO: measurement knob for A/B probes ONLY
    // (r19, VERDICT r18 item 7 — quantify the memo at g1). Unset =
    // memo on = the shipped r18 behavior.
    if (sys.env.contains("SPARK_GRAFT_NO_SCHEMA_MEMO"))
      return spark.read.parquet(path)
    val key = path +
      "|" + spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") +
      "|" + spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val schema =
      if (schemaMemo.size < 256) schemaMemo.computeIfAbsent(key,
        _ => spark.read.parquet(path).schema)
      else spark.read.parquet(path).schema
    spark.read.schema(schema).parquet(path)
  }

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Read-session confs that make the events fixture loadable under
    * EITHER historical schema of its `ts` column (SURVEY.md §2.5.3):
    *
    *  - parquet INT64 TIMESTAMP(NANOS) (fixtures ≤ r9): Spark 4.1.2
    *    refuses the column outright unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces it
    *    as LongType raw nanoseconds.
    *  - parquet INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false)
    *    (fixtures ≥ r10 regen): with default
    *    `spark.sql.parquet.inferTimestampNTZ.enabled=true` this infers
    *    TIMESTAMP_NTZ, whose only path back to TimestampType is a
    *    session-timezone-dependent cast. Disabling the inference makes
    *    Spark surface the column directly as TimestampType carrying
    *    the file's raw microseconds — bit-identical to what the ns
    *    recipe produced, with no timezone in the loop.
    *
    * The driver's Verify/Bench sessions do NOT set these confs, so
    * they are (re)set here before every read.
    */
  def setEventsReadConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Adaptive `ts` normalization to TimestampType (µs since epoch),
    * branching on the type the scan actually produced:
    * LongType = raw ns (legacy fixture) → integer-div to µs, which
    * matches DuckDB's own ns→µs truncation exactly; TimestampType
    * (µs fixture under [[setEventsReadConfs]]) → already correct;
    * TIMESTAMP_NTZ (µs fixture read WITHOUT the confs) → cast, which
    * is exact when the session timezone is UTC. Works on batch and
    * streaming DataFrames alike.
    */
  def normalizeEventsTs(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      expr("timestamp_micros(ts div 1000)")
    case org.apache.spark.sql.types.TimestampNTZType =>
      col("ts").cast(org.apache.spark.sql.types.TimestampType)
    case _ => col("ts")
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    setEventsReadConfs(spark)
    val raw = read(spark, dir, "events")
    raw.withColumn("ts", normalizeEventsTs(raw))
  }
}
