package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming throughput/state probe (VERDICT r14 Next-round #4): the
  * batch rows have two measured decades in BASELINE.md; this drives
  * the STREAMING duals at a given scale on the RocksDB state store
  * and records rows/s plus end-of-run state size, so the streaming
  * axis gets the same decade curves.
  *
  * Stages, each its own JSON line on stdout:
  *  - `neardup_ttl0`   — [[graft.api.NearDupStream.nearDupStream]]
  *    (#124) over the documents table re-sharded into 32 id-ranged
  *    files and streamed file-at-a-time; unbounded state (every doc's
  *    signatures retained — the batch-dual-equal setting).
  *  - `neardup_store_ttl{N}ms` — same, `ttlMs=N, storeTtl=true`
  *    (env `GRAFT_PROBE_TTL_MS`, default 10000): the store's expiry
  *    index evicts entries older than the trailing window each batch
  *    — including COLD buckets never touched again — so end-of-run
  *    state is bounded by ingest rate × window, not corpus size: the
  *    #124 state-size-vs-TTL evidence. Driven production-style
  *    (continuous trigger, listener-tracked drain, grace, stop)
  *    because TTL's forced cleanup batches never terminate on their
  *    own.
  *  - `cdc_upsert`     — the `pg-cdc-sim` source (deletes on) into
  *    [[graft.api.StreamzOps]]'s sinkUpsert: quantum-limited
  *    snapshot-then-poll replay into the bucketed keyed table.
  *  - `retract_agg`    — the same changelog through
  *    [[graft.api.StreamzStateOps.retractAggStream]] (#130's
  *    streaming dual): O(1)-per-key ValueState, signed deltas to a
  *    noop sink.
  *
  * rows/s is source rows over wall time of the whole AvailableNow
  * run (JVM-warm session, cold stream); state size is the LAST
  * progress's stateOperators numRowsTotal plus the RocksDB SST-file
  * bytes custom metric when present.
  *
  * Usage: `runMain graft.tools.StreamScaleProbe [sfDir] [workDir]`
  * (scripts/stream_scale_probe.sh runs it at sf0.1 and sf1 in
  * isolated JVMs, same protocol as bench_scale_probe.sh).
  *
  * r17 (VERDICT r16 Next-round #4 — isolate the g100 per-row rise):
  *  - `GRAFT_PROBE_STAGES` (csv of neardup_ttl0, neardup_ttl,
  *    cdc_upsert, retract_agg; default all) runs a subset, so the
  *    CDC shard sweep doesn't pay the ~15 min neardup legs per point;
  *  - `GRAFT_PROBE_SHUFFLE` sets spark.sql.shuffle.partitions (state
  *    stores shard per-partition; on a cluster those shards spread
  *    across executors — if per-row cost falls back toward the sf10
  *    figure as shards grow, the g100 rise is single-box working-set
  *    pressure, not a per-key scaling defect);
  *  - every JSON line now records `"shuffle"` and `"terminated"` —
  *    the r16 cdc_upsert wall of 1800.07 s sat exactly at the old
  *    30-min awaitTermination cap, so completion vs timeout was not
  *    distinguishable from the record. The cap is now 2 h and the
  *    flag makes a censored run visible instead of silently recorded
  *    as throughput.
  *
  * r18 (ADVICE r17): the store_ttl stage now shares the 2 h cap
  * (drainAndStop timeoutMs = 7200000, censored result instead of a
  * thrown TimeoutException that would abort the remaining stages),
  * and every censored leg's `rows`/`rows_per_sec` are computed from
  * rows actually processed, never the planned input.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("stream_probe").toString)
    val shufflePartitions = sys.env.getOrElse("GRAFT_PROBE_SHUFFLE", "32").toInt
    val stages = sys.env.getOrElse("GRAFT_PROBE_STAGES",
        "neardup_ttl0,neardup_ttl,cdc_upsert,retract_agg")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emit(stage: String, rows: Long, wallSec: Double, q: StreamingQuery,
        extra: String = "", terminated: Boolean = true): Unit = {
      val so = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
      val stateRows = so.map(_.numRowsTotal).sum
      val sst = so.flatMap(o =>
          Option(o.customMetrics.get("rocksdbSstFileSize")).map(_.longValue()))
        .sum
      val nBatches = q.recentProgress.count(_.numInputRows > 0)
      println(f"""{"probe":"stream_scale","stage":"$stage","sf":"$sfDir","rows":$rows,"wall_sec":$wallSec%.2f,"rows_per_sec":${rows / math.max(wallSec, 1e-9)}%.0f,"n_batches":$nBatches,"state_rows":$stateRows,"rocksdb_sst_bytes":$sst,"shuffle":$shufflePartitions,"terminated":$terminated$extra}""")
    }
    // Rows ACTUALLY processed by a possibly-censored run: the planned
    // total only when the query terminated; otherwise the progress
    // log's input-row sum, so a timed-out leg's rows/s is computed
    // from real work, not fabricated from the intended input
    // (ADVICE r17). Batch counts here are far below the ~100-entry
    // recentProgress retention (≤ ~35 doc files / ~13 CDC polls).
    def processedRows(q: StreamingQuery, planned: Long, done: Boolean): Long =
      if (done) planned else q.recentProgress.map(_.numInputRows).sum

    // ---- docs, re-sharded into 32 id-ranged files (file-at-a-time
    // micro-batches; roughly id-ordered, matching ingestion order) ----
    lazy val docsIn = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    lazy val nDocs = docsIn.count()
    lazy val docsDir = {
      val d = s"$workDir/docs"
      docsIn.repartitionByRange(32, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(d)
      d
    }
    lazy val docsSchema = docsIn.schema

    // stage 1: unbounded state (batch-dual-equal setting), AvailableNow
    if (stages("neardup_ttl0")) locally {
      val t0 = System.nanoTime()
      val stream = spark.readStream.schema(docsSchema)
        .option("maxFilesPerTrigger", "1").parquet(docsDir)
      val q = graft.api.NearDupStream.nearDupStream(stream, "doc_id", "text",
          minSim = 0.5, ttlMs = 0L)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$workDir/cp_neardup_ttl0")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      val done = q.awaitTermination(7200000)
      emit("neardup_ttl0", processedRows(q, nDocs, done),
        (System.nanoTime() - t0) / 1e9, q,
        s""","ttl_ms":0""", terminated = done)
    }

    // stage 2: storeTtl — the unbounded-stream setting. TTLConfig's
    // forced cleanup batches mean the query never terminates on its
    // own (see NearDupStream scaladoc), so this drives it the way
    // production would: continuous trigger, drain tracked by a
    // listener, then a grace period so the store's expiry index
    // evicts the (cold) trailing window, then stop. The TTL is
    // tunable and defaults SHORTER than the expected drain so expiry
    // is observable mid-run, not just at the end.
    if (stages("neardup_ttl")) locally {
      val ttl = sys.env.getOrElse("GRAFT_PROBE_TTL_MS", "10000").toLong
      val stage = s"neardup_store_ttl${ttl}ms"
      // nDocs source rows shrink to band rows AFTER the stateful op;
      // numInputRows counts SOURCE rows, so drain == all docs read.
      // drainAndStop (r16) is this probe's r15 script idiom
      // productized — the probe now exercises the shipped helper.
      val r = graft.api.NearDupStream.drainAndStop(spark, () => {
        val stream = spark.readStream.schema(docsSchema)
          .option("maxFilesPerTrigger", "1").parquet(docsDir)
        graft.api.NearDupStream.nearDupStream(stream, "doc_id", "text",
            minSim = 0.5, ttlMs = ttl, storeTtl = true)
          .writeStream.format("noop")
          .option("checkpointLocation", s"$workDir/cp_$stage")
          .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      }, sourceRows = nDocs, graceMs = ttl + 5000,
        timeoutMs = 7200000L, throwOnTimeout = false)
      // r.drained is the listener's exact processed count — on a
      // censored drain it reports real work, and the flag marks it
      emit(stage, r.drained, r.drainSec, r.query,
        s""","ttl_ms":$ttl,"mode":"store_ttl","grace_ms":${ttl + 5000}""",
        terminated = r.drained >= nDocs)
    }

    // ---- CDC: quantum-limited replay of the events changelog ----
    val evPath = s"$sfDir/events.parquet"
    lazy val nChanges = spark.read.format("pg-cdc-sim")
      .option("path", evPath).option("deletes", "true").load().count()
    lazy val quantum = math.max(nChanges / 12L, 1L) // ~12 poll batches + snapshot
    if (stages("cdc_upsert")) locally {
      import graft.api.StreamzOps._
      val t0 = System.nanoTime()
      val q = spark.readStream.format("pg-cdc-sim")
        .option("path", evPath).option("deletes", "true")
        .option("batchSize", quantum.toString)
        .option("snapshotSeq", (quantum - 1L).toString)
        .load()
        .sinkUpsert(s"$workDir/upsert_state", Seq("key"), "seq",
          s"$workDir/cp_upsert", opCol = Some("op"))
      val done = q.awaitTermination(7200000)
      val wall = (System.nanoTime() - t0) / 1e9
      val live = graft.api.StreamzOps
        .readUpsertTable(spark, s"$workDir/upsert_state").count()
      emit("cdc_upsert", processedRows(q, nChanges, done), wall, q,
        s""","live_keys":$live""", terminated = done)
    }

    if (stages("retract_agg")) locally {
      val t0 = System.nanoTime()
      val changes = spark.readStream.format("pg-cdc-sim")
        .option("path", evPath).option("deletes", "false")
        .option("batchSize", quantum.toString)
        .option("snapshotSeq", (quantum - 1L).toString)
        .load()
        .withColumn("cents", round(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
        .withColumn("grp", coalesce(col("event_type"), lit("?")))
      val q = graft.api.StreamzStateOps.retractAggStream(
          changes, "key", "seq", "grp", "cents")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$workDir/cp_retract")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      val done = q.awaitTermination(7200000)
      emit("retract_agg", processedRows(q, nChanges, done),
        (System.nanoTime() - t0) / 1e9, q, terminated = done)
    }
    spark.stop()
  }
}
