package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming decontamination — gate a (doc_id, text) doc stream
  * against a benchmark/eval set CONTINUOUSLY, on ingest, instead of
  * sweeping the corpus after the fact.
  *
  * The shape exploits doc atomicity: one stream row carries one WHOLE
  * document, so a doc's contamination verdict is final the moment its
  * micro-batch arrives — no cross-batch state at all. Each batch runs
  * the exact [[BloomDecon]] pipeline (Bloom prefilter, then exact
  * verification against the cached eval shingle table), so the
  * streamed verdicts are IDENTICAL to the batch query on the same
  * docs (suite-proven, across a checkpoint restart). The eval side is
  * built ONCE at stream start; only the constant-size Bloom ships to
  * executors, per the non-broadcast-eval regime BloomDecon exists
  * for.
  *
  * Output layout (both partitioned by batch):
  * {{{
  *   outPath/flagged/batch=<id>/   (train_doc, eval_doc, n_shared)
  *   outPath/clean/batch=<id>/     the batch's uncontaminated rows
  * }}}
  * Each batch OVERWRITES its own `batch=<id>` dirs, so a replay after
  * a crash-in-commit rewrites the same data instead of duplicating it
  * (idempotence is per-batch-directory; the streaming checkpoint
  * guarantees batch ids are stable across restarts).
  */
object StreamDecon {

  /** Start the gate. `docStream` is a streaming (doc_id, text, ...)
    * frame; `eval` is the STATIC eval set (doc_id, text). Extra
    * docStream columns ride through to the clean output.
    *
    * @param cleanTable when set, the clean side lands in a
    *        [[StreamzOps]] snapshot-manifest UPSERT table at this path
    *        (keyed by doc_id, ordered by arrival batch) instead of
    *        per-batch directories: readers get ONE consolidated,
    *        atomically-committed table ([[StreamzOps.readUpsertTable]])
    *        and a doc re-delivered in a later batch upserts instead of
    *        duplicating — the composition a CDC-fed ingest needs,
    *        since the same doc_id can legitimately reappear updated.
    *        A doc whose LATEST revision is flagged leaves the table
    *        (tombstoned, not left at its stale clean revision); within
    *        one batch revisions are unordered, so the winner is a
    *        deterministic content-hash pick and any flagged revision
    *        gates the whole doc out. Replay-idempotent like the sink
    *        it borrows ([[StreamzOps.upsertBatch]]). Read back with
    *        [[readCleanTable]] — the batch-dir [[readClean]] layout is
    *        not written in this mode. The flagged side keeps its
    *        batch-dir layout either way.
    */
  def start(docStream: DataFrame, eval: DataFrame, outPath: String,
      checkpointDir: String,
      minShared: Int = graft.queries.PipelineExtras.DECON_MIN_SHARED,
      expectedEvalShingles: Long = 1000000L, fpp: Double = 0.01,
      trigger: Trigger = Trigger.ProcessingTime(0),
      cleanTable: Option[String] = None,
      cleanTableBuckets: Int = 16): StreamingQuery = {
    // one-time eval-side build: shingle table cached, Bloom computed
    val filter = BloomDecon.evalFilter(eval, minShared, expectedEvalShingles, fpp)
    val query = docStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(filter, batch, outPath, batchId, cleanTable, cleanTableBuckets)
      }
      .start()
    // release the cached eval shingles when THIS query ends (stop or
    // failure) — a restart builds a fresh filter, so the old cache
    // entry would otherwise linger for the session lifetime
    val streams = docStream.sparkSession.streams
    streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) { filter.close(); streams.removeListener(this) }
    })
    query
  }

  /** One batch's gate + write — factored out so idempotence under
    * replay (same batchId twice) is directly testable. */
  private[graft] def writeBatch(filter: BloomDecon.EvalFilter,
      batch: DataFrame, outPath: String, batchId: Long,
      cleanTable: Option[String] = None,
      cleanTableBuckets: Int = 16): Unit = {
    // both writes consume the batch (flag() shingles it, the clean
    // side anti-joins it) — cache so the source is read once per batch
    val b = batch.cache()
    val flagged = filter.flag(b)
      .cache() // consumed by its own write + the clean anti-join
    flagged.write.mode("overwrite").parquet(s"$outPath/flagged/batch=$batchId")
    val clean = b.join(flagged.select(col("train_doc").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti") // = filter.clean(b), reusing the cached flags
    cleanTable match {
      case Some(table) =>
        // Stream rows carry no intra-batch order, so a doc_id delivered
        // twice in ONE batch has no "later" revision — pre-reduce to one
        // row per key with a content-hash tiebreak: deterministic, so a
        // checkpoint replay of the batch picks the SAME winner (a tie on
        // the bare batch-id column would let row_number keep either).
        val oneRev = clean
          .withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(md5(col("text").cast("string")))))
          .filter(col("_rn") === 1).drop("_rn")
        // A flagged doc must LEAVE the table, not linger at its last
        // clean revision: ship its id as a tombstone, so a doc whose
        // re-delivered revision is contaminated is removed (op=D rows
        // drop their key in the merge). If any revision of a doc in
        // this batch is flagged, the whole doc gates out.
        val tombs = b.join(flagged.select(col("train_doc").as("doc_id")).distinct(),
            Seq("doc_id"), "left_semi")
          .dropDuplicates("doc_id")
          .withColumn("_op", lit("D"))
        // arrival batch as the upsert order: a replayed batch merges
        // to the same state (same batchId), a later re-delivery wins
        StreamzOps.upsertBatch(
          oneRev.withColumn("_op", lit(null).cast("string")).unionByName(tombs)
            .withColumn("_ingest_batch", lit(batchId)),
          table, keys = Seq("doc_id"), orderCol = "_ingest_batch",
          batchId = batchId, opCol = Some("_op"),
          numBuckets = cleanTableBuckets)
      case None =>
        clean.write.mode("overwrite").parquet(s"$outPath/clean/batch=$batchId")
    }
    flagged.unpersist()
    b.unpersist()
    ()
  }

  /** All flagged pairs so far (batch partition column dropped). */
  def readFlagged(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/flagged").drop("batch")

  /** All gated-clean docs so far — the per-batch-dir layout. A stream
    * started with `cleanTable` writes no such dirs: read that table
    * with [[readCleanTable]] instead. */
  def readClean(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/clean").drop("batch")

  /** The consolidated clean table of a `cleanTable` stream: current
    * clean revision per doc, internal upsert columns dropped. */
  def readCleanTable(spark: SparkSession, cleanTable: String): DataFrame =
    StreamzOps.readUpsertTable(spark, cleanTable)
      .drop("_ingest_batch", "_op")
}
