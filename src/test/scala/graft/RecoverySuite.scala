package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Fault-tolerance + state-backend proofs (§4.3): exactly-once across
  * a kill/restart of the CDC stream (offset WAL + idempotent sink),
  * and stateful aggregation on the RocksDB state store provider.
  */
class RecoverySuite extends GraftSuite {

  test("CDC restart from checkpoint: kill mid-stream, resume, exactly-once overall") {
    val cp = java.nio.file.Files.createTempDirectory("cdc_cp").toString
    // idempotent sink: keyed by batchId so a replayed in-flight batch
    // overwrites rather than duplicates (the standard foreachBatch
    // exactly-once contract)
    val byBatch = scala.collection.mutable.HashMap.empty[Long, Array[Long]]
    def start() = spark.readStream.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", "100")
      .option("snapshotSeq", "199")
      .option("numPartitions", "4")
      .load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        byBatch(batchId) = df.select("seq").collect().map(_.getLong(0))
        ()
      }.start()

    val q1 = start()
    // let at least one micro-batch commit, then kill the query
    val deadline = System.currentTimeMillis() + 60000
    while (byBatch.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(10)
    q1.stop()
    q1.awaitTermination(60000)
    val afterKill = byBatch.values.map(_.length).sum
    assert(byBatch.nonEmpty, "first run must commit at least one batch")
    // On a fast machine all ~10 AvailableNow batches may drain before
    // stop() lands; the restart is only meaningful when the kill was
    // mid-stream, so note it instead of failing spuriously.
    if (afterKill == 1000)
      info("first run drained fully before stop() — restart still exercised below")

    val q2 = start() // resumes from the offset WAL
    q2.awaitTermination(120000)
    val all = byBatch.values.flatten.toSeq.sorted
    assert(all == (0L until 1000L), // no loss, no dupes across the restart
      s"exactly-once violated: ${all.length} rows, dupes=${all.groupBy(identity).count(_._2.length > 1)}")
  }

  test("sinkUpsert kill mid-stream + resume: final table state exactly equals the batch fold") {
    import graft.api.StreamzOps._
    val base = java.nio.file.Files.createTempDirectory("upsert_kill").toString
    val table = s"$base/state"; val cp = s"$base/cp"
    def start() = spark.readStream.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", "100")
      .option("snapshotSeq", "99")
      .option("numPartitions", "4")
      .load()
      .sinkUpsert(table, Seq("key"), "seq", cp)
    val q1 = start()
    // kill once the first merge has COMMITTED (a manifest exists)
    def committed() = {
      val d = new java.io.File(s"$table/manifest")
      d.exists && d.listFiles.exists(_.getName.matches("m\\d+"))
    }
    val deadline = System.currentTimeMillis() + 60000
    while (!committed() && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    q1.stop(); q1.awaitTermination(60000)
    val q2 = start() // resume from the offset WAL
    assert(q2.awaitTermination(120000))
    val got = graft.api.StreamzOps.readUpsertTable(spark, table).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    val want = queries.Streaming.qCdcLatestByKey(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    assert(got == want,
      s"post-recovery table must equal the batch fold; diff=${(got.toSet diff want.toSet).take(5)}")
  }

  test("sinkUpsert crash INSIDE the publish window: committed snapshot survives, restart converges") {
    import graft.api.StreamzOps._
    // batch 0 = snapshot seqs 0..99 (commits manifest m1); the
    // injected failure then kills batch 1 at each publish barrier in
    // turn — after the data write, before the manifest rename, after
    // the manifest rename (the old delete→rename design lost the
    // whole table on the first two)
    for (crashAt <- Seq("data-written", "pre-commit", "post-commit")) {
      val base = java.nio.file.Files.createTempDirectory(s"upsert_crash").toString
      val table = s"$base/state"; val cp = s"$base/cp"
      def start(fp: (String, Long) => Unit) = spark.readStream.format("pg-cdc-sim")
        .option("path", s"$sf0001/events.parquet")
        .option("batchSize", "100")
        .option("snapshotSeq", "99")
        .option("numPartitions", "4")
        .load()
        .sinkUpsert(table, Seq("key"), "seq", cp, failpoint = fp)
      val q1 = start((p, b) => if (p == crashAt && b == 1L)
        throw new RuntimeException(s"injected crash at $p"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(120000)
      }
      // the table must still read as a complete committed snapshot:
      // exactly the changelog fold up to its own max seq (prefix-
      // consistent), and when the crash hit before the commit that
      // prefix is batch 0 alone
      val afterCrash = readUpsertTable(spark, table).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
      def foldTo(maxSeq: Long) = spark.read.format("pg-cdc-sim")
        .option("path", s"$sf0001/events.parquet").load()
        .filter(col("seq") <= maxSeq)
        .groupBy("key").agg(max("seq").as("seq")).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
      val hi = afterCrash.values.max
      assert(afterCrash == foldTo(hi),
        s"$crashAt: surviving snapshot is not a prefix-consistent fold")
      if (crashAt != "post-commit")
        assert(hi == 99L, s"$crashAt: only batch 0 may be visible, saw seq $hi")
      val q2 = start((_, _) => ()) // restart without the failpoint
      assert(q2.awaitTermination(120000))
      val want = queries.Streaming.qCdcLatestByKey(spark, sf0001).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
      val got = readUpsertTable(spark, table).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
      assert(got == want, s"$crashAt: post-recovery state must equal the batch fold")
    }
  }

  test("sinkScd2 crash inside the publish window: history stays prefix-consistent, restart converges") {
    import graft.api.StreamzOps._
    for (crashAt <- Seq("data-written", "pre-commit", "post-commit")) {
      val base = java.nio.file.Files.createTempDirectory("scd2_crash").toString
      val table = s"$base/state"; val cp = s"$base/cp"
      def start(fp: (String, Long) => Unit) = spark.readStream.format("pg-cdc-sim")
        .option("path", s"$sf0001/events.parquet")
        .option("batchSize", "100").option("snapshotSeq", "99")
        .option("numPartitions", "4").load()
        .sinkScd2(table, Seq("key"), "seq", cp, failpoint = fp)
      val q1 = start((p, b) => if (p == crashAt && b == 1L)
        throw new RuntimeException(s"injected crash at $p"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(120000)
      }
      // surviving snapshot must be the complete history of SOME seq
      // prefix (batch 0 alone unless the commit landed)
      def histTo(maxSeq: Long) = spark.read.format("pg-cdc-sim")
        .option("path", s"$sf0001/events.parquet").load()
        .filter(col("seq") <= maxSeq).select("key", "seq").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).toSeq.flatMap { case (k, rows) =>
          val seqs = rows.map(_._2).sorted
          seqs.zipWithIndex.map { case (s, i) =>
            (k, s, if (i + 1 < seqs.length) Some(seqs(i + 1)) else None)
          }
        }.toSet
      def tableHist() = readScd2Table(spark, table).collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[Long]("seq"),
          Option(r.getAs[java.lang.Long]("valid_to_ord")).map(_.longValue))).toSet
      val after = tableHist()
      val hi = after.map(_._2).max
      assert(after == histTo(hi), s"$crashAt: survivor is not a prefix-consistent history")
      if (crashAt != "post-commit")
        assert(hi == 99L, s"$crashAt: only batch 0 may be visible, saw seq $hi")
      val q2 = start((_, _) => ())
      assert(q2.awaitTermination(120000))
      assert(tableHist() == histTo(999L),
        s"$crashAt: post-recovery history must equal the full batch fold")
    }
  }

  test("NearDupStream -> sinkUpsert end-to-end: crash mid-publish of batch 1, restart, exactly-once") {
    // VERDICT r11 next #6: the two components are individually
    // recovery-tested; this pins the COMPOSITION — stateful
    // transformWithState matching feeding the manifest-committed
    // upsert sink, killed between the data write and the manifest
    // commit, must converge to exactly the batch dual after restart
    // (state store rolls back to the pre-batch version, the replayed
    // batch re-emits the same matches, the upsert dedups by key).
    import graft.api.StreamzOps._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("neardup_e2e").toString
      val docsDir = s"$base/docs"; val table = s"$base/pairs"; val cp = s"$base/cp"
      // replayable file source, one id-ordered chunk per micro-batch
      val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") < 250).coalesce(1).write.parquet(docsDir)
      docs.filter(col("doc_id") >= 250).coalesce(1)
        .write.mode("append").parquet(docsDir)
      // pin arrival order chunk1 -> chunk2 (file source goes by mod time)
      val parts = new java.io.File(docsDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.length())
      val byMax = parts.map { f =>
        val ids = spark.read.parquet(f.getPath).agg(max(col("doc_id"))).head.getLong(0)
        (f, ids)
      }.sortBy(_._2)
      byMax.zipWithIndex.foreach { case ((f, _), i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def start(fail: Boolean) = graft.api.NearDupStream.nearDupStream(
          spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", "1").parquet(docsDir),
          "doc_id", "text", minSim = 0.5)
        .sinkUpsert(table, Seq("doc_id", "matched_id"), "band", cp,
          failpoint = (stage, batchId) =>
            if (fail && stage == "pre-commit" && batchId == 1L &&
              !crashed.getAndSet(true)) throw new RuntimeException("injected crash"))
      val q1 = start(fail = true)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(); ()
      }
      assert(crashed.get(), "the injected mid-publish crash must have fired")
      val q2 = start(fail = false) // resume: replays batch 1 from the WAL
      assert(q2.awaitTermination(180000), "restarted query must drain")
      val got = readUpsertTable(spark, table)
        .select("doc_id", "matched_id", "est_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = graft.api.NearDupStream.nearDupBatch(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(want.nonEmpty, "fixture must contain near-dups")
      assert(got == want,
        s"post-recovery pair table must equal the batch dual; " +
          s"missing=${(want diff got).take(5)} extra=${(got diff want).take(5)}")
    } finally prevProvider match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful aggregation runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // §4.3: changelog checkpointing — upload per-batch deltas instead
    // of full RocksDB snapshots
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try {
      import java.sql.Timestamp
      val sess = spark
      import sess.implicits._
      implicit val sqlCtx = sess.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long)]
      val q = ms.toDF().toDF("ts", "uid")
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour"), $"uid").count()
        .writeStream.format("memory").queryName("rocksdb_t")
        .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
      ms.addData((Timestamp.valueOf("2024-01-01 00:10:00"), 1L),
        (Timestamp.valueOf("2024-01-01 00:20:00"), 1L))
      q.processAllAvailable()
      ms.addData((Timestamp.valueOf("2024-01-01 00:30:00"), 1L)) // state carried in RocksDB
      q.processAllAvailable()
      q.stop()
      val n = sess.table("rocksdb_t").collect().map(_.getLong(2)).max
      assert(n == 3L, s"incremental state across batches via RocksDB, got $n")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("retractAggStream -> sinkAggMaintain: maintained aggregate == q_cdc_agg_maintain; crash-replay never double-adds") {
    // #130's streaming form, end-to-end: per-key last-version state
    // turns the changelog into signed deltas; the additive sink folds
    // them into a persisted per-group table. Crashes are injected at
    // every publish barrier of batch 1; "post-commit" is the worst
    // window for an ADDITIVE sink — the batch already landed, so a
    // naive replay would apply it TWICE (the per-bucket batchId guard
    // is what this pins).
    import graft.api.StreamzOps._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val want = queries.Linkage.qCdcAggMaintain(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(want.nonEmpty)
      for (crashAt <- Seq("data-written", "pre-commit", "post-commit")) {
        val base = java.nio.file.Files.createTempDirectory("aggmaint").toString
        val table = s"$base/state"; val cp = s"$base/cp"
        val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def start(fail: Boolean) = {
          val cdc = spark.readStream.format("pg-cdc-sim")
            .option("path", s"$sf0001/events.parquet")
            .option("batchSize", "250")
            .option("snapshotSeq", "99")
            .option("numPartitions", "4")
            .load()
            .withColumn("cents",
              round(col("value").cast("decimal(18,2)") * 100).cast("long"))
          graft.api.StreamzStateOps
            .retractAggStream(cdc, "key", "seq", "event_type", "cents")
            .sinkAggMaintain(table, Seq("grp"), cp,
              failpoint = (stage, batchId) =>
                if (fail && stage == crashAt && batchId == 1L &&
                  !crashed.getAndSet(true))
                  throw new RuntimeException(s"injected crash at $stage"))
        }
        val q1 = start(fail = true)
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.awaitTermination(); ()
        }
        assert(crashed.get(), s"$crashAt: the injected crash must have fired")
        val q2 = start(fail = false) // replays batch 1 from the WAL
        assert(q2.awaitTermination(180000), s"$crashAt: restarted query must drain")
        val got = readAggTable(spark, table).collect()
          .map(r => (r.getAs[String]("grp"), r.getAs[Long]("dn"),
            r.getAs[Long]("dv"))).toSet
        assert(got == want,
          s"$crashAt: maintained table must equal the batch row after recovery; " +
            s"missing=${(want diff got).take(5)} extra=${(got diff want).take(5)}")
      }
    } finally prevProvider match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
