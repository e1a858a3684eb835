package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** PgCdcSimSource (SURVEY.md §7 M4): snapshot+poll micro-batch
  * replay of a deterministic changelog, and the reference's
  * table-replication semantic driven live through it.
  */
class CdcSourceSuite extends GraftSuite {

  private def readCdc(batchSize: Int, snapshotSeq: Int) =
    spark.readStream.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", batchSize.toString)
      .option("snapshotSeq", snapshotSeq.toString)
      .option("numPartitions", "4")
      .load()

  test("snapshot + poll: replays the full changelog exactly once, in multiple micro-batches") {
    val q = readCdc(batchSize = 200, snapshotSeq = 499)
      .writeStream.format("memory").queryName("cdc_replay")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("cdc_replay")
    assert(got.count() == 1000, "all 1000 events replayed")
    assert(got.select("seq").distinct().count() == 1000, "exactly once per seq")
    // ops: I on first appearance of a key, U after
    val collected = got.select("key", "seq", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val firstSeqPerKey = collected.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val inserts = collected.filter(_._3 == "I")
    assert(inserts.length == firstSeqPerKey.size)
    assert(inserts.forall { case (k, s, _) => firstSeqPerKey(k) == s },
      "I must be exactly each key's first change")
    // snapshot then poll quantum: 1000 rows @ snapshot 500 + 200/poll
    // → ≥ 3 non-empty micro-batches
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.length >= 3, s"expected snapshot+polls, got ${batches.toSeq}")
    assert(batches.head == 500, s"first batch must be the snapshot (got ${batches.toSeq})")
    assert(batches.tail.forall(_ <= 200), s"poll quantum respected: ${batches.toSeq}")
  }

  test("live table replication: streaming latest-by-key over CDC == batch q_cdc_latest_by_key") {
    val state = scala.collection.mutable.HashMap.empty[Long, (Long, Long, String, Double)]
    val q = readCdc(batchSize = 300, snapshotSeq = 99)
      .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // idempotent upsert by (seq) — the reference's "downstream
        // consumers reconstruct current table state" semantic
        df.select("key", "seq", "ts", "event_type", "value").collect().foreach { r =>
          val k = r.getLong(0); val seq = r.getLong(1)
          val cur = state.get(k)
          if (cur.isEmpty || cur.get._1 < seq)
            state(k) = (seq, r.getTimestamp(2).getTime, r.getString(3), r.getDouble(4))
        }
        ()
      }.start()
    q.awaitTermination(120000)
    val batch = queries.Streaming.qCdcLatestByKey(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    val gotSeqs = state.map { case (k, v) => k -> v._1 }.toMap
    assert(gotSeqs == batch,
      s"live replication must equal batch fold; diff=${(gotSeqs.toSet diff batch.toSet).take(5)}")
  }

  test("file source ingestion (§2A from_textfile analog): streaming parquet == batch on same file") {
    Tables.setEventsReadConfs(spark)
    // the file source watches a DIRECTORY (new files = new data)
    val watchDir = java.nio.file.Files.createTempDirectory("file_src").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$watchDir/events.parquet"))
    val sch = spark.read.parquet(s"$sf0001/events.parquet").schema
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1")
      .parquet(watchDir)
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("file_src")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("file_src").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("CDC sink: foreachBatch idempotent merge into a key-partitioned parquet table") {
    val outDir = java.nio.file.Files.createTempDirectory("cdc_sink").toString + "/state"
    val q = readCdc(batchSize = 300, snapshotSeq = 499)
      .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // latest-per-key within the batch, then merge with the table:
        // read-modify-write keyed upsert (at scale: MERGE INTO /
        // partition overwrite on a lakehouse table — same contract)
        val sess = df.sparkSession
        val batchLatest = df.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("key")).orderBy(col("seq").desc)))
          .filter(col("rn") === 1).drop("rn")
        val merged = if (new java.io.File(outDir).exists()) {
          val cur = sess.read.parquet(outDir)
          cur.unionByName(batchLatest)
            .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("key")).orderBy(col("seq").desc)))
            .filter(col("rn") === 1).drop("rn")
        } else batchLatest
        val tmp = outDir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        sess.read.parquet(tmp).write.mode("overwrite").parquet(outDir)
        ()
      }.start()
    q.awaitTermination(120000)
    val table = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    val want = queries.Streaming.qCdcLatestByKey(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    assert(table == want, "materialized table must equal the batch changelog fold")
  }

  test("batch read of the source returns the whole changelog") {
    val df = spark.read.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet").load()
    assert(df.count() == 1000)
    assert(df.schema.fieldNames.toSeq ==
      Seq("seq", "key", "op", "ts", "event_type", "value"))
  }

  test("executor-side predicate readers == driver-side reference derivation (incl. deletes)") {
    // the batch read resolves ChangelogSlice predicates executor-side
    // via parquet-hadoop; it must reproduce PgCdcSim.loadChangelog
    // (the driver-side reference oracle) byte for byte
    for (deletes <- Seq(false, true)) {
      val got = spark.read.format("pg-cdc-sim")
        .option("path", s"$sf0001/events.parquet")
        .option("deletes", deletes.toString).load()
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getTimestamp(3).getTime,
          if (r.isNullAt(4)) null else r.getString(4),
          if (r.isNullAt(5)) null else r.getDouble(5): java.lang.Double))
        .sortBy(_._1)
      val want = graft.sources.PgCdcSim
        .loadChangelog(s"$sf0001/events.parquet", deletes)
        .map(r => (r.seq, r.key, r.op, r.tsUs / 1000, r.eventType, r.value))
      assert(got.length == want.length, s"deletes=$deletes row count")
      assert(got.toSeq == want.toSeq, s"deletes=$deletes rows diverge")
      if (deletes) {
        val d = got.filter(_._3 == "D")
        assert(d.nonEmpty && d.forall(t => t._2 % 10 == 7 && t._5 == null && t._6 == null),
          "tombstones: deterministic key subset, null payload")
      } else assert(got.forall(_._3 != "D"))
    }
  }

  test("sinkUpsert: CDC stream -> keyed-upsert table == q_cdc_latest_by_key; restart is a no-op") {
    import graft.api.StreamzOps._
    val base = java.nio.file.Files.createTempDirectory("sink_upsert").toString
    val table = s"$base/state"
    val cp = s"$base/cp"
    def run() = {
      val q = readCdc(batchSize = 300, snapshotSeq = 99)
        .sinkUpsert(table, Seq("key"), "seq", cp)
      q.awaitTermination(120000)
    }
    run()
    val want = queries.Streaming.qCdcLatestByKey(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    def tableState() = graft.api.StreamzOps.readUpsertTable(spark, table).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    assert(tableState() == want, "sinkUpsert table must equal the batch changelog fold")
    run() // restart from the same checkpoint: fully caught up -> no change
    assert(tableState() == want, "restart from checkpoint must be a no-op")
  }

  test("sinkUpsert with op=D tombstones: deleted keys absent from replicated state") {
    import graft.api.StreamzOps._
    val base = java.nio.file.Files.createTempDirectory("sink_upsert_del").toString
    val q = spark.readStream.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", "300").option("snapshotSeq", "99")
      .option("numPartitions", "4").option("deletes", "true")
      .load()
      .sinkUpsert(s"$base/state", Seq("key"), "seq", s"$base/cp", opCol = Some("op"))
    q.awaitTermination(120000)
    val got = graft.api.StreamzOps.readUpsertTable(spark, s"$base/state").collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    val full = queries.Streaming.qCdcLatestByKey(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_event_id")).toMap
    val want = full.filter { case (k, _) => k % 10 != 7 }
    assert(full.keys.exists(_ % 10 == 7), "fixture has tombstoned keys")
    assert(got == want,
      s"tombstoned keys must be dropped, others keep latest seq; " +
        s"unexpected=${(got.toSet diff want.toSet).take(5)}")
  }

  test("sinkUpsert incremental publish: a 1-key batch rewrites exactly 1 bucket") {
    import graft.api.StreamzOps._
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsert_bucket").toString
    val table = s"$base/state"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val q = ms.toDF().toDF("key", "seq", "value")
      .sinkUpsert(table, Seq("key"), "seq", s"$base/cp", numBuckets = 8,
        trigger = Trigger.ProcessingTime(0))
    try {
      ms.addData((1L to 40L).map(k => (k, k, k * 1.0)): _*)
      q.processAllAvailable()
      ms.addData((1L, 1000L, 9.9))
      q.processAllAvailable()
    } finally q.stop()
    // commit m2 (the 1-key batch) wrote exactly one bucket dir…
    val m2buckets = new java.io.File(s"$table/data/m2").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("_bp=")).map(_.getName)
    assert(m2buckets.length == 1,
      s"1-key batch must rewrite exactly 1 bucket, wrote ${m2buckets.toSeq}")
    // …and every clean bucket's manifest entry still points into m1
    val manifest = scala.io.Source.fromFile(s"$table/manifest/m2").getLines().toVector
    val entries = manifest.tail.map(_.split("\t")).map(a => a(0).toInt -> a(1))
    assert(entries.count(_._2.startsWith("data/m2/")) == 1)
    assert(entries.count(_._2.startsWith("data/m1/")) == entries.size - 1)
    assert(entries.size > 1, "fixture must span multiple buckets")
    // and the snapshot reads back as the correct fold
    val got = readUpsertTable(spark, table).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    assert(got == ((2L to 40L).map(k => k -> k).toMap + (1L -> 1000L)))
  }

  test("predicate pushdown: a narrow slice of a multi-row-group changelog materializes far less than the log") {
    import graft.sources.{ChangelogReadMetrics, ChangelogReader, ChangelogSlice}
    val sess = spark; import sess.implicits._
    val base = java.nio.file.Files.createTempDirectory("cdc_push").toString + "/log"
    val n = 40000
    // seq-sorted changelog written with tiny row groups: the shape a
    // real appended changelog has (monotone seq across row groups)
    (0 until n).map(i => (i.toLong, (i % 97).toLong,
        i.toLong * 1000000000L, "e" + (i % 3), i / 10.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).sortWithinPartitions("event_id")
      .write.option("parquet.block.size", 64 * 1024)
      .option("parquet.page.size", 16 * 1024).parquet(base)
    val part = new java.io.File(base).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val hconf = spark.sessionState.newHadoopConf()
    val inFile = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath), hconf)
    val totalGroups = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(inFile)
      try r.getRowGroups.size finally r.close()
    }
    assert(totalGroups >= 4, s"fixture must be multi-row-group (got $totalGroups)")

    // (a) row-group STATS skip: the reader's seq-range FilterPredicate
    // prunes non-overlapping groups before any page IO
    val seqCol = org.apache.parquet.filter2.predicate.FilterApi.longColumn("event_id")
    val pred = org.apache.parquet.filter2.predicate.FilterApi.and(
      org.apache.parquet.filter2.predicate.FilterApi.gt(seqCol, Long.box(30000L)),
      org.apache.parquet.filter2.predicate.FilterApi.ltEq(seqCol, Long.box(30500L)))
    val survivingGroups = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(inFile,
        org.apache.parquet.ParquetReadOptions.builder()
          .withRecordFilter(org.apache.parquet.filter2.compat.FilterCompat.get(pred))
          .build())
      try r.getRowGroups.size finally r.close()
    }
    assert(survivingGroups < totalGroups && survivingGroups >= 1,
      s"seq-range predicate must skip row groups: $survivingGroups of $totalGroups survive")

    // (b) reader-level materialization: slice (30000, 30500] with one
    // partition materializes the 500 output rows (record filter) plus
    // the 2-column history prefix (seqs 0..30000) — and nothing else.
    // The pre-pushdown reader materialized all 40000 full-width rows
    // per slice per pass.
    ChangelogReadMetrics.recordsMaterialized.reset()
    val rdr = new ChangelogReader(
      ChangelogSlice(base, 30000L, 30500L, 0, 1, deletes = false,
        maxDataSeq = n - 1L, firstSeenDir = None), hconf)
    var cnt = 0
    val ops = scala.collection.mutable.Set.empty[String]
    while (rdr.next()) { ops += rdr.get().getString(2); cnt += 1 }
    rdr.close()
    assert(cnt == 500, s"slice rows (got $cnt)")
    assert(ops == Set("U"), "every key in the slice already appeared in the prefix -> all U")
    val mat = ChangelogReadMetrics.recordsMaterialized.sum()
    assert(mat == 30001 + 500,
      s"materialized must be history prefix (30001) + in-range rows (500), got $mat")

    // (c) with a first-seen key index, the history prefix pass is
    // replaced by one bucket read: O(keys) = 97, not O(prefix) = 30001
    val idx = java.nio.file.Files.createTempDirectory("cdc_push_idx").toString + "/first_seen"
    spark.read.parquet(base)
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_seq"))
      .withColumn("part", pmod(col("user_id"), lit(1L)))
      .write.partitionBy("part").parquet(idx)
    ChangelogReadMetrics.recordsMaterialized.reset()
    val rdr2 = new ChangelogReader(
      ChangelogSlice(base, 30000L, 30500L, 0, 1, deletes = false,
        maxDataSeq = n - 1L, firstSeenDir = Some(idx)), hconf)
    var cnt2 = 0
    val ops2 = scala.collection.mutable.Set.empty[String]
    while (rdr2.next()) { ops2 += rdr2.get().getString(2); cnt2 += 1 }
    rdr2.close()
    assert(cnt2 == 500 && ops2 == Set("U"), "index path must agree with the prefix path")
    val mat2 = ChangelogReadMetrics.recordsMaterialized.sum()
    assert(mat2 == 97 + 500,
      s"materialized must be index bucket (97 keys) + in-range rows (500), got $mat2")
  }

  test("streaming replay builds the first-seen index under the checkpoint and stays exact") {
    val cp = java.nio.file.Files.createTempDirectory("cdc_idx_cp").toString
    val q = readCdc(batchSize = 150, snapshotSeq = 299)
      .writeStream.format("memory").queryName("cdc_idx_replay")
      .option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // Spark scopes the source's checkpoint dir under sources/<i>
    assert(new java.io.File(s"$cp/sources/0/sources_graft/first_seen_n4/_SUCCESS").exists,
      "mid-stream batches must have built the bucketed first-seen index")
    val got = spark.table("cdc_idx_replay")
    assert(got.count() == 1000 && got.select("seq").distinct().count() == 1000)
    // op exactness with index-resolved history: I = each key's global first seq
    val collected = got.select("key", "seq", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val firstSeqPerKey = collected.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val inserts = collected.filter(_._3 == "I")
    assert(inserts.length == firstSeqPerKey.size)
    assert(inserts.forall { case (k, s, _) => firstSeqPerKey(k) == s })
  }

  test("sinkScd2: CDC stream -> version history == batch lead-over-seq; restart no-op; deletes close validity") {
    import graft.api.StreamzOps._
    val base = java.nio.file.Files.createTempDirectory("sink_scd2").toString
    val table = s"$base/state"
    def run() = {
      val q = readCdc(batchSize = 300, snapshotSeq = 99)
        .sinkScd2(table, Seq("key"), "seq", s"$base/cp")
      q.awaitTermination(120000)
    }
    run()
    def history() = graft.api.StreamzOps.readScd2Table(spark, table).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("seq"),
        Option(r.getAs[java.lang.Long]("valid_to_ord")).map(_.longValue),
        r.getAs[Int]("is_current"))).toSet
    // batch truth: lead(seq) per key over the full changelog
    val bySeq = spark.read.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet").load()
      .select("key", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = bySeq.toSeq.flatMap { case (k, seqs) =>
      seqs.zipWithIndex.map { case (s, i) =>
        val next = if (i + 1 < seqs.length) Some(seqs(i + 1)) else None
        (k, s, next, if (next.isEmpty) 1 else 0)
      }
    }.toSet
    assert(history() == want, "streamed SCD2 history must equal the batch fold")
    run() // restart from the same checkpoint: fully caught up -> no change
    assert(history() == want, "restart must be a no-op")

    // with tombstones: the deleted key's last version is CLOSED at the
    // tombstone seq, and no version of it is current
    val q2 = spark.readStream.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet")
      .option("batchSize", "300").option("snapshotSeq", "99")
      .option("numPartitions", "4").option("deletes", "true").load()
      .sinkScd2(s"$base/state_del", Seq("key"), "seq", s"$base/cp_del",
        opCol = Some("op"))
    q2.awaitTermination(120000)
    val hist = graft.api.StreamzOps
      .readScd2Table(spark, s"$base/state_del", opCol = Some("op")).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("seq"),
        Option(r.getAs[java.lang.Long]("valid_to_ord")).map(_.longValue),
        r.getAs[Int]("is_current")))
    assert(!hist.exists(_._2 > 999), "op=D marker rows must not surface by default")
    val deleted = hist.filter(_._1 % 10 == 7)
    assert(deleted.nonEmpty && deleted.forall(_._4 == 0),
      "no version of a tombstoned key may be current")
    deleted.groupBy(_._1).foreach { case (k, vs) =>
      val last = vs.maxBy(_._2)
      assert(last._3.exists(_ > 999),
        s"key $k's final version must be closed at its tombstone seq (got ${last._3})")
    }
    val alive = hist.filter(_._1 % 10 != 7)
    assert(alive.groupBy(_._1).forall { case (_, vs) => vs.count(_._4 == 1) == 1 },
      "every live key keeps exactly one current version")
  }

  test("compactTable: buckets collapse to one file each; snapshot identical; manifest advances") {
    import graft.api.StreamzOps._
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsert_compact").toString
    val table = s"$base/state"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    // many-files-per-bucket shape needs (a) a bucket count that does
    // not divide the shuffle parallelism (8 buckets on 4 shuffle
    // partitions aligns 1 task : 1 bucket) and (b) AQE coalescing off
    // (on this tiny fixture it folds the write into one task; at real
    // sizes it would not)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val q = ms.toDF().toDF("key", "seq", "value")
      .sinkUpsert(table, Seq("key"), "seq", s"$base/cp", numBuckets = 3,
        trigger = Trigger.ProcessingTime(0))
    try {
      ms.addData((1L to 64L).map(k => (k, k, k * 1.0)): _*)
      q.processAllAvailable()
      ms.addData((1L to 64L).map(k => (k, k + 1000L, k * 2.0)): _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    def state() = readUpsertTable(spark, table).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    def dataFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$table/data"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    }
    val before = state()
    val nFilesBefore = dataFiles().size
    val reported = graft.api.StreamzOps.compactTable(spark, table)
    assert(reported == nFilesBefore, s"reported $reported != counted $nFilesBefore")
    val after = dataFiles()
    assert(after.size < nFilesBefore, s"compaction must shrink files ($nFilesBefore -> ${after.size})")
    // exactly one file per surviving bucket dir
    val perDir = after.groupBy(_.getParentFile.getName).values.map(_.size)
    assert(perDir.forall(_ == 1), s"one file per bucket after compaction: $perDir")
    assert(state() == before, "compaction must not change the snapshot")
  }

  test("compactTable + zorderBy: OPTIMIZE ZORDER — row groups skip on both dims; snapshot identical") {
    import graft.api.StreamzOps._
    import scala.jdk.CollectionConverters._
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsert_zorder").toString
    val table = s"$base/state"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, String)]
    val q = ms.toDF().toDF("key", "seq", "lang", "source")
      .sinkUpsert(table, Seq("key"), "seq", s"$base/cp", numBuckets = 2,
        trigger = Trigger.ProcessingTime(0))
    try {
      // interleaved dims: neither bucket hash nor arrival order
      // correlates with (lang, source), so unordered files have
      // full-range stats on both
      ms.addData((1L to 16000L).map(k =>
        (k, k, s"l${k % 8}", s"src${(k / 8) % 16}")): _*)
      q.processAllAvailable()
    } finally q.stop()
    def state() = readUpsertTable(spark, table).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[String]("source")).toMap
    val before = state()
    // (overlapping, total) row groups whose min/max stats admit the
    // predicates — what any stats-based reader must read
    def overlaps(preds: Map[String, String]): (Int, Int) = {
      val fs = new java.io.File(s"$table/data")
      val latest = fs.listFiles.filter(_.getName.matches("m\\d+"))
        .maxBy(_.getName.stripPrefix("m").toInt)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      val files = walk(latest).filter(_.getName.endsWith(".parquet"))
      val conf = spark.sessionState.newHadoopConf()
      var total = 0; var hit = 0
      files.foreach { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try r.getRowGroups.asScala.foreach { rg =>
          total += 1
          val ok = preds.forall { case (c, v) =>
            val st = rg.getColumns.asScala.find(_.getPath.toDotString == c).get.getStatistics
            val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
            mn <= v && v <= mx
          }
          if (ok) hit += 1
        } finally r.close()
      }
      (hit, total)
    }
    // small row groups so skipping is visible INSIDE each bucket's
    // single compacted file (the base hadoop conf feeds every write)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.block.size", "32768")
    hc.set("parquet.page.size", "8192")
    try {
      val preds = Map("lang" -> "l3", "source" -> "src5")
      graft.api.StreamzOps.compactTable(spark, table)
      val (plainHit, plainTotal) = overlaps(preds)
      graft.api.StreamzOps.compactTable(spark, table, zorderBy = Seq("lang", "source"))
      val (zHit, zTotal) = overlaps(preds)
      assert(plainTotal > 2 && zTotal > 2,
        s"need multiple row groups per bucket to see skipping ($plainTotal, $zTotal)")
      assert(zHit < plainHit,
        s"z-ordered compaction must overlap fewer row groups ($zHit/$zTotal) " +
          s"than plain compaction ($plainHit/$plainTotal)")
    } finally {
      hc.unset("parquet.block.size")
      hc.unset("parquet.page.size")
    }
    assert(state() == before, "z-ordered compaction must not change the snapshot")
    // still one file per surviving bucket dir (the OPTIMIZE contract)
    val latest = new java.io.File(s"$table/data").listFiles
      .filter(_.getName.matches("m\\d+")).maxBy(_.getName.stripPrefix("m").toInt)
    val perDir = latest.listFiles.filter(_.getName.startsWith("_bp="))
      .map(_.listFiles.count(f => f.getName.endsWith(".parquet")))
    assert(perDir.nonEmpty && perDir.forall(_ == 1),
      s"one file per bucket after z compaction: ${perDir.toSeq}")
  }

  test("compactIfNeeded: fires only past the per-bucket file threshold; no-op otherwise") {
    import graft.api.StreamzOps._
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsert_auto").toString
    val table = s"$base/state"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val q = ms.toDF().toDF("key", "seq", "value")
      .sinkUpsert(table, Seq("key"), "seq", s"$base/cp", numBuckets = 3,
        trigger = Trigger.ProcessingTime(0))
    try {
      ms.addData((1L to 64L).map(k => (k, k, k * 1.0)): _*)
      q.processAllAvailable()
      ms.addData((1L to 64L).map(k => (k, k + 1000L, k * 2.0)): _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    def manifests() = new java.io.File(s"$table/manifest").listFiles
      .map(_.getName).filter(_.matches("m\\d+"))
      .map(_.stripPrefix("m").toLong).sorted.toSeq
    def state() = readUpsertTable(spark, table).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    val before = state()
    val m0 = manifests()
    // generous threshold: fragmentation below it -> metadata-only no-op
    assert(!graft.api.StreamzOps.compactIfNeeded(spark, table, maxFilesPerBucket = 1000))
    assert(manifests() == m0, "a no-op check must not commit a manifest")
    // tight threshold: fires, collapses to one file per bucket
    assert(graft.api.StreamzOps.compactIfNeeded(spark, table, maxFilesPerBucket = 1))
    val m1 = manifests()
    assert(m1.max == m0.max + 1, "a fired compaction commits exactly one manifest")
    assert(state() == before, "auto-compaction must not change the snapshot")
    // now AT the threshold (1 file/bucket == maxFilesPerBucket): settles
    assert(!graft.api.StreamzOps.compactIfNeeded(spark, table, maxFilesPerBucket = 1))
    assert(manifests() == m1)
  }

  test("sinkUpsert retention: reader inside the publish window sees only committed snapshots; time travel") {
    import graft.api.StreamzOps._
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val base = java.nio.file.Files.createTempDirectory("upsert_retain").toString
    val table = s"$base/state"
    def tableState(snapshot: Option[Long] = None) =
      graft.api.StreamzOps.readUpsertTable(spark, table, snapshot).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[Long]("seq")).toMap
    // a "concurrent" reader placed at each publish barrier of batch 1
    // (the m2 commit) via the failpoint hook
    val observed = scala.collection.concurrent.TrieMap.empty[String, Map[Long, Long]]
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val q = ms.toDF().toDF("key", "seq", "value")
      .sinkUpsert(table, Seq("key"), "seq", s"$base/cp", numBuckets = 8,
        retainManifests = 1, trigger = Trigger.ProcessingTime(0),
        failpoint = (stage, batchId) =>
          if (batchId == 1L) observed(stage) = tableState())
    val m1 = (1L to 40L).map(k => k -> k).toMap
    try {
      ms.addData((1L to 40L).map(k => (k, k, k * 1.0)): _*) // -> m1
      q.processAllAvailable()
      ms.addData((1L, 1000L, 9.9)) // -> m2
      q.processAllAvailable()
      ms.addData((2L, 2000L, 8.8)) // -> m3 (m1 now beyond retain=1)
      q.processAllAvailable()
    } finally q.stop()
    // the publish window of m2: both pre-rename barriers still read
    // the COMPLETE m1 snapshot; the post-commit barrier reads m2
    assert(observed("data-written") == m1, "mid-write reader must see m1")
    assert(observed("pre-commit") == m1, "pre-rename reader must see m1")
    assert(observed("post-commit") == m1 + (1L -> 1000L))
    // time travel: m2 retained after the m3 commit and fully readable
    assert(tableState() == m1 + (1L -> 1000L) + (2L -> 2000L))
    assert(tableState(Some(2L)) == m1 + (1L -> 1000L))
    // m1 fell out of the retention window
    intercept[IllegalStateException](tableState(Some(1L)))
  }

  test("stream-static enrichment: CDC stream x broadcast dimension == batch join") {
    val sess = spark; import sess.implicits._
    // dimension: event_type -> category (static, broadcast-sized)
    val dim = Tables.events(spark, sf0001).select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex
      .map { case (t, i) => (t, s"cat${i % 2}") }.toSeq.toDF("event_type", "category")
    val q = readCdc(batchSize = 400, snapshotSeq = 499)
      .join(broadcast(dim), "event_type")
      .groupBy("category").count()
      .writeStream.format("memory").queryName("cdc_enriched")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("cdc_enriched").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.format("pg-cdc-sim")
      .option("path", s"$sf0001/events.parquet").load()
      .join(dim, "event_type").groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.values.sum == 1000,
      s"stream-static enrichment must equal the batch join: $got vs $want")
  }

  test("file-source formats (§2A sources row): json, csv and text all stream == batch") {
    val sess = spark; import sess.implicits._
    val base = java.nio.file.Files.createTempDirectory("fmt_src").toString
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars")).limit(100)
    df.coalesce(1).write.json(s"$base/json")
    df.coalesce(1).write.option("header", "true").csv(s"$base/csv")
    df.select(concat_ws("|", col("doc_id"), col("lang")).as("value"))
      .coalesce(1).write.text(s"$base/text")
    def drain(dfS: org.apache.spark.sql.DataFrame, name: String) = {
      val q = dfS.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000)); spark.table(name)
    }
    val sch = spark.read.json(s"$base/json").schema
    assert(drain(spark.readStream.schema(sch).json(s"$base/json"), "fmt_json")
      .count() == 100)
    val csch = spark.read.option("header", "true").csv(s"$base/csv").schema
    assert(drain(spark.readStream.schema(csch).option("header", "true")
      .csv(s"$base/csv"), "fmt_csv").count() == 100)
    val txt = drain(spark.readStream.text(s"$base/text"), "fmt_text")
    assert(txt.count() == 100 &&
      txt.filter(col("value").contains("|")).count() == 100)
  }

  test("rate control API: cdcSource pollQuantum bounds every post-snapshot micro-batch") {
    val q = graft.api.StreamzOps
      .cdcSource(spark, s"$sf0001/events.parquet",
        pollQuantum = 120, snapshotSeq = 99)
      .writeStream.format("memory").queryName("rate_api")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("rate_api").count() == 1000, "whole changelog delivered")
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.length > 2, s"rate limit must force multiple polls: ${sizes.mkString(",")}")
    // first admitted batch is the snapshot (seqs 0..99); all later
    // polls are bounded by the quantum
    assert(sizes.tail.forall(_ <= 120),
      s"post-snapshot polls exceed the quantum: ${sizes.mkString(",")}")
  }

  test("batchSize <= 0 is rejected (would stall AvailableNow forever)") {
    val ex = intercept[Exception] {
      spark.read.format("pg-cdc-sim")
        .option("path", s"$sf0001/events.parquet")
        .option("batchSize", "0").load().count()
    }
    assert(ex.getMessage.contains("batchSize"))
  }

  test("empty changelog: default snapshotSeq clamps, AvailableNow terminates with 0 rows") {
    // empty parquet with the events schema → maxSeq = -1; the default
    // snapshot offset (maxSeq/2 == 0 in Scala for -1) must clamp to -1
    // or latestOffset oscillates 0 → -1 → 0 forever
    val empty = java.nio.file.Files.createTempDirectory("cdc_empty").toString
    spark.read.parquet(s"$sf0001/events.parquet").limit(0)
      .write.mode("overwrite").parquet(empty)
    val out = java.nio.file.Files.createTempDirectory("cdc_empty_out").toString
    val q = spark.readStream.format("pg-cdc-sim")
      .option("path", empty).load()
      .writeStream.format("memory").queryName("cdc_empty")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow must terminate on an empty changelog")
    assert(spark.table("cdc_empty").count() == 0)
  }
}
