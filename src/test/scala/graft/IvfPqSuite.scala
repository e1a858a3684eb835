package graft

import org.apache.spark.sql.functions._
import graft.api.IvfPqIndex
import graft.queries.LlmPipeline

/** Fused IVF-PQ lifecycle: build → probe-pruned ADC over ONLY the
  * probed cells' codes → exact re-rank → grow/split without retrain.
  * The two plan assertions are the 100 TB claim: a probe must (1)
  * skip unprobed cell directories and (2) read only the CODE bytes of
  * the cells it scans, not the embeddings.
  */
class IvfPqSuite extends GraftSuite {

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir,
      kCells = 16, m = 8, kSub = 16, seed = 42L)
    dir
  }

  private def queryBatch = Tables.embeddings(spark, sf0001)
    .filter(col("vec_id") < 50)
    .select(col("vec_id").as("qid"), col("embedding"))

  private def recallAt5(got: Array[org.apache.spark.sql.Row]): Double = {
    val exact = LlmPipeline.qSimCosineTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = got.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      ann.get(q).map(g => g.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("build + query: recall@5 >= the composed IVF->restrictTo->PQ baseline") {
    val mean = recallAt5(
      IvfPqIndex.query(spark, queryBatch, indexDir, nProbe = 4, topK = 5).collect())
    // PqIndexSuite's composed IVF-restricted baseline asserts >= 0.4
    // at nProbe=6; the fused layout must not do worse at nProbe=4
    assert(mean >= 0.4, f"fused IVF-PQ mean recall@5 $mean%.2f (composed baseline bar 0.40)")
  }

  test("ADC scan is partition-pruned to probed cells AND reads codes, not embeddings") {
    val plan = IvfPqIndex.query(spark, queryBatch, indexDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"cells scan must carry a dynamic partition-pruning filter on cell:\n$plan")
    // the codes-side FileScan must project (vec_id, codes) only —
    // parquet column pruning keeps embedding bytes out of the ADC pass
    val codeScans = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("codes"))
    assert(codeScans.exists(!_.contains("embedding")),
      s"ADC scan must not read the embedding column:\n$plan")
  }

  test("bulk path: shuffled cell join (no broadcast) returns identical results") {
    val want = IvfPqIndex.query(spark, queryBatch, indexDir).collect().toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dfq = IvfPqIndex.query(spark, queryBatch, indexDir, broadcastQueries = false)
      val plan = dfq.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"non-broadcast path must plan shuffled joins:\n$plan")
      assert(dfq.collect().toSeq == want,
        "shuffled-join probe must return exactly the broadcast-path results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("add: new vectors encode with the EXISTING codebooks and are findable") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_add").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, kCells = 16)
    val clones = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(100L, 200L, 300L))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    IvfPqIndex.add(spark, clones, dir)
    // codes consistent: a clone's codes equal its twin's (same
    // codebooks, deterministic encoder), and land in the same cell
    val rows = spark.read.parquet(s"$dir/cells/v1")
      .filter(col("vec_id").isin(100L, 200L, 300L, 100100L, 100200L, 100300L))
      .select(col("vec_id"), col("cell"), col("codes")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toMap
    Seq(100L, 200L, 300L).foreach { id =>
      assert(rows(id) == rows(id + 100000L),
        s"clone of $id must carry identical (cell, codes): ${rows(id)} vs ${rows(id + 100000L)}")
    }
    // and its twin is its top-1 (cos ~1.0 survives ADC + re-rank)
    val probes = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(100L, 200L, 300L))
      .select(col("vec_id").as("qid"), col("embedding"))
    val top1 = IvfPqIndex.query(spark, probes, dir, nProbe = 4, topK = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    Seq(100L, 200L, 300L).foreach { id =>
      assert(top1(id) == id + 100000L,
        s"clone of $id must be its own top-1 after add (got ${top1(id)})")
    }
  }

  test("residual encoding: recall holds, add stays consistent, splitCell re-encodes") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_res").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir,
      kCells = 16, residual = true)
    // recall: residual ADC must not be worse than the raw floor
    val mean = recallAt5(
      IvfPqIndex.query(spark, queryBatch, dir, nProbe = 4, topK = 5).collect())
    assert(mean >= 0.4, f"residual IVF-PQ recall@5 $mean%.2f below floor")
    // add: clone lands in its twin's cell with identical residual codes
    val clones = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(100L, 200L))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    IvfPqIndex.add(spark, clones, dir)
    val rows = spark.read.parquet(s"$dir/cells/v1")
      .filter(col("vec_id").isin(100L, 200L, 100100L, 100200L))
      .select(col("vec_id"), col("cell"), col("codes")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toMap
    Seq(100L, 200L).foreach { id =>
      assert(rows(id) == rows(id + 100000L),
        s"residual clone of $id must carry identical (cell, codes)")
    }
    // splitCell: moved rows RE-ENCODE against their new half centroid
    val before = IvfPqIndex.cellSizes(spark, dir)
    val hot = before.maxBy(_._2)._1
    val hotCodes = spark.read.parquet(s"$dir/cells/v1")
      .filter(col("cell") === hot)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    IvfPqIndex.splitCell(spark, dir, hot)
    val after = IvfPqIndex.cellSizes(spark, dir)
    assert(!after.contains(hot) && after.size == before.size + 1)
    val movedCodes = spark.read.parquet(s"$dir/cells/v1")
      .filter(col("vec_id").isin(hotCodes.keys.toSeq.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(movedCodes.keySet == hotCodes.keySet, "split conserves the cell's vectors")
    assert(movedCodes != hotCodes,
      "residual split must re-encode against the tighter half centroids")
    // and probes on the re-encoded index still answer
    val res = IvfPqIndex.query(spark, queryBatch, dir, nProbe = 4, topK = 3).collect()
    assert(res.nonEmpty)
  }

  test("splitCell: rows re-route with codes UNCHANGED; meta republishes atomically") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_split").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, kCells = 8)
    val before = IvfPqIndex.cellSizes(spark, dir)
    val codesBefore = spark.read.parquet(s"$dir/cells/v1")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val hot = before.maxBy(_._2)._1
    IvfPqIndex.splitCell(spark, dir, hot)
    val after = IvfPqIndex.cellSizes(spark, dir)
    assert(!after.contains(hot), "retired cell id must vanish")
    assert(after.size == before.size + 1)
    val fresh = after.keySet diff before.keySet
    assert(fresh.size == 2 && fresh.forall(_ > before.keys.max))
    assert(fresh.toSeq.map(after).sum == before(hot), "split conserves the cell's vectors")
    // codes are cell-independent (raw-vector encoding): the split must
    // not touch a single code anywhere in the index
    val codesAfter = spark.read.parquet(s"$dir/cells/v1")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(codesAfter == codesBefore, "splitCell must re-route rows, never re-encode")
    // meta flipped v1 -> v2 with v1 retained for in-flight readers
    val mvs = new java.io.File(s"$dir/meta").listFiles
      .map(_.getName).filter(_.matches("v\\d+")).sorted
    assert(mvs.toSeq == Seq("v1", "v2"), s"meta versions: ${mvs.toSeq}")
    // probes still route and return
    val res = IvfPqIndex.query(spark, queryBatch, dir, nProbe = 3, topK = 3).collect()
    assert(res.nonEmpty && res.forall(_.getAs[Long]("qid") < 50))
    // rebalance: nothing qualifies at a generous threshold (no-op)
    assert(IvfPqIndex.rebalance(spark, dir, factor = 100.0) == Nil)
  }

  test("traffic rebalance: splits the hot-PROBED cell, leaves the bigger cold cell alone") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_traffic").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, kCells = 8)
    val sizes = IvfPqIndex.cellSizes(spark, dir)
    val coldGiant = sizes.maxBy(_._2)._1
    // pick a mid-size cell (not the biggest) and hammer it: its own
    // members as queries at nProbe=1 route straight back to it
    val hot = sizes.filter { case (c, n) => c != coldGiant && n >= 2 }.maxBy(_._2)._1
    val hotMembers = spark.read.parquet(s"$dir/cells/v1")
      .filter(col("cell") === hot)
      .select(col("vec_id").as("qid"), col("embedding"))
    assert(IvfPqIndex.rebalanceByTraffic(spark, dir) == Nil,
      "no recorded traffic must mean no splits")
    // the serving-tier wrapper answers AND logs in one call
    assert(IvfPqIndex.queryAndRecord(spark, hotMembers, dir, nProbe = 1, topK = 1)
      .collect().nonEmpty, "queryAndRecord must still answer")
    // reset stats for the exact-count check below
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/stats"))
    IvfPqIndex.recordProbes(spark, hotMembers, dir, nProbe = 1)
    assert(IvfPqIndex.probeTraffic(spark, dir) == Map(hot -> sizes(hot)),
      "nProbe=1 self-probes must all route back to the members' own cell")
    val split = IvfPqIndex.rebalanceByTraffic(spark, dir, factor = 2.0)
    assert(split == Seq(hot), s"only the hot-probed cell splits (got $split)")
    val after = IvfPqIndex.cellSizes(spark, dir)
    // the size-based criterion would have gone for the cold giant first
    assert(after.contains(coldGiant) && after(coldGiant) == sizes(coldGiant),
      "the bigger but unprobed cell must be untouched")
    assert(!after.contains(hot), "the hot cell id retires into two halves")
    // retired cell's stats drop out of the live view; halves start at 0
    assert(IvfPqIndex.probeTraffic(spark, dir).isEmpty)
    // and the index still answers
    assert(IvfPqIndex.query(spark, queryBatch, dir, topK = 3).collect().nonEmpty)
  }

  test("probe stats: batchId replays overwrite (no double-count); decay splits the RECENTLY hot cell, not the historical one") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_decay").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, kCells = 8)
    val sizes = IvfPqIndex.cellSizes(spark, dir)
    // two mid-size cells with members to use as self-routing queries
    val candidates = sizes.filter(_._2 >= 2).toSeq.sortBy(-_._2).map(_._1)
    val (histCell, recentCell) = (candidates(0), candidates(1))
    def members(c: Int) = spark.read.parquet(s"$dir/cells/v1")
      .filter(col("cell") === c)
      .select(col("vec_id").as("qid"), col("embedding"))

    // replay idempotency: the same streaming batch id delivered twice
    // must leave the stats as if delivered once
    IvfPqIndex.recordProbes(spark, members(histCell), dir, nProbe = 1, batchId = Some(0L))
    val once = IvfPqIndex.probeTraffic(spark, dir)
    IvfPqIndex.recordProbes(spark, members(histCell), dir, nProbe = 1, batchId = Some(0L))
    assert(IvfPqIndex.probeTraffic(spark, dir) == once,
      "a replayed batchId must overwrite its own stats, not double-count")

    // history: hammer histCell across batches 1..9; then the workload
    // MOVES — recentCell earns batches 10..15
    (1L to 9L).foreach(b =>
      IvfPqIndex.recordProbes(spark, members(histCell), dir, nProbe = 1, batchId = Some(b)))
    (10L to 15L).foreach(b =>
      IvfPqIndex.recordProbes(spark, members(recentCell), dir, nProbe = 1, batchId = Some(b)))
    // undecayed view: history still dominates — histCell is at least
    // as big AND has 10 recorded batches vs 6: the stale-hotspot trap
    val allTime = IvfPqIndex.probeTraffic(spark, dir)
    assert(allTime(histCell).toDouble * sizes(histCell) >
           allTime(recentCell).toDouble * sizes(recentCell),
      s"setup must make the HISTORICAL cell the all-time load winner ($allTime)")
    // decayed rebalance: history sits 6+ ranks behind the newest
    // -> weight <= 2^-6; only the recently hot cell qualifies
    val split = IvfPqIndex.rebalanceByTraffic(spark, dir, factor = 2.0,
      halfLifeBatches = Some(1.0))
    assert(split == Seq(recentCell),
      s"decay must split the recently hot cell only (got $split)")
    assert(IvfPqIndex.cellSizes(spark, dir).contains(histCell),
      "the historically hot but now-cold cell must be untouched")
  }

  test("compactStats: collapses old batch dirs, preserves all-time totals, drops retired cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_statscomp").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, kCells = 8)
    val sizes = IvfPqIndex.cellSizes(spark, dir)
    val cs = sizes.filter(_._2 >= 2).toSeq.sortBy(-_._2).map(_._1)
    val (keep, retire) = (cs(0), cs(1))
    def mem(c: Int) = spark.read.parquet(s"$dir/cells/v1").filter(col("cell") === c)
      .select(col("vec_id").as("qid"), col("embedding"))
    // 20 one-cell batches: `keep` on even ids, `retire` on odd ids
    (0L until 20L).foreach { b =>
      val c = if (b % 2 == 0) keep else retire
      IvfPqIndex.recordProbes(spark, mem(c), dir, nProbe = 1, batchId = Some(b))
    }
    IvfPqIndex.splitCell(spark, dir, retire) // its stats rows become droppable history
    val before = IvfPqIndex.probeTraffic(spark, dir) // live view: keep only
    assert(before.keySet == Set(keep))
    def batchDirs() = new java.io.File(s"$dir/stats/probes").listFiles
      .map(_.getName).filter(_.startsWith("batch="))
    assert(batchDirs().length == 20)
    IvfPqIndex.compactStats(spark, dir, keepRecent = 4)
    // ids 0..15 collapse into batch=0; 16..19 survive as-is
    assert(batchDirs().length == 5,
      s"expected 1 collapsed + 4 recent dirs, got ${batchDirs().toSeq.sorted}")
    assert(IvfPqIndex.probeTraffic(spark, dir) == before,
      "compaction must not change the live traffic view")
    // the collapsed slice physically dropped the retired cell's rows
    val collapsedCells = spark.read.parquet(s"$dir/stats/probes/batch=0")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(collapsedCells == Set(keep),
      s"collapsed history must hold only live cells, got $collapsedCells")
  }

  test("compact: one file per cell in a fresh version; snapshot identical; live prev dir retained") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_compact").toString
    val emb = Tables.embeddings(spark, sf0001)
    IvfPqIndex.build(spark, emb, dir, kCells = 8) // meta v1 -> cells/v1
    // split bumps meta to v2 WITHOUT bumping the cells dir — the case
    // where version-arithmetic GC would wrongly delete the live dir
    val hot = IvfPqIndex.cellSizes(spark, dir).maxBy(_._2)._1
    IvfPqIndex.splitCell(spark, dir, hot)
    // fragment the cells with incremental adds
    (1 to 3).foreach { i =>
      IvfPqIndex.add(spark, emb.filter(col("vec_id") < 30)
        .select((col("vec_id") + i * 1000000L).as("vec_id"), col("embedding")), dir)
    }
    val want = IvfPqIndex.query(spark, queryBatch, dir, topK = 3).collect().toSeq
    val sizesBefore = IvfPqIndex.cellSizes(spark, dir)
    def filesPerCell(v: String) = new java.io.File(s"$dir/cells/$v").listFiles
      .filter(_.getName.startsWith("cell="))
      .map(d => d.listFiles.count(_.getName.endsWith(".parquet")))
    assert(filesPerCell("v1").exists(_ > 1), "adds must have fragmented some cell")
    val reported = IvfPqIndex.compact(spark, dir) // meta v3 -> cells/v3
    assert(reported > sizesBefore.size, s"pre-compact file count $reported must exceed cells")
    val cellVersions = new java.io.File(s"$dir/cells").listFiles
      .map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    assert(cellVersions == Seq("v1", "v3"),
      s"previous LIVE cells dir (v1) must be retained for in-flight readers: $cellVersions")
    val perCell = filesPerCell("v3")
    assert(perCell.nonEmpty && perCell.forall(_ == 1),
      s"one file per cell after compaction: ${perCell.toSeq}")
    assert(IvfPqIndex.cellSizes(spark, dir) == sizesBefore,
      "compaction must not change cell membership")
    assert(IvfPqIndex.query(spark, queryBatch, dir, topK = 3).collect().toSeq == want,
      "compaction must not change answers")
  }

  test("streaming ingest: foreachBatch add fragments cells; compact heals; probes see every streamed vector") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_stream").toString
    IvfPqIndex.build(spark, Tables.embeddings(spark, sf0001), dir, kCells = 8)
    // stream clones of known vectors in: the live-index ingest path a
    // vector pipeline runs (CDC/new-docs -> embed -> add), one
    // incremental add per micro-batch
    val twins = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 6).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cp = java.nio.file.Files.createTempDirectory("ivfpq_stream_cp").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = ms.toDF().toDF("vec_id", "embedding")
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfPqIndex.add(spark, b, dir); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    try {
      twins.grouped(2).foreach { chunk =>
        ms.addData(chunk.map { case (id, e) => (id + 900000L, e) }.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // every streamed clone is its twin's top-1
    val probes = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding"))
    def top1() = IvfPqIndex.query(spark, probes, dir, nProbe = 4, topK = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    val got = top1()
    twins.foreach { case (id, _) =>
      assert(got(id) == id + 900000L, s"streamed clone of $id must be top-1 (got ${got(id)})")
    }
    // per-batch adds fragmented at least one cell; compaction heals the
    // layout without changing any answer
    val reported = IvfPqIndex.compact(spark, dir)
    assert(reported > IvfPqIndex.cellSizes(spark, dir).size,
      "streamed adds must have fragmented the cell files")
    assert(top1() == got, "compaction must not change probe answers")
  }

  test("rebuild: fresh cells version flips atomically with meta; old pair retained then GC'd") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rebuild").toString
    val emb = Tables.embeddings(spark, sf0001)
    IvfPqIndex.build(spark, emb, dir, kCells = 8)
    val want = IvfPqIndex.query(spark, queryBatch, dir, topK = 3).collect().toSeq
    def cellVersions() = new java.io.File(s"$dir/cells").listFiles
      .map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    // rebuild (drift response): codes+codebooks+cells flip together
    IvfPqIndex.build(spark, emb, dir, kCells = 16, seed = 43L)
    assert(cellVersions() == Seq("v1", "v2"),
      "previous cells version must be retained for in-flight readers")
    val res = IvfPqIndex.query(spark, queryBatch, dir, topK = 3).collect()
    assert(res.nonEmpty, "rebuilt index must answer")
    // same build inputs -> same answers regardless of which version
    IvfPqIndex.build(spark, emb, dir, kCells = 8, seed = 42L)
    assert(cellVersions() == Seq("v2", "v3"), "older cells versions are GC'd")
    assert(IvfPqIndex.query(spark, queryBatch, dir, topK = 3).collect().toSeq == want,
      "identical build params must reproduce identical answers after rebuilds")
  }
}
