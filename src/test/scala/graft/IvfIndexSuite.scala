package graft

import org.apache.spark.sql.functions._
import graft.api.IvfIndex
import graft.queries.LlmPipeline

/** Persisted IVF index lifecycle: build → probe-pruned query → grow
  * without retrain. The partition-pruning assertion is the 100 TB
  * claim: a probe must SKIP unprobed cell directories, not scan the
  * corpus.
  */
class IvfIndexSuite extends GraftSuite {

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    IvfIndex.build(spark, Tables.embeddings(spark, sf0001), dir, k = 16, seed = 42L)
    dir
  }

  private def queryBatch = Tables.embeddings(spark, sf0001)
    .filter(col("vec_id") < 50)
    .select(col("vec_id").as("qid"), col("embedding"))

  test("build + query: recall@5 >= 0.5 vs exact cosine top-k (4/16 cells probed)") {
    val exact = LlmPipeline.qSimCosineTopk(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = IvfIndex.query(spark, queryBatch, indexDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      ann.get(q).map(got => got.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"mean recall@5 $mean%.2f (probing 4/16 cells; random ~0.25)")
  }

  test("query scan is partition-pruned to the probed cells (dynamic pruning on cell)") {
    val plan = IvfIndex.query(spark, queryBatch, indexDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"corpus scan must carry a dynamic partition-pruning filter on cell:\n$plan")
  }

  test("large-batch path: shuffled cell join (no broadcast) returns identical results") {
    val want = IvfIndex.query(spark, queryBatch, indexDir).collect().toSeq
    // force the regime a too-big-to-broadcast batch lands in: hint off
    // AND AQE/static broadcast planning disabled
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dfq = IvfIndex.query(spark, queryBatch, indexDir, broadcastQueries = false)
      val plan = dfq.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"non-broadcast path must plan a shuffled cell join:\n$plan")
      assert(dfq.collect().toSeq == want,
        "shuffled-join probe must return exactly the broadcast-path results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("splitCell/rebalance: hot cell splits in place — no vector lost, probes rerouted, O(one cell)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_split").toString
    IvfIndex.build(spark, Tables.embeddings(spark, sf0001), dir, k = 8, seed = 42L)
    val before = IvfIndex.cellSizes(spark, dir)
    val allIds = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val hot = before.maxBy(_._2)._1
    IvfIndex.splitCell(spark, dir, hot)
    val after = IvfIndex.cellSizes(spark, dir)
    // the hot cell is gone, replaced by exactly two fresh-id cells
    assert(!after.contains(hot), "retired cell id must vanish")
    assert(after.size == before.size + 1)
    val fresh = after.keySet diff before.keySet
    assert(fresh.size == 2 && fresh.forall(_ > before.keys.max))
    assert(fresh.toSeq.map(after).sum == before(hot), "split conserves the cell's vectors")
    // no vector lost or duplicated across the whole index
    val idsAfter = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").collect().map(_.getLong(0))
    assert(idsAfter.length == allIds.size && idsAfter.toSet == allIds)
    // centroid table routes consistently: every corpus row sits in its
    // own nearest cell's list often enough for queries to still work
    val probes = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding"))
    val res = IvfIndex.query(spark, probes, dir, nProbe = 3, topK = 3).collect()
    assert(res.nonEmpty && res.forall(_.getAs[Long]("qid") < 20))
    // versioned centroid publish: the split committed v2; v1 is
    // retained for in-flight readers (old delete-then-write overwrite
    // had a window with NO readable quantizer)
    val cvs = new java.io.File(s"$dir/centroids").listFiles
      .map(_.getName).filter(_.matches("v\\d+")).sorted
    assert(cvs.toSeq == Seq("v1", "v2"), s"centroid versions: ${cvs.toSeq}")
    // rebalance: nothing qualifies at a generous threshold (no-op)
    assert(IvfIndex.rebalance(spark, dir, factor = 100.0) == Nil)
  }

  test("add: new vectors join the index without retraining and are findable") {
    // own index dir: mutating the shared one would make the recall
    // and pruning tests order-dependent
    val indexDir = java.nio.file.Files.createTempDirectory("ivf_add").toString
    IvfIndex.build(spark, Tables.embeddings(spark, sf0001), indexDir, k = 16, seed = 42L)
    // clone 3 corpus vectors under fresh ids — their nearest neighbor
    // is their twin at cos ~1.0, so top-1 must find them
    val clones = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(100L, 200L, 300L))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    IvfIndex.add(spark, clones, indexDir)
    val probes = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(100L, 200L, 300L))
      .select(col("vec_id").as("qid"), col("embedding"))
    val top1 = IvfIndex.query(spark, probes, indexDir, nProbe = 4, topK = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    Seq(100L, 200L, 300L).foreach { id =>
      assert(top1(id) == id + 100000L,
        s"clone of $id must be its own top-1 after add (got ${top1(id)})")
    }
  }

  test("defaultCells: ~sqrt(n) with floor 16 and cap 65536 (r18 probe-measured sizing)") {
    // the r18 IVF probe measured the fixed-16 trap at 2M (probe cost
    // ~ n/16 per query, 130 ms/q) vs sqrt(n) cells (3.7 ms/q, recall
    // 0.99 at nProbe 16) — these pins keep the sizing rule honest
    assert(IvfIndex.defaultCells(500) == 22)
    assert(IvfIndex.defaultCells(100) == 16) // floor
    assert(IvfIndex.defaultCells(200000) == 447)
    assert(IvfIndex.defaultCells(2000000) == 1414)
    assert(IvfIndex.defaultCells(8L * 1000 * 1000 * 1000 * 1000) == 65536) // cap
  }

  test("auto cell count (k = 0): build sizes to defaultCells clamped by the train sample; query works") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_auto").toString
    IvfIndex.build(spark, Tables.embeddings(spark, sf0001), dir, seed = 42L)
    val n = Tables.embeddings(spark, sf0001).count()
    // kEff == defaultCells(n) cells trained (fixture is small enough
    // that every cell is non-degenerate but KMeans may leave a cell
    // empty — sizes counts non-empty cells only)
    val sizes = IvfIndex.cellSizes(spark, dir)
    assert(sizes.size <= IvfIndex.defaultCells(n) && sizes.size >= 2,
      s"expected <= ${IvfIndex.defaultCells(n)} non-empty cells, got ${sizes.size}")
    assert(sizes.values.sum == n, "every vector must land in exactly one cell")
    val probes = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = IvfIndex.query(spark, probes, dir, nProbe = 4, topK = 3).collect()
    assert(got.length > 0, "auto-sized index must answer queries")
  }
}
