package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.NeighborGraphAnn

/** Incremental-insert probe for the neighbor-graph ANN (VERDICT r17
  * Next-round #4): the batched [[NeighborGraphAnn.insert]] (beam-wire
  * + mirror + degree re-cap) was suite-pinned at fixture scale only;
  * this measures it at 200k/2M — insert a fresh batch into the
  * persisted base index, then compare wall cost AND planted recall@5
  * against rebuild-from-scratch on the grown corpus. Done = insert
  * recall within binomial noise of the rebuilt index at a fraction of
  * the rebuild wall.
  *
  * Corpus contract: `dataDir/embeddings.parquet` holds the GROWN
  * corpus; vec_id < baseN is the base (identical rows to a
  * GenClustered run of baseN — membership noise is keyed on vec_id
  * alone), vec_id >= baseN is the insert batch (new members of the
  * same cluster field, the realistic growth shape).
  *
  * Recall queries are planted ([[AnnRecallKit]]) half from the base
  * ids and half from the INSERTED ids — the inserted vectors must be
  * findable (mirrored edges + overlay membership), not merely
  * present, and ground truth is brute force over the grown corpus.
  *
  * Usage: `runMain graft.tools.GannInsertProbe [dataDir] [baseN]
  * [workDir] [recallSample]`
  * Env: `GRAFT_GANN_REUSE=1` skips base-build / insert / rebuild legs
  * whose index dirs already hold a committed current-format version
  * (crash-resume for the 2M run, where the base build alone is
  * ~20 min).
  */
object GannInsertProbe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.lift(0).getOrElse("/tmp/graft_clustered")
    val baseN = args.lift(1).map(_.toLong).getOrElse(200000L)
    val workDir = args.lift(2).getOrElse("/tmp/graft_gann_insert")
    val recallSample = args.lift(3).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reuse = sys.env.get("GRAFT_GANN_REUSE").contains("1")
    val full = spark.read.parquet(s"$dataDir/embeddings.parquet")
    val base = full.filter(col("vec_id") < baseN)
    val batch = full.filter(col("vec_id") >= baseN)
    val nFull = full.count()
    val nBatch = nFull - baseN
    val baseIdx = s"$workDir/base"
    val insIdx = s"$workDir/inserted"
    val rebIdx = s"$workDir/rebuilt"

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- leg 1: base index ------------------------------------------------
    val (_, baseSec) = timed {
      if (!(reuse && NeighborGraphAnn.hasIndex(spark, baseIdx))) {
        val g = NeighborGraphAnn.build(spark, base, "vec_id", "embedding")
        NeighborGraphAnn.save(spark, baseIdx, g, base, "vec_id", "embedding")
      }
    }
    spark.catalog.clearCache()
    println(f"""{"probe":"gann_insert_base","data":"$dataDir","n_base":$baseN,"build_save_sec":$baseSec%.3f}""")

    // ---- leg 2: insert the batch into the persisted base ------------------
    val (_, insSec) = timed {
      if (!(reuse && NeighborGraphAnn.hasIndex(spark, insIdx))) {
        val (edges, vecs) = NeighborGraphAnn.load(spark, baseIdx)
        val newVecs = batch.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val grown = NeighborGraphAnn.insert(spark, edges, vecs, "id", "vec", newVecs)
        NeighborGraphAnn.save(spark, insIdx, grown,
          vecs.unionByName(newVecs), "id", "vec")
      }
    }
    spark.catalog.clearCache()
    println(f"""{"probe":"gann_insert_batch","data":"$dataDir","n_base":$baseN,"n_inserted":$nBatch,"insert_save_sec":$insSec%.3f}""")

    // ---- leg 3: rebuild from scratch on the grown corpus ------------------
    val (_, rebSec) = timed {
      if (!(reuse && NeighborGraphAnn.hasIndex(spark, rebIdx))) {
        val g = NeighborGraphAnn.build(spark, full, "vec_id", "embedding")
        NeighborGraphAnn.save(spark, rebIdx, g, full, "vec_id", "embedding")
      }
    }
    spark.catalog.clearCache()
    println(f"""{"probe":"gann_rebuild_full","data":"$dataDir","n_full":$nFull,"build_save_sec":$rebSec%.3f}""")

    // ---- recall: identical planted queries against both indexes -----------
    // half from base ids, half from inserted ids — a floor(half) from
    // each side; ground truth is the grown corpus
    val half = recallSample / 2
    val qSrc = base.filter(col("vec_id") < half)
      .unionByName(batch.filter(col("vec_id") < baseN + (recallSample - half)))
    val q = AnnRecallKit.plantedQueries(qSrc)
      .select(col("qid"), col("embedding").as("qvec"))
      .localCheckpoint(true)
    val (wantIds, want1) = AnnRecallKit.bruteTopK(spark,
      q.select(col("qid"), col("qvec").as("embedding")), full, 5)
    for ((name, idx) <- Seq("inserted" -> insIdx, "rebuilt" -> rebIdx)) {
      val got = NeighborGraphAnn.topKLoaded(spark, idx, q, k = 5,
          hops = NeighborGraphAnn.defaultHops(nFull))
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val (mean, min, r1) = AnnRecallKit.recall(got, wantIds, want1)
      spark.catalog.clearCache()
      println(f"""{"probe":"gann_insert_recall","index":"$name","data":"$dataDir","n_full":$nFull,"n_inserted":$nBatch,"sample":$recallSample,"k":5,"mode":"plant","mean_recall":$mean%.4f,"min_recall":$min%.4f,"recall_at_1":$r1%.4f}""")
    }
    spark.stop()
  }
}
