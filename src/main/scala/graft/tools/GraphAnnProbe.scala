package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.NeighborGraphAnn

/** Probe-only latency record for the persisted neighbor-graph ANN
  * (VERDICT r13 Next-round #4): builds + [[NeighborGraphAnn.save]]s
  * the index for a data dir ONCE (timed separately), then times
  * [[NeighborGraphAnn.topKLoaded]] min-of-3 per QUERY-BATCH SIZE —
  * so BASELINE.md can grade the QUERY cost of the graph family apart
  * from its build, exactly like IvfPqIndex's persisted probes.
  *
  * r16 (VERDICT r15 Next-round #3) adds the two claims the r15 fix
  * left asserted-not-measured:
  *  - **batch amortization**: `nQueries` takes a comma list
  *    (e.g. 50,200,800) and each size is timed separately — the beam
  *    search is (hops + 2) join ROUNDS whose per-round latency is
  *    dominated by the index-side materialization, so per-query cost
  *    should fall ~linearly with batch size until beam·deg·batch rows
  *    rival the index itself.
  *  - **recall vs brute force at scale**: `recallSample > 0` computes
  *    exact top-k for that many sampled queries (one broadcast
  *    crossJoin pass over the corpus — 50 queries × n vectors of
  *    fvec_dot) and reports mean recall@k of the graph answers, so
  *    the suite's fixture-scale floor (0.85) gets a measured sf10
  *    counterpart.
  *
  * Usage: `runMain graft.tools.GraphAnnProbe [dataDir] [indexDir]
  * [nQueries[,nQueries...]] [recallSample]`
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val indexDir = args.lift(1).getOrElse("/tmp/graft_gann_probe")
    val batches = args.lift(2).getOrElse("50").split(",").map(_.trim.toInt).toSeq
    val recallSample = args.lift(3).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m") // fixture-scale splits (see Bench)
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dataDir/embeddings.parquet")
    val n = e.count()
    val t0 = System.nanoTime()
    val graph = NeighborGraphAnn.build(spark, e, "vec_id", "embedding")
    NeighborGraphAnn.save(spark, indexDir, graph, e, "vec_id", "embedding")
    val buildSec = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    // Decomposition baseline (r15, VERDICT r14 #3): one bare scan of
    // the two persisted index tables — the irreducible I/O floor a
    // probe must pay at least once. probe_sec near scan_sec ⇒ the
    // search joins are cheap and the cost is the index read; probe
    // growing like N× scan_sec ⇒ the hops are re-scanning.
    val (edges, vecs) = NeighborGraphAnn.load(spark, indexDir)
    val s0 = System.nanoTime()
    edges.count(); vecs.count()
    val scanSec = (System.nanoTime() - s0) / 1e9
    println(f"""{"probe":"graph_ann","data":"$dataDir","n_vectors":$n,"build_save_sec":$buildSec%.3f,"scan_sec":$scanSec%.3f}""")
    for (nQ <- batches) {
      val q = e.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .localCheckpoint(true) // query-set prep is not probe cost
      val probes = (1 to 3).map { _ =>
        val p0 = System.nanoTime()
        NeighborGraphAnn.topKLoaded(spark, indexDir, q, k = 5).count()
        val t = (System.nanoTime() - p0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"""{"probe":"graph_ann_batch","data":"$dataDir","n_vectors":$n,"n_queries":$nQ,"probe_sec_min3":${probes.min}%.3f,"per_query_ms":${probes.min * 1000 / nQ}%.2f,"probe_reps":[${probes.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    if (recallSample > 0) {
      graft.functions.FloatVecDot.register(spark)
      val k = 5
      val q = e.filter(col("vec_id") < recallSample)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .localCheckpoint(true)
      val got = NeighborGraphAnn.topKLoaded(spark, indexDir, q, k = k)
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      // exact top-k: one broadcast pass over the corpus
      val want = broadcast(q)
        .crossJoin(e.select(col("vec_id").as("nid"), col("embedding").as("ne")))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          expr("fvec_dot(qvec, ne)").as("cos_sim"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("cos_sim").desc, col("nid"))))
        .filter(col("rn") <= k)
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recalls = want.toSeq.map { case (qid, t) =>
        (got.getOrElse(qid, Set.empty) & t).size.toDouble / t.size }
      val mean = recalls.sum / recalls.size
      println(f"""{"probe":"graph_ann_recall","data":"$dataDir","n_vectors":$n,"sample":$recallSample,"k":$k,"mean_recall":$mean%.4f,"min_recall":${recalls.min}%.4f}""")
    }
    spark.stop()
  }
}
