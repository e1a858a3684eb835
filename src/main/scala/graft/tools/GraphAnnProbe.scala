package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.NeighborGraphAnn

/** Probe-only latency record for the persisted neighbor-graph ANN
  * (VERDICT r13 Next-round #4): builds + [[NeighborGraphAnn.save]]s
  * the index for a data dir ONCE (timed separately), then times
  * [[NeighborGraphAnn.topKLoaded]] min-of-3 — so BASELINE.md can
  * grade the QUERY cost of the graph family apart from its build,
  * exactly like IvfPqIndex's persisted probes.
  *
  * Usage: `runMain graft.tools.GraphAnnProbe [dataDir] [indexDir] [nQueries]`
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val indexDir = args.lift(1).getOrElse("/tmp/graft_gann_probe")
    val nQ = args.lift(2).map(_.toInt).getOrElse(50)
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
    val q = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint(true) // query-set prep is not probe cost
    // Decomposition baseline (r15, VERDICT r14 #3): one bare scan of
    // the two persisted index tables — the irreducible I/O floor a
    // probe must pay at least once. probe_sec near scan_sec ⇒ the
    // search joins are cheap and the cost is the index read; probe
    // growing like N× scan_sec ⇒ the hops are re-scanning.
    val (edges, vecs) = NeighborGraphAnn.load(spark, indexDir)
    val s0 = System.nanoTime()
    edges.count(); vecs.count()
    val scanSec = (System.nanoTime() - s0) / 1e9
    val probes = (1 to 3).map { _ =>
      val p0 = System.nanoTime()
      NeighborGraphAnn.topKLoaded(spark, indexDir, q, k = 5).count()
      val t = (System.nanoTime() - p0) / 1e9
      spark.catalog.clearCache()
      t
    }
    println(f"""{"probe":"graph_ann","data":"$dataDir","n_vectors":$n,"n_queries":$nQ,"build_save_sec":$buildSec%.3f,"scan_sec":$scanSec%.3f,"probe_sec_min3":${probes.min}%.3f,"probe_reps":[${probes.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
