package graft.tools

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for the RP-LSH ANN row (#55 `q_sim_lsh_ann`) — the
  * last ANN family member whose numbers rested on the 5k-vector
  * fixture after the r17/r18 graph-ANN and IVF probes (VERDICT r17
  * grouped "RP-LSH / IVF / IVF-PQ" in one fixture-scale-only row;
  * r18 measured the IVF half).
  *
  * The quantity under suspicion is CANDIDATE VOLUME, not recall:
  * Spark ML's `BucketedRandomProjectionLSH` amplifies OR-only across
  * `numHashTables` single-projection tables (a hash is one scalar
  * per table — there is no AND stage), so for any bucketLength wide
  * enough to retain neighbors, the per-table collision probability
  * against NON-neighbors is a corpus-independent constant p ≈
  * O(bucketLength / interClusterDist) and the candidate set per
  * query is ≈ (1-(1-p)^T) · n — Θ(n). That is a threshold
  * similarity JOIN cost model (where output genuinely is all pairs),
  * not a sub-linear ANN serving path; this probe measures whether
  * the shipped fixture params (bucketLength 0.5, 6 tables, threshold
  * 1.2 — `queries/LlmPipeline.scala` #55) behave as Θ(n) across the
  * 200k → 2M decade and what recall buys the collision volume.
  *
  * Protocol identical to IvfProbe/GraphAnnProbe ([[AnnRecallKit]]):
  * planted queries at cos ≈ 0.95, brute-force ground truth, same
  * clustered corpora — cross-family numbers in BASELINE.md stay
  * comparable. Corpus hashing is graded as index build (transform +
  * persist + count, timed); per-batch cost is the
  * `approxSimilarityJoin` + per-query top-5, min-of-3.
  *
  * Usage: `RpLshProbe [dataDir] [bucketLength] [numTables]
  * [threshold] [batchSizes e.g. 50,200,800] [recallSample]`
  */
object RpLshProbe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bucketLen = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val numTables = args.lift(2).map(_.toInt).getOrElse(6)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(1.2)
    val batches = args.lift(4).getOrElse("50").split(",").map(_.trim.toInt).toSeq
    val recallSample = args.lift(5).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val e = spark.read.parquet(s"$dataDir/embeddings.parquet")
    val n = e.count()
    val corpus = e.select(col("vec_id"), toVec(col("embedding")).as("features"))

    // "build": fit the projections and hash the whole corpus once —
    // the serving-path analogue of writing an index
    val t0 = System.nanoTime()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLen).setNumHashTables(numTables).setSeed(42L)
    val model = lsh.fit(corpus)
    val hashed = model.transform(corpus).persist()
    hashed.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    // occupancy of the most loaded (table, bucket): the collision
    // hot-spot a query falling there must scan
    // each table's hash is a 1-element ml Vector (UDT — no SQL extract)
    val h0 = udf((v: org.apache.spark.ml.linalg.Vector) => v(0))
    val occ = hashed
      .select(posexplode(col("hashes")).as(Seq("t", "h")))
      .select(col("t"), h0(col("h")).as("b"))
      .groupBy("t", "b").count()
      .agg(max("count").as("mx"), expr("percentile(count, 0.5)").as("med"))
      .collect()(0)
    println(f"""{"probe":"rplsh_build","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"build_sec":$buildSec%.3f,"max_bucket":${occ.getLong(0)},"median_bucket":${occ.getDouble(1)}%.0f}""")

    def queriesOf(nQ: Int) = AnnRecallKit
      .plantedQueries(e.filter(col("vec_id") < nQ))
      .select(col("qid"), toVec(col("embedding")).as("features"))

    // candidate volume: pairs sharing >= 1 bucket, distance filter
    // disabled (threshold 4 > max euclid 2 on unit vectors) — the
    // work the join cannot avoid doing, per query
    val candQ = queriesOf(50).localCheckpoint(true)
    val cand = model.approxSimilarityJoin(candQ, hashed, 4.0, "d")
      .select(col("datasetA.qid")).count()
    println(f"""{"probe":"rplsh_cand","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"n_queries":50,"cand_pairs":$cand,"cand_per_query":${cand / 50.0}%.0f,"corpus_frac":${cand / 50.0 / n}%.4f}""")

    def top5(q: org.apache.spark.sql.DataFrame) =
      model.approxSimilarityJoin(q, hashed, threshold, "euclid_dist")
        .select(col("datasetA.qid").as("qid"),
          col("datasetB.vec_id").as("nid"), col("euclid_dist"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("euclid_dist"), col("nid"))))
        .filter(col("rn") <= 5)

    for (nQ <- batches) {
      val q = queriesOf(nQ).localCheckpoint(true)
      val reps = (1 to 3).map { _ =>
        val p0 = System.nanoTime()
        top5(q).count()
        (System.nanoTime() - p0) / 1e9
      }
      println(f"""{"probe":"rplsh_batch","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"threshold":$threshold,"n_queries":$nQ,"probe_sec_min3":${reps.min}%.3f,"per_query_ms":${reps.min * 1000 / nQ}%.2f,"probe_reps":[${reps.map(t => f"$t%.3f").mkString(",")}]}""")
    }

    if (recallSample > 0) {
      val qPlant = AnnRecallKit.plantedQueries(e.filter(col("vec_id") < recallSample))
        .localCheckpoint(true)
      val got = top5(qPlant.select(col("qid"), toVec(col("embedding")).as("features")))
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val (wantIds, want1) = AnnRecallKit.bruteTopK(spark, qPlant, e, 5)
      val (mean, mn, r1) = AnnRecallKit.recall(got, wantIds, want1)
      println(f"""{"probe":"rplsh_recall","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"threshold":$threshold,"sample":$recallSample,"k":5,"mode":"plant","mean_recall":$mean%.4f,"min_recall":$mn%.4f,"recall_at_1":$r1%.4f}""")
    }
    spark.stop()
  }
}
