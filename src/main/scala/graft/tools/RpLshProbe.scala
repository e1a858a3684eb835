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
  * Two modes, because the probe found the shipped API cannot even
  * RUN at 2M: `approxSimilarityJoin` carries BOTH full rows (features
  * vector + hash vectors, ~1.2 KB/pair) through the exploded
  * candidate join pre-dedup — at 50 queries × 2M vectors that is
  * ~0.7 TB of shuffle, ENOSPC on this box before the first distance
  * is computed. `api` mode measures the shipped operator where it
  * fits (200k); `narrow` mode is the same LSH semantics written the
  * way a 100 TB engine would — ids-only candidate join (explode
  * hashes to (table, bucket, id) postings, equi-join, distinct) with
  * scoring via a broadcast qid→vector map — so the Θ(n)-candidates
  * asymptote is measurable at 2M even though the API is not.
  *
  * Usage: `RpLshProbe [dataDir] [bucketLength] [numTables]
  * [threshold] [batchSizes e.g. 50,200,800] [recallSample]
  * [mode: api|narrow]`
  */
object RpLshProbe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bucketLen = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val numTables = args.lift(2).map(_.toInt).getOrElse(6)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(1.2)
    val batches = args.lift(4).getOrElse("50").split(",").map(_.trim.toInt).toSeq
    val recallSample = args.lift(5).map(_.toInt).getOrElse(0)
    val mode = args.lift(6).getOrElse("api")
    require(Set("api", "narrow")(mode), s"mode must be api|narrow (got $mode)")
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

    // narrow corpus postings (table, bucket, id) — 6n 20-byte rows;
    // the layout a 100 TB implementation would persist
    val postings = hashed
      .select(col("vec_id"), posexplode(col("hashes")).as(Seq("t", "h")))
      .select(col("t"), h0(col("h")).as("b"), col("vec_id")).persist()
    postings.count()

    def queriesArr(nQ: Int) = AnnRecallKit
      .plantedQueries(e.filter(col("vec_id") < nQ))

    def qPostings(qArr: org.apache.spark.sql.DataFrame) = model
      .transform(qArr.select(col("qid"), toVec(col("embedding")).as("features")))
      .select(col("qid"), posexplode(col("hashes")).as(Seq("t", "h")))
      .select(col("qid"), col("t"), h0(col("h")).as("b"))

    // candidate volume: distinct pairs sharing >= 1 bucket — counted
    // narrowly in BOTH modes (the count is mode-independent; the API
    // cannot even materialize it at 2M)
    val candQ = queriesArr(50).localCheckpoint(true)
    val cand = qPostings(candQ).join(postings, Seq("t", "b"))
      .select(col("qid"), col("vec_id")).distinct().count()
    println(f"""{"probe":"rplsh_cand","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"n_queries":50,"cand_pairs":$cand,"cand_per_query":${cand / 50.0}%.0f,"corpus_frac":${cand / 50.0 / n}%.4f}""")

    // shipped-API search: approxSimilarityJoin drags both full rows
    // (features + hash vectors) through the candidate exchange
    def top5Api(qArr: org.apache.spark.sql.DataFrame) =
      model.approxSimilarityJoin(
          qArr.select(col("qid"), toVec(col("embedding")).as("features")),
          hashed, threshold, "euclid_dist")
        .select(col("datasetA.qid").as("qid"),
          col("datasetB.vec_id").as("nid"), col("euclid_dist").as("d"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d"), col("nid"))))
        .filter(col("rn") <= 5)

    // narrow search: ids-only candidate join, scoring via a broadcast
    // qid→vector map (≤ 800 × 64 floats), shuffle stays O(candidates ×
    // 16 B) instead of O(candidates × 1.2 KB). Unit vectors: euclid ≤
    // threshold  ⇔  cos ≥ 1 − threshold²/2; ordering identical.
    def top5Narrow(qArr: org.apache.spark.sql.DataFrame) = {
      val qmap = qArr.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val bq = spark.sparkContext.broadcast(qmap)
      val cosOf = udf((qid: Long, emb: Seq[Float]) => {
        val q = bq.value(qid); var s = 0.0; var i = 0
        while (i < q.length) { s += q(i) * emb(i); i += 1 }; s
      })
      qPostings(qArr).join(postings, Seq("t", "b"))
        .select(col("qid"), col("vec_id").as("nid")).distinct()
        .join(e.select(col("vec_id").as("nid"), col("embedding")), "nid")
        .select(col("qid"), col("nid"), cosOf(col("qid"), col("embedding")).as("cos"))
        .filter(col("cos") >= lit(1.0 - threshold * threshold / 2))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))))
        .filter(col("rn") <= 5)
    }

    def search(qArr: org.apache.spark.sql.DataFrame) =
      if (mode == "api") top5Api(qArr) else top5Narrow(qArr)

    for (nQ <- batches) {
      val q = queriesArr(nQ).localCheckpoint(true)
      val reps = (1 to 3).map { _ =>
        val p0 = System.nanoTime()
        search(q).count()
        (System.nanoTime() - p0) / 1e9
      }
      println(f"""{"probe":"rplsh_batch","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"threshold":$threshold,"mode":"$mode","n_queries":$nQ,"probe_sec_min3":${reps.min}%.3f,"per_query_ms":${reps.min * 1000 / nQ}%.2f,"probe_reps":[${reps.map(t => f"$t%.3f").mkString(",")}]}""")
    }

    if (recallSample > 0) {
      val qPlant = queriesArr(recallSample).localCheckpoint(true)
      val got = search(qPlant)
        .select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val (wantIds, want1) = AnnRecallKit.bruteTopK(spark, qPlant, e, 5)
      val (mean, mn, r1) = AnnRecallKit.recall(got, wantIds, want1)
      println(f"""{"probe":"rplsh_recall","data":"$dataDir","n_vectors":$n,"bucket_len":$bucketLen,"tables":$numTables,"threshold":$threshold,"mode":"$mode","sample":$recallSample,"k":5,"mean_recall":$mean%.4f,"min_recall":$mn%.4f,"recall_at_1":$r1%.4f}""")
    }
    spark.stop()
  }
}
