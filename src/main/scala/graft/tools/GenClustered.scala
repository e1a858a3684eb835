package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clustered synthetic embedding corpus for ANN scale-recall
  * measurement (r16).
  *
  * Why it exists: the driver fixture's embeddings are iid-random unit
  * vectors — measured this round, the ENTIRE sf0.1 base corpus has
  * ZERO pairs above cosine 0.7, so an ANN query's true neighbors are
  * noise maxima at cos ≈ 0.5 with no gradient field around them. In
  * that regime graph navigation is structurally equivalent to blind
  * exploration (P(hit) ≈ nodes-explored / n — measured: recall@1 0.16
  * at defaults, 0.42 at triple cost, at 200k vectors), and NO
  * sublinear method can do better; the regime measures the data, not
  * the index. Real embedding corpora are the opposite: semantic
  * manifolds, i.e. clusters. On a clustered corpus the effective
  * navigation space is the CLUSTER count (beam search only has to
  * find the right cluster; within-cluster gradients are steep), which
  * is why graph ANN works in production and why this generator is the
  * honest scale-recall fixture.
  *
  * Shape: `nClusters` md5-derived unit centroids; each cluster gets
  * `perCluster` members = normalize(centroid + spread · noise), all
  * deterministic closed-form md5 arithmetic (no RNG object). spread
  * 0.35 ⇒ within-cluster cos ≈ 0.8–0.9, cross-cluster ≈ 0.0–0.3 —
  * clearly separated but not degenerate.
  *
  * Usage: `GenClustered <outDir> [nClusters] [perCluster] [dim]`
  * writes `<outDir>/embeddings.parquet` (vec_id, embedding) — the
  * layout GraphAnnProbe expects.
  */
object GenClustered {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/graft_clustered")
    val nClusters = args.lift(1).map(_.toInt).getOrElse(2000)
    val perCluster = args.lift(2).map(_.toInt).getOrElse(100)
    val dim = args.lift(3).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // u(tag) ∈ [-1, 1): 32-bit md5 prefix of the tag, affine-mapped
    def u(tag: String) =
      s"(CAST(conv(substring(md5($tag), 1, 8), 16, 10) AS DOUBLE) / 2147483648.0 - 1.0)"
    val cent = u("concat('gc-c:', CAST(cid AS STRING), ':', CAST(j AS STRING))")
    val noise = u("concat('gc-m:', CAST(vec_id AS STRING), ':', CAST(j AS STRING))")
    val df = spark.range(nClusters.toLong * perCluster)
      .select(col("id").as("vec_id"), (col("id") % nClusters).as("cid"))
      .repartition(32)
      .withColumn("_raw", expr(
        s"transform(sequence(0, $dim - 1), j -> $cent + 0.35 * $noise)"))
      .withColumn("embedding", expr(
        "transform(_raw, x -> CAST(x / sqrt(aggregate(_raw, CAST(0.0 AS DOUBLE), (a, v) -> a + v * v)) AS FLOAT))"))
      .select(col("vec_id"), col("embedding"))
    df.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"GenClustered: ${nClusters}x$perCluster dim=$dim -> $out")
    spark.stop()
  }
}
