package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared ANN recall protocol for the probe tools (r18): the planted-
  * query construction and brute-force ground truth that GraphAnnProbe
  * introduced in r16, factored out so the IVF/IVF-PQ probes and the
  * graph-insert probe measure recall under the IDENTICAL protocol —
  * cross-family recall numbers in BASELINE.md are only comparable if
  * the queries and the ground truth are the same.
  *
  * Protocol (the standard ANN-benchmark shape): each query is a
  * corpus vector deterministically perturbed to cos ≈ 0.95 of its
  * source (md5 noise, eps 0.07 on unit vectors), so ground truth
  * contains a real near neighbor and the probe measures NAVIGATION
  * quality, not the no-locality adversarial regime (see
  * GraphAnnProbe's scaladoc for the r16 measurement behind this).
  * Planted qids are offset out of the corpus id space so a self-hit
  * exclusion on shared ids never drops the true answer.
  */
object AnnRecallKit {

  /** Offset that places planted qids outside any corpus id space. */
  val QidOffset = 1000000000000L

  /** Planted queries from `src` (id, vec columns named vec_id /
    * embedding): (qid, embedding) — qid = vec_id + [[QidOffset]],
    * embedding = unit-renormalized (vec + 0.07 · md5-noise).
    */
  def plantedQueries(src: DataFrame): DataFrame =
    src.select((col("vec_id") + lit(QidOffset)).as("qid"), expr(
        """transform(embedding, (x, j) ->
           x + CAST(0.07 * (CAST(conv(substring(md5(concat('gann-q:',
             CAST(vec_id AS STRING), ':', CAST(j AS STRING))), 1, 8), 16, 10) AS DOUBLE)
             / 2147483648.0 - 1.0) AS FLOAT))""").as("_raw"))
      .select(col("qid"), expr(
        "transform(_raw, x -> CAST(x / sqrt(aggregate(_raw, CAST(0.0 AS DOUBLE), (a, v) -> a + v * v)) AS FLOAT))")
        .as("embedding"))

  /** Exact cosine top-k per query by one broadcast pass over the
    * corpus: (wantIds qid → top-k nid set, want1 qid → rank-1 nid).
    * `q` needs (qid, embedding); `e` needs (vec_id, embedding).
    */
  def bruteTopK(spark: SparkSession, q: DataFrame, e: DataFrame,
      k: Int): (Map[Long, Set[Long]], Map[Long, Long]) = {
    graft.functions.FloatVecDot.register(spark)
    val want = broadcast(q.select(col("qid"), col("embedding").as("qvec")))
      .crossJoin(e.select(col("vec_id").as("nid"), col("embedding").as("ne")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), expr("fvec_dot(qvec, ne)").as("cos_sim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("nid"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
    (want.view.mapValues(_.map(_._1)).toMap,
      want.view.mapValues(s => s.minBy(_._2)._1).toMap)
  }

  /** (mean recall@k, min recall@k, recall@1) of `got` vs the brute
    * answer. recall@1 = the TRUE nearest found anywhere in the
    * returned top-k — in plant mode, "did navigation reach the
    * planted source".
    */
  def recall(got: Map[Long, Set[Long]], wantIds: Map[Long, Set[Long]],
      want1: Map[Long, Long]): (Double, Double, Double) = {
    val recalls = wantIds.toSeq.map { case (qid, t) =>
      (got.getOrElse(qid, Set.empty) & t).size.toDouble / t.size }
    val top1 = want1.toSeq.map { case (qid, t1) =>
      if (got.getOrElse(qid, Set.empty).contains(t1)) 1.0 else 0.0 }
    (recalls.sum / recalls.size, recalls.min, top1.sum / top1.size)
  }
}
