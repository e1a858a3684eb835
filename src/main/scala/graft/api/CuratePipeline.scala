package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.{MinHashDf, PipelineExtras}

/** End-to-end training-data curation: the §2B pipeline operators
  * composed the way a data team actually chains them. Input: the raw
  * `documents` table. Stages (each one a §2B-graded operator re-used,
  * not re-implemented):
  *
  *   1. quality gate    — length score ≥ minLenScore (q_text_quality's
  *                        scoring);
  *   2. exact dedup     — md5 groups, keep the exemplar (min doc_id)
  *                        of every duplicate cluster (q_dedup_exact_docs);
  *   3. fuzzy dedup     — MinHash band-join pairs (q_dedup_minhash_df's
  *                        pipeline); of each near-dup pair keep the
  *                        lower doc_id (greedy: dropping every doc that
  *                        is the HIGHER id of any pair keeps exactly
  *                        the cluster minima for transitive clusters);
  *   4. decontaminate   — drop docs sharing ≥ 3 distinct 5-gram
  *                        shingles with the eval set (q_decontaminate);
  *   5. mixture sample  — deterministic hash-gated per-source rates
  *                        (q_sample_mix's rule).
  *
  * Every stage is deterministic, so the curated set is reproducible
  * bit-for-bit across runs and engines — the property that matters
  * when the output feeds a training run. All stages are linear-pass /
  * bucketed (no all-pairs anywhere), so the composition inherits the
  * per-operator 100 TB shapes.
  */
object CuratePipeline {

  final case class Report(input: Long, afterQuality: Long, afterExactDedup: Long,
      afterFuzzyDedup: Long, afterDecontaminate: Long, curated: Long)

  def curate(spark: SparkSession, dir: String,
      minLenScore: Double = 0.2): (DataFrame, Report) = {
    val docs = Tables.documents(spark, dir).cache()
    val input = docs.count()

    // 1. quality gate (same scoring as q_text_quality's len_score)
    val quality = docs.filter(
      round(least(col("n_chars").cast("double") / 500.0, lit(1.0)), 6) >= minLenScore)
    val nQuality = quality.count()

    // 2. exact dedup: keep min doc_id per text hash
    val exemplars = quality
      .groupBy(md5(col("text")).as("_h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = quality.join(exemplars, "doc_id")
    val nExact = exact.count()

    // 3. fuzzy dedup: MinHash band-join pairs; drop the higher id of
    // every near-dup pair (keeps each cluster's minimum)
    val fuzzyPairs = MinHashDf.qDedupMinhashDf(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val fuzzy = exact.join(fuzzyPairs, Seq("doc_id"), "left_anti")
    val nFuzzy = fuzzy.count()

    // 4. decontamination vs the eval set
    val contaminated = PipelineExtras.qDecontaminate(spark, dir)
      .select(col("train_doc").as("doc_id")).distinct()
    val clean = fuzzy.join(contaminated, Seq("doc_id"), "left_anti")
    val nClean = clean.count()

    // 5. deterministic mixture sampling (q_sample_mix's rule)
    val h4 = (c: String) => s"CAST(conv(substring(md5($c), 1, 4), 16, 10) AS BIGINT)"
    val curated = clean.filter(
      expr(s"${h4("CAST(doc_id AS STRING)")} % 100 < 10 + ${h4("source")} % 80"))
    val nCurated = curated.count()

    (curated.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id"),
      Report(input, nQuality, nExact, nFuzzy, nClean, nCurated))
  }
}
