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
  *                        pipeline); default greedy policy keeps every
  *                        doc that is never the HIGHER id of a pair
  *                        (drops directly-dominated docs; chain-middle
  *                        docs can survive), `transitiveFuzzy = true`
  *                        keeps exactly one exemplar per connected
  *                        near-dup cluster via [[DedupClusters]];
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

  /** One-pass execution: every stage contributes a per-doc survival
    * FLAG to a single annotated plan, and the whole Report is ONE
    * aggregate over it — six conditional counts in one action — where
    * the naive fold-of-filters pays six `count()` actions each
    * re-executing its whole upstream lineage (O(stages²) recompute).
    * The flagged frame is cached so the returned curated DataFrame
    * reuses the same computed flags instead of re-deriving them.
    */
  def curate(spark: SparkSession, dir: String,
      minLenScore: Double = 0.2,
      maxRepetition: Option[Double] = None,
      transitiveFuzzy: Boolean = false): (DataFrame, Report) = {
    val docs = Tables.documents(spark, dir)

    // 1. quality gate: length score (q_text_quality's len_score),
    // optionally AND the q_text_repetition looping-text rule
    // (max_gram_frac <= maxRepetition) — joined in as a per-doc flag
    // so the one-pass Report shape is preserved
    val lenPred =
      round(least(col("n_chars").cast("double") / 500.0, lit(1.0)), 6) >= minLenScore
    val qualityPred = maxRepetition match {
      case None => lenPred
      case Some(_) => lenPred && coalesce(col("_rep_ok"), lit(true))
    }
    val repFlag = maxRepetition.map { cap =>
      PipelineExtras.repetitionStats(docs)
        .select(col("doc_id"), (col("max_gram_frac") <= cap).as("_rep_ok"))
        .cache() // joined twice (exemplars + flagged): the 2-gram
                 // explode+agg subtree must not execute per join
    }
    def withRepFlag(d: DataFrame): DataFrame =
      repFlag.fold(d)(f => d.join(f, Seq("doc_id"), "left"))

    // 2. exact dedup: exemplar ids = min doc_id per text hash AMONG
    // quality survivors (stage predicates compose sequentially)
    val exemplars = withRepFlag(docs).filter(qualityPred)
      .groupBy(md5(col("text")).as("_h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("_ex"))

    // 3. fuzzy dedup drop set from the MinHash band-join pairs.
    // Default (greedy): drop every doc that is the HIGHER id of any
    // pair — i.e. every directly-dominated doc. NOTE this is not full
    // transitive clustering: in a chain 1–5, 3–5 the doc 3 survives
    // greedy although it is transitively a near-dup of 1.
    // `transitiveFuzzy` switches to connected-component clusters
    // (DedupClusters) and keeps exactly one exemplar — the minimum —
    // per cluster.
    val fuzzyPairs = MinHashDf.qDedupMinhashDf(spark, dir)
    val clusterLabels =
      if (transitiveFuzzy) Some(DedupClusters.assign(fuzzyPairs)) else None
    val fuzzyDrop = clusterLabels.fold(
        fuzzyPairs.select(col("doc_b").as("doc_id")).distinct())(labels =>
        labels.filter(col("doc_id") =!= col("cluster")).select(col("doc_id")))
      .select(col("doc_id"), lit(true).as("_fz"))

    // 4. decontamination drop set vs the eval set
    val contaminated = PipelineExtras.qDecontaminate(spark, dir)
      .select(col("train_doc").as("doc_id")).distinct()
      .select(col("doc_id"), lit(true).as("_ct"))

    // 5. deterministic mixture sampling (q_sample_mix's rule)
    val h4 = (c: String) => s"CAST(conv(substring(md5($c), 1, 4), 16, 10) AS BIGINT)"
    val mixPred = expr(s"${h4("CAST(doc_id AS STRING)")} % 100 < 10 + ${h4("source")} % 80")

    val flagged = withRepFlag(docs)
      .join(exemplars, Seq("doc_id"), "left")
      .join(fuzzyDrop, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("_q", qualityPred)
      .withColumn("_e", col("_q") && coalesce(col("_ex"), lit(false)))
      .withColumn("_f", col("_e") && !coalesce(col("_fz"), lit(false)))
      .withColumn("_c", col("_f") && !coalesce(col("_ct"), lit(false)))
      .withColumn("_s", col("_c") && mixPred)
      .cache()

    def surv(c: String) = count(when(col(c), 1)).as(c)
    val r = flagged.agg(count(lit(1)).as("_n"),
      surv("_q"), surv("_e"), surv("_f"), surv("_c"), surv("_s")).head()
    // the Report action materialized flagged's cache, so the cluster
    // labels (cached inside DedupClusters' iteration) can be released
    clusterLabels.foreach(_.unpersist())
    val report = Report(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))

    (flagged.filter(col("_s"))
      .select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id"),
      report)
  }
}
