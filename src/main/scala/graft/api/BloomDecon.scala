package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.PipelineExtras

/** Bloom-prefiltered benchmark decontamination — the variant of
  * q_decontaminate for when the EVAL side stops being broadcast-sized
  * (a consortium of benchmark suites, or decontaminating against a
  * whole held-out corpus).
  *
  * The exact query broadcasts the full eval shingle set; its cost
  * grows with the eval suite. Here the corpus is prefiltered through
  * a Bloom filter of the eval shingles — FIXED size for a chosen fpp
  * whatever the eval set, built distributed by `DataFrame.stat
  * .bloomFilter` and shipped once in a closure — and only the ~fpp
  * fraction of false-positive shingles (plus true hits) reaches the
  * exact verification join. Bloom filters have NO false negatives, so
  * the result is IDENTICAL to the exact query (suite-proven), and the
  * exact join's input shrinks from every corpus shingle to the hit
  * set: one linear pass with a constant-size sidecar, at any corpus
  * and any eval scale.
  */
object BloomDecon {

  /** The precomputed eval side — cached shingle table plus the Bloom
    * prefilter — built ONCE and applied to any number of train
    * frames: the batch `decontaminate` below uses it for one corpus
    * pass, [[StreamDecon]] closes over it and applies it to every
    * micro-batch of a doc stream (the filter ships once; batches pay
    * only their own shingling + the hit-sliver join).
    */
  final class EvalFilter private[BloomDecon] (
      evalSh: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      minShared: Int) {

    /** Flag `train` (doc_id, text) against the eval side: the same
      * (train_doc, eval_doc, n_shared) contract as q_decontaminate.
      */
    def flag(train: DataFrame): DataFrame = {
      val b = bloom
      val mightHit = udf((s: String) => s != null && b.mightContain(s))
      val trainHits = PipelineExtras.shingles5(train)
        .select(col("doc_id").as("train_doc"), col("sh"))
        .filter(mightHit(col("sh")))
      // exact verification on the surviving sliver only: false
      // positives die here, so output == the exact broadcast-join query
      trainHits.join(evalSh, "sh")
        .groupBy(col("train_doc"), col("eval_doc"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .orderBy("train_doc", "eval_doc")
    }

    /** The gated-clean side of `train`: rows whose doc shares no
      * disqualifying overlap with the eval set. This is the
      * composition point for ingest pipelines — inside a foreachBatch,
      * `filter.clean(batch)` feeds any downstream sink (e.g. a
      * [[StreamzOps.StreamzDataFrame.sinkUpsert]]-style keyed commit)
      * with only decontaminated docs. Extra columns ride through.
      */
    def clean(train: DataFrame): DataFrame =
      train.join(flag(train).select(col("train_doc").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")

    /** Release the cached eval shingle table. Call when no more
      * `flag` results will be consumed — a long-lived session that
      * builds filters repeatedly (e.g. one per stream) would
      * otherwise accumulate cache entries with no handle to drop
      * them. [[StreamDecon]] closes its filter on query termination.
      */
    def close(): Unit = { evalSh.unpersist(); () }
  }

  /** Build the eval side once.
    *
    * @param expectedEvalShingles sizing hint for the Bloom filter
    *        (distinct eval shingles); overestimate is safe (bigger
    *        filter), underestimate inflates fpp only — never
    *        correctness.
    */
  def evalFilter(eval: DataFrame,
      minShared: Int = PipelineExtras.DECON_MIN_SHARED,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.01): EvalFilter = {
    val evalSh = PipelineExtras.shingles5(eval)
      .select(col("doc_id").as("eval_doc"), col("sh"))
      .cache() // consumed by the bloomFilter action + every verify join
    val bloom = evalSh.stat.bloomFilter("sh", expectedEvalShingles, fpp)
    new EvalFilter(evalSh, bloom, minShared)
  }

  /** (train_doc, eval_doc, n_shared) pairs sharing >= minShared
    * distinct 5-gram shingles — same contract and output as
    * q_decontaminate.
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
      minShared: Int = PipelineExtras.DECON_MIN_SHARED,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.01): DataFrame =
    evalFilter(eval, minShared, expectedEvalShingles, fpp).flag(train)
}
