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

  /** (train_doc, eval_doc, n_shared) pairs sharing >= minShared
    * distinct 5-gram shingles — same contract and output as
    * q_decontaminate.
    *
    * @param expectedEvalShingles sizing hint for the Bloom filter
    *        (distinct eval shingles); overestimate is safe (bigger
    *        filter), underestimate inflates fpp only — never
    *        correctness.
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
      minShared: Int = PipelineExtras.DECON_MIN_SHARED,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val evalSh = PipelineExtras.shingles5(eval)
      .select(col("doc_id").as("eval_doc"), col("sh"))
      .cache() // consumed twice: the bloomFilter action + the verify join
    val bloom = evalSh.stat.bloomFilter("sh", expectedEvalShingles, fpp)
    val mightHit = udf((s: String) => s != null && bloom.mightContain(s))
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
}
