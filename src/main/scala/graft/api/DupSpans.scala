package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-passage span detection (SURVEY §2B row 128) as a
  * reusable DataFrame transform — the one implementation behind both
  * `q_dedup_substring` and the `graft_dup_spans` SQL table function.
  *
  * Algorithm (the shingle form of exact-substring training-data
  * dedup): every k-word shingle occurring in ≥ 2 documents marks its
  * positions; per document, marked windows that overlap or touch
  * ([p, p+k−1] vs [p', p'+k−1] with p' ≤ p+k) merge into maximal
  * spans via gaps-and-islands.
  *
  * Scale shape: shingle explode is per-row; the duplicated-shingle
  * filter is ONE groupBy keyed by shingle content (shards by hash at
  * any corpus size); the island merge is a window partitioned by
  * doc — the same per-document locality every other dedup row uses.
  * Nothing is all-pairs. At 100 TB the shingle aggregate is the same
  * shuffle the corpus-wide n-gram counts already pay, and the
  * semi-join back is an equi-join on that same key.
  */
object DupSpans {

  /** @return (doc_id, span_start, span_end, n_shingles) per maximal
    *         duplicated span, ordered by (doc_id, span_start);
    *         positions are 1-based word offsets, span bounds inclusive.
    *
    * r12 sf1-probe optimizations (24.5 s → single-digit at the 10×
    * dataset, output unchanged):
    *  - shingles travel as a TWO-SEED 128-bit `xxhash64` pair over
    *    the word SLICE (r14, retiring the r13 accepted-risk) — no
    *    per-shingle string is ever built, and the corpus-wide shuffle
    *    carries 16-byte keys instead of ~50-char strings. Pair
    *    collisions (≈ n²/2¹²⁹) are negligible at ANY corpus size —
    *    the same guarantee class as the md5 exact-dup collapse — and
    *    a collision would only ever ADD a spurious marked position,
    *    never lose one.
    *  - ONE shingle explode: the ≥2-distinct-docs filter runs as
    *    window min/max(doc_id) over the fingerprint partition on the
    *    exploded rows themselves (r19; previously a collect_list +
    *    interpreted HOF filter + re-explode round-trip, and before
    *    r12 a second corpus explode as a semi-join probe — each
    *    measured slower than its successor, outputs identical).
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"shingle width must be >= 2, got $k")
    val ws = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= k)
    val sh = ws
      .select(col("doc_id"), explode(expr(
        // the second hash prepends a constant discriminator so the two
        // 64-bit lanes are independent functions of the same slice
        s"""transform(sequence(1, size(ws) - ${k - 1}),
           |  i -> struct(i AS pos,
           |    struct(xxhash64(slice(ws, i, $k)) AS h1,
           |           xxhash64('graft-h2', slice(ws, i, $k)) AS h2) AS h))""".stripMargin)).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.h").as("h"))
    // ≥2-distinct-docs filter as window min/max over the fingerprint
    // (r19 optimization round): min(doc_id) ≠ max(doc_id) over the h
    // partition ⟺ the shingle occurs in ≥ 2 documents, and filtering
    // the ORIGINAL rows keeps exactly the multiset the old
    // collect_list(occs) → interpreted-HOF distinct filter → explode
    // round-trip re-emitted ((doc_id, pos) is unique in `sh` — one
    // shingle per position). Same ONE shuffle by h; the per-group
    // ObjectHashAggregate list build + CodegenFallback filter +
    // re-explode are replaced by two codegen'd window aggregates
    // (measured at sf0.1: marked stage 1.70 → 1.25 s noop,
    // OPTIMIZATION_r19.md).
    val hw = Window.partitionBy("h")
    val marked = sh
      .withColumn("d1", min(col("doc_id")).over(hw))
      .withColumn("d2", max(col("doc_id")).over(hw))
      .filter(col("d1") =!= col("d2"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1).otherwise(0))
      .withColumn("island",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("int").as("span_start"),
        (max("pos") + (k - 1)).cast("int").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select("doc_id", "span_start", "span_end", "n_shingles")
      .orderBy("doc_id", "span_start")
  }

  /** Duplicated-passage EXCISION (§2B row 131) — [[dupSpans]]'s
    * write-path companion: every word position covered by a
    * duplicated span is removed from every document, and the corpus
    * is re-emitted as (doc_id, n_words, n_removed, clean_text),
    * ordered by doc_id. The span table is tiny (docs with dups only)
    * so the join broadcasts; the excision is a per-row HOF position
    * filter — embarrassingly parallel at any scale.
    */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, k)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("spans"))
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ws"),
        expr("""filter(sequence(1, size(ws)),
               |  i -> spans IS NULL OR NOT exists(spans, s -> i >= s.s AND i <= s.e))
               |""".stripMargin).as("keep"))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        (size(col("ws")) - size(col("keep"))).as("n_removed"),
        expr("array_join(transform(keep, i -> element_at(ws, i)), ' ')").as("clean_text"))
      .orderBy("doc_id")
  }
}
