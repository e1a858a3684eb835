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
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"shingle width must be >= 2, got $k")
    val ws = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= k)
    val sh = ws
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(ws) - ${k - 1}),
           |  i -> struct(i AS pos, array_join(slice(ws, i, $k), ' ') AS sh))""".stripMargin)).as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"), col("e.sh").as("sh"))
    val dup = sh.groupBy("sh")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") >= 2)
      .select("sh")
    val marked = sh.join(dup, "sh").select("doc_id", "pos")
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
}
