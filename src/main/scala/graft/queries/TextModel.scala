package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Statistical language-model scoring over the corpus — the KenLM
  * step of a real curation pipeline (perplexity-against-a-reference
  * is the classic web-scale quality filter, alongside the heuristic
  * signals of #65/#86): train a bigram model WITH add-one smoothing
  * on the deterministic md5 TRAIN split (#120's rule), score every
  * document by mean log-probability and out-of-vocabulary-bigram
  * fraction.
  *
  * Model: P(w₂ | w₁) = (c(w₁w₂) + 1) / (c₁(w₁) + V), where c counts
  * come from the train split only (c₁ counts w₁ as a CONTEXT — its
  * occurrences excluding document-final position), V = train
  * vocabulary size. Unseen bigrams coalesce to c = 0 (that is the
  * point of scoring val/test docs against a train-only model);
  * unseen contexts to c₁ = 0 → P = 1/V.
  *
  * Scale shape: the model IS two aggregates (unigram + bigram
  * counts) — linear, mergeable, persistable like any sketch; scoring
  * is explode + two equi-joins against the model + one per-doc
  * aggregate. At 100 TB the model tables shard by word-hash exactly
  * like the counts that build them; nothing is all-pairs and nothing
  * funnels. All arithmetic is count ratios + ln — identical in any
  * engine, so the row is fully oracled (round-6 on the mean, same
  * determinism class as #56 tf-idf).
  */
object TextModel {
  type Q = (SparkSession, String) => DataFrame

  val qTextNgramLm: Q = (s, dir) => {
    Tables.documents(s, dir).createOrReplaceTempView("docs_lm")
    s.sql(
      """WITH w AS (
        |  SELECT doc_id, split(text, ' ') AS ws FROM docs_lm
        |  WHERE size(split(text, ' ')) >= 2),
        |tr AS (
        |  SELECT * FROM w
        |  WHERE substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 1) <= 'c'),
        |uni AS (
        |  SELECT w1, COUNT(*) AS cu FROM (
        |    SELECT explode(slice(ws, 1, size(ws) - 1)) AS w1 FROM tr)
        |  GROUP BY w1),
        |vocab AS (
        |  SELECT COUNT(*) AS v FROM (
        |    SELECT DISTINCT explode(ws) AS w FROM tr)),
        |bi AS (
        |  SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS cb FROM (
        |    SELECT explode(transform(sequence(1, size(ws) - 1),
        |      i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))) AS bg
        |    FROM tr)
        |  GROUP BY bg.w1, bg.w2),
        |db AS (
        |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
        |    SELECT doc_id, explode(transform(sequence(1, size(ws) - 1),
        |      i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))) AS bg
        |    FROM w)),
        |sc AS (
        |  SELECT doc_id,
        |         ln((coalesce(cb, 0L) + 1.0D) /
        |            CAST(coalesce(cu, 0L) + v AS DOUBLE)) AS logp,
        |         CASE WHEN cb IS NULL THEN 1.0D ELSE 0.0D END AS oov
        |  FROM db
        |  LEFT JOIN bi USING (w1, w2)
        |  LEFT JOIN uni USING (w1)
        |  CROSS JOIN vocab)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       ROUND(AVG(logp), 6) AS avg_logp,
        |       ROUND(AVG(oov), 6) AS oov_frac
        |FROM sc GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)
  }

  // DuckDB zips same-length UNNESTs position-wise — its spelling of
  // Spark's struct-array explode for the (w1, w2) pairs.
  val qTextNgramLmSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE LEN(string_split(text, ' ')) >= 2),
      |tr AS (
      |  SELECT * FROM w WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c'),
      |uni AS (
      |  SELECT w1, COUNT(*) AS cu FROM (
      |    SELECT UNNEST(ws[1:LEN(ws) - 1]) AS w1 FROM tr)
      |  GROUP BY w1),
      |vocab AS (
      |  SELECT COUNT(DISTINCT w) AS v FROM (SELECT UNNEST(ws) AS w FROM tr)),
      |bi AS (
      |  SELECT w1, w2, COUNT(*) AS cb FROM (
      |    SELECT UNNEST(list_transform(generate_series(1, LEN(ws) - 1), i -> ws[i])) AS w1,
      |           UNNEST(list_transform(generate_series(1, LEN(ws) - 1), i -> ws[i + 1])) AS w2
      |    FROM tr)
      |  GROUP BY w1, w2),
      |db AS (
      |  SELECT doc_id,
      |         UNNEST(list_transform(generate_series(1, LEN(ws) - 1), i -> ws[i])) AS w1,
      |         UNNEST(list_transform(generate_series(1, LEN(ws) - 1), i -> ws[i + 1])) AS w2
      |  FROM w),
      |sc AS (
      |  SELECT doc_id,
      |         ln((coalesce(cb, 0) + 1.0) / (coalesce(cu, 0) + v)) AS logp,
      |         CASE WHEN cb IS NULL THEN 1.0 ELSE 0.0 END AS oov
      |  FROM db
      |  LEFT JOIN bi USING (w1, w2)
      |  LEFT JOIN uni USING (w1)
      |  CROSS JOIN vocab)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |       ROUND(AVG(logp), 6) AS avg_logp,
      |       ROUND(AVG(oov), 6) AS oov_frac
      |FROM sc GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---- #127 q_text_chunk (added r12) -------------------------------------
  // Sliding-window document chunking — the step between curation and
  // tokenization: every doc splits into word windows of CHUNK_W with
  // stride CHUNK_S (overlap = W − S context carry), the shape long
  // documents enter a fixed-context-length training run in. Chunk k
  // covers words [k·S, k·S+W); the last window starts at the final
  // position that still adds new words, so coverage is exact and no
  // chunk is empty. Pure per-row explode — NO shuffle at any scale
  // (the same embarrassingly-parallel class as the scrub/quality
  // rows); chunk count per doc = 1 + ⌈(n−W)/S⌉.
  val CHUNK_W = 32
  val CHUNK_S = 24

  val qTextChunk: Q = (s, dir) => {
    Tables.documents(s, dir).createOrReplaceTempView("docs_chunk")
    s.sql(
      s"""WITH w AS (
         |  SELECT doc_id, lang, split(text, ' ') AS ws,
         |         size(split(text, ' ')) AS n
         |  FROM docs_chunk WHERE size(split(text, ' ')) >= 1),
         |c AS (
         |  SELECT doc_id, lang, n, explode(transform(
         |    sequence(0, CASE WHEN n <= $CHUNK_W THEN 0
         |                     ELSE CAST(ceil((n - $CHUNK_W) / ${CHUNK_S}.0) AS INT) END),
         |    k -> struct(k AS chunk_id,
         |                least($CHUNK_W, n - k * $CHUNK_S) AS n_tokens,
         |                array_join(slice(ws, k * $CHUNK_S + 1, $CHUNK_W), ' ') AS chunk))) AS ck
         |  FROM w)
         |SELECT doc_id, lang, CAST(ck.chunk_id AS INT) AS chunk_id,
         |       CAST(ck.n_tokens AS INT) AS n_tokens, ck.chunk AS chunk
         |FROM c
         |ORDER BY doc_id, chunk_id""".stripMargin)
  }

  val qTextChunkSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS ws,
       |         LEN(string_split(text, ' ')) AS n
       |  FROM documents WHERE LEN(string_split(text, ' ')) >= 1),
       |c AS (
       |  SELECT doc_id, lang, ws, n,
       |         UNNEST(generate_series(0, CASE WHEN n <= $CHUNK_W THEN 0
       |           ELSE CAST(CEIL((n - $CHUNK_W) / ${CHUNK_S}.0) AS INT) END)) AS k
       |  FROM w)
       |SELECT doc_id, lang, CAST(k AS INT) AS chunk_id,
       |       CAST(LEAST($CHUNK_W, n - k * $CHUNK_S) AS INT) AS n_tokens,
       |       array_to_string(ws[k * $CHUNK_S + 1 : k * $CHUNK_S + $CHUNK_W], ' ') AS chunk
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_text_ngram_lm" -> qTextNgramLm,
    "q_text_chunk" -> qTextChunk,
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_ngram_lm" -> qTextNgramLmSql,
    "q_text_chunk" -> qTextChunkSql,
  )
}
