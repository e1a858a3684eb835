package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.DedupClusters

/** Retrieval scoring + dedup transitive closure (SURVEY.md §2B rows
  * 102–103): BM25 ranking over the documents corpus, and the
  * connected-components clustering of the MinHash near-dup pairs —
  * both fully oracle-checked (the clusters against a DuckDB recursive
  * CTE).
  */
object SearchDedup {
  type Q = (SparkSession, String) => DataFrame

  // ---- #102 q_text_bm25 --------------------------------------------------
  // BM25 (k1 = 1.2, b = 0.75) for the fixed query {hash, join, merge}:
  // top-10 documents by score. The corpus is read ONCE — a single
  // groupBy(doc_id) produces doc length AND the three per-term counts
  // as conditional sums; document frequencies and the corpus
  // averages reduce that per-doc table to one broadcastable row. At
  // 100 TB this is one pass + one tiny global agg + a
  // TakeOrderedAndProject — no window, no second corpus scan, no
  // per-term shuffle (a vocabulary-keyed plan would shuffle the whole
  // posting list; a 3-term query needs only 3 conditional counters).
  // Determinism (§2.5.2): the three per-term scores are added in ONE
  // fixed textual order in both engines (no float SUM aggregation
  // anywhere), then rounded to 6 dp; ties at the top-10 cut break by
  // doc_id.
  private val BM25_TERMS = Seq("hash", "join", "merge")

  val qTextBm25: Q = (s, dir) => bm25(s, dir, BM25_TERMS, k = 10)

  /** Parameterized BM25: top-`k` docs for any fixed `terms` set — the
    * library surface behind the pinned-literal oracle row (#102).
    * Terms must be plain word tokens (they are inlined into column
    * names and equality filters, not regexes).
    */
  def bm25(s: SparkSession, dir: String, terms: Seq[String], k: Int): DataFrame = {
    val (topk, perDoc) = bm25Frames(s, dir, terms, k)
    // k rows — materialize through the cache, then unpersist, so a
    // long-lived session calling bm25 repeatedly doesn't accumulate
    // cached per-doc plans (previously relied on catalog.clearCache())
    val rows = topk.collect()
    perDoc.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), topk.schema)
  }

  /** The lazy plan behind [[bm25]]: (top-k frame, cached per-doc
    * table). PlanSuite pins the plan shape on this (TakeOrdered +
    * single cached corpus pass); callers own the unpersist. */
  private[graft] def bm25Frames(s: SparkSession, dir: String, terms: Seq[String],
      k: Int): (DataFrame, DataFrame) = {
    require(terms.nonEmpty && k > 0, s"need terms and k > 0 (got $terms, $k)")
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tfCols = terms.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t")) :+
      count(lit(1)).as("dl")
    // cached: perDoc is |docs| rows (tiny vs the corpus) and feeds both
    // the global df/avgdl reduction and the scoring join — caching makes
    // the corpus genuinely single-pass (exchange reuse doesn't fire
    // across the differing consumer subtrees under AQE; same recipe as
    // q_text_tfidf, and the PlanSuite scan-count pin enforces it)
    val perDoc = words.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
      .cache()
    val globCols = terms.map(t =>
      sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("double").as(s"df_$t")) ++ Seq(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val glob = perDoc.agg(globCols.head, globCols.tail: _*)
    // per-term BM25 contribution, arithmetic shaped EXACTLY like the
    // oracle SQL (left-assoc *, / — same evaluation order bit-for-bit)
    def termScore(t: String): Column =
      log((col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) + lit(1.0)) *
        (col(s"tf_$t").cast("double") * lit(2.2)) /
        (col(s"tf_$t").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
    val topk = perDoc.crossJoin(broadcast(glob))
      .select(col("doc_id"),
        round(terms.map(termScore).reduceLeft(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    (topk, perDoc)
  }

  val qTextBm25Sql: String = {
    val tfSel = BM25_TERMS.map(t =>
      s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(",\n         ")
    val dfSel = BM25_TERMS.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
      .mkString(",\n         ")
    val scoreExpr = BM25_TERMS.map(t =>
      s"""LN((g.n_docs - g.df_$t + 0.5) / (g.df_$t + 0.5) + 1.0)
         |        * (CAST(p.tf_$t AS DOUBLE) * 2.2)
         |        / (CAST(p.tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(p.dl AS DOUBLE) / g.avgdl)))"""
        .stripMargin).mkString("\n    + ")
    s"""WITH words AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
       |per_doc AS (
       |  SELECT doc_id,
       |         $tfSel,
       |         COUNT(*) AS dl
       |  FROM words GROUP BY doc_id),
       |corpus AS (
       |  SELECT $dfSel,
       |         CAST(COUNT(*) AS DOUBLE) AS n_docs,
       |         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM per_doc)
       |SELECT doc_id,
       |  ROUND(
       |    $scoreExpr, 6) AS score
       |FROM per_doc p CROSS JOIN corpus g
       |ORDER BY score DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  // ---- #103 q_dedup_clusters ---------------------------------------------
  // The transitive closure the pairwise near-dup rows stop short of:
  // run the full oracled MinHash-band pipeline (#71), then assign
  // every doc that appears in a near-dup pair to its connected
  // component (cluster id = min doc_id reachable through pair edges —
  // DedupClusters' pointer-jumping label propagation, O(log diameter)
  // rounds over the pairs-sized edge list). This is the row that
  // makes "keep one exemplar per near-dup CLUSTER" driver-checkable:
  // the oracle recomputes the same pairs in DuckDB and closes them
  // with a recursive CTE — chains like a–b, b–c must collapse to one
  // cluster in BOTH engines, which a pair-level oracle can never see.
  val qDedupClusters: Q = (s, dir) =>
    DedupClusters.assign(MinHashDf.qDedupMinhashDf(s, dir))
      .select(col("doc_id"), col("cluster").as("cluster_id"))
      .orderBy("doc_id")

  // pairs/sym AS MATERIALIZED (r14, both this oracle and canonical's):
  // DuckDB inlines plain CTEs, and `pairs` embeds the entire #71
  // minhash pipeline — referenced 2x by sym (and sym again by the
  // recursion), the 100x dataset re-evaluated it until DuckDB spilled
  // >75 GB of temp; materialized, the sweep completes (the inner
  // shingle/signature CTEs carry their own hints in MinHashDf).
  val qDedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |${MinHashDf.qDedupMinhashDfSql}
       |),
       |sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM sym),
       |reach AS (
       |  SELECT node, node AS label FROM nodes
       |  UNION
       |  SELECT s.dst AS node, r.label FROM reach r JOIN sym s ON s.src = r.node)
       |SELECT node AS doc_id, MIN(label) AS cluster_id
       |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  // ---- #121 q_dedup_canonical --------------------------------------------
  // Cluster-representative selection — the step that MATERIALIZES the
  // deduped corpus from #103's clusters: per near-dup cluster keep
  // exactly one doc, the highest-quality one (n_chars as the quality
  // proxy; doc_id tiebreak), drop the rest; docs in no cluster keep
  // themselves. Scale shape: the ranking window runs over the
  // CLUSTERED docs only (pairs-sized — near-dup membership is a tiny
  // fraction of any real corpus), then one left join flags the full
  // corpus; the full-corpus side is never window-partitioned or
  // self-joined. Every engine keeps exactly one is_kept=1 row per
  // cluster_id by construction — driver-checked transitively via the
  // same recursive-CTE closure as #103.
  val qDedupCanonical: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val rep = DedupClusters.assign(MinHashDf.qDedupMinhashDf(s, dir))
      .join(docs, "doc_id")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .select(col("doc_id"), col("cluster").as("_c"), (col("_rn") === 1).as("_keep"))
    docs.join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_c"), col("doc_id")).as("cluster_id"),
        coalesce(col("_keep"), lit(true)).cast("int").as("is_kept"))
      .orderBy("doc_id")
  }

  val qDedupCanonicalSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |${MinHashDf.qDedupMinhashDfSql}
       |),
       |sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |        UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM sym),
       |reach AS (
       |  SELECT node, node AS label FROM nodes
       |  UNION
       |  SELECT s.dst AS node, r.label FROM reach r JOIN sym s ON s.src = r.node),
       |clusters AS (SELECT node AS doc_id, MIN(label) AS cluster_id
       |             FROM reach GROUP BY node),
       |rep AS (
       |  SELECT c.doc_id, c.cluster_id,
       |         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |           ORDER BY d.n_chars DESC, c.doc_id) AS rn
       |  FROM clusters c JOIN documents d USING (doc_id))
       |SELECT d.doc_id, COALESCE(r.cluster_id, d.doc_id) AS cluster_id,
       |       CAST(COALESCE(r.rn = 1, TRUE) AS INT) AS is_kept
       |FROM documents d LEFT JOIN rep r USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_text_bm25" -> qTextBm25,
    "q_dedup_clusters" -> qDedupClusters,
    "q_dedup_canonical" -> qDedupCanonical,
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_bm25" -> qTextBm25Sql,
    "q_dedup_clusters" -> qDedupClustersSql,
    "q_dedup_canonical" -> qDedupCanonicalSql,
  )
}
