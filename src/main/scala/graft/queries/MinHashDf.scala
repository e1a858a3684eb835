package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pure-DataFrame MinHash + LSH banding (SURVEY.md §2B row 71) — the
  * engine-portable alternative to the MLlib wrapper (#53):
  *
  *   shingles → k=12 universal-hash minima (one groupBy, 12 min-aggs)
  *   → 6 bands of r=2 → band self-join = candidate pairs
  *   → EXACT Jaccard (relational shingle intersection) on candidates
  *   → pairs with distance ≤ 0.5.
  *
  * Everything is deterministic md5-derived integer arithmetic, so the
  * DuckDB oracle reproduces the EXACT same candidate set and output —
  * this is the only hash-based fuzzy-dedup in the inventory with a
  * full oracle. It is also the 100 TB shape: one corpus pass for
  * signatures, band join ~linear in docs, exact distances only on
  * candidates. In particular the banding is df-INDEPENDENT — on a
  * df-saturated corpus (where [[graft.queries.PipelineExtras.dfCostGuard]]
  * fires on the exact rows #62/#109), rows #71/#138 here are the
  * declared scale paths (measured ~linear at 10×, BASELINE.md).
  *
  * Overflow safety (both engines use signed 64-bit): shingle hash is
  * 28 bits (7 md5 hex digits), multipliers < 2^31, so a·h + b <
  * 2^59 < Long.Max.
  */
object MinHashDf {
  type Q = (SparkSession, String) => DataFrame

  // shared with api/NearDupStream (the streaming near-dup path must
  // hash identically or its matches diverge from this oracled row)
  private[graft] val P = 2147483659L // prime > 2^31
  private[graft] val A = Seq(1103515245L, 1665525893L, 1234567891L, 1853977123L,
    998244353L, 1500000001L, 1676943757L, 1431655751L,
    1288490189L, 2027100467L, 1073807359L, 1990000033L)
  private[graft] val B = Seq(12345L, 987654321L, 555555555L, 111111111L,
    222222223L, 777777777L, 333333331L, 444444443L,
    666666667L, 888888881L, 142857143L, 314159265L)
  private[graft] val NUM_BANDS = 6 // r = 2 rows per band

  /** Shared candidate pipeline: shingles (with 28-bit md5 hash) →
    * one-pass signatures+sizes → r=2 bands → banded candidate pairs.
    * Returns (sh postings, sigs, cand) — #71 scores candidates by
    * exact Jaccard, #138 by exact CONTAINMENT; the subtrees are
    * byte-identical so the two rows can never drift apart. */
  private[graft] def bandedCandidates(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // distinct 3-shingles with a 28-bit md5-derived hash; the dedup is
    // per-doc array_distinct BEFORE the explode — identical to a
    // global distinct on (doc_id, sh), minus its full shuffle
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("sh"))
      .withColumn("h", expr("CAST(conv(substring(md5(sh), 1, 7), 16, 10) AS BIGINT)"))
      .cache() // consumed 4× (signatures, sizes, both intersection sides)
    // k signatures AND the doc's shingle count in ONE aggregation pass
    // (sizes ride along — no second groupBy over the postings)
    val sigCols = A.indices.map(i =>
      min(expr(s"(${A(i)}L * h + ${B(i)}L) % ${P}L")).as(s"sig$i")) :+
      count(lit(1)).as("sz")
    val sigs = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .cache() // consumed 2× (bands + sizes)
    // bands of r=2 → (band_idx, v1, v2)
    val bandStructs = (0 until NUM_BANDS).map(bi =>
      s"struct(${bi} AS band, sig${2 * bi} AS v1, sig${2 * bi + 1} AS v2)")
    val bands = sigs.select(col("doc_id"),
        explode(expr(s"array(${bandStructs.mkString(", ")})")).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.v1"), col("b.v2"))
    // candidate pairs: same band values, deduped
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v1") === col("y.v1") &&
          col("x.v2") === col("y.v2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    (sh, sigs, cand)
  }

  // ---- #71 q_dedup_minhash_df --------------------------------------------
  val qDedupMinhashDf: Q = (s, dir) => {
    val (sh, sigs, cand) = bandedCandidates(Tables.documents(s, dir))
    // exact Jaccard, computed only for candidates
    val sizes = sigs.select(col("doc_id"), col("sz"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(lit(1.0) - coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sa") + col("sb") - coalesce(col("inter"), lit(0L))).cast("double"), 6)
          .as("jaccard_dist"))
      .filter(col("jaccard_dist") <= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  // ---- #138 q_dedup_contain_minhash (added r13) --------------------------
  // Banded-candidate CONTAINMENT — the scale path for #109, mirroring
  // the #63→#111 pattern (VERDICT r12 Next-round #1 shape (b)). The
  // r13 sf1 probe showed why an exact-threshold inverted-index join
  // cannot be linear on a df-saturated corpus: at 10× data the
  // fixture's trigram vocabulary grows only 1.09× (29.8k vs 27.2k),
  // max df 143 and 29 769 of 29 791 shingles "hot" — EVERY candidate
  // route through shingle identity is Σ df²-shaped (measured: the
  // exact row enumerates 40M prefix-posting pairs, 158 s; BASELINE.md
  // r13 section). MinHash band collisions are df-INDEPENDENT —
  // signature agreement depends on pair similarity only, never on how
  // many documents share a shingle — so candidates stay ∝ docs +
  // true-positives at any corpus size (#71 measured 4.9× at 10×).
  // Declared semantics: containment ≥ 0.8 among BANDED CANDIDATES —
  // full and near-full duplicate pairs (high Jaccard ⇒ band recall
  // ≈ 1 at 6×2 bands) score exactly; a low-Jaccard subset pair (small
  // quote inside a large doc) is structurally invisible to Jaccard-
  // tuned bands and remains the exact row's (#109's) territory on
  // corpora whose df distribution lets its prefix filter bite. Scores
  // on emitted pairs are EXACT (full relational recount, least()
  // denominator) and the whole row — signatures, bands, recount — is
  // integer/md5 arithmetic, hence fully DuckDB-oracled at every sf.
  val qDedupContainMinhash: Q = (s, dir) =>
    containMinhashPairs(Tables.documents(s, dir))

  /** #138 over an arbitrary (doc_id, text) frame — suite-planted
    * recall cases drive this directly. */
  private[graft] def containMinhashPairs(docs: DataFrame): DataFrame = {
    val (sh, sigs, cand) = bandedCandidates(docs)
    val sizes = sigs.select(col("doc_id"), col("sz"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(coalesce(col("inter"), lit(0L)).cast("double") /
          least(col("sa"), col("sb")).cast("double"), 6).as("containment"))
      .filter(col("containment") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Shared CTE prefix (shingles → signatures → bands → candidates →
    * sizes → intersections) — the SQL twin of [[bandedCandidates]],
    * spliced into both rows' oracles.
    *
    * AS MATERIALIZED on the multi-referenced CTEs (r14): DuckDB
    * inlines plain CTEs, so `sigs` (referenced 6× by the band
    * selects) and `sh` (referenced 4×: shh, sizes, inter×2) each
    * re-evaluate the whole 5M-doc shingle+md5 pipeline per reference
    * at the 100× dataset — the sf10 spot sweep measured it spilling
    * >75 GB of DuckDB temp before dying (same failure class as the
    * pagerank oracle, fixed the same way). Hint is DuckDB-dialect
    * (the only engine that runs oracle SQL). */
  private def bandedCandidatesCte: String = {
    val sigExprs = A.indices.map(i =>
      s"MIN((${A(i)} * h + ${B(i)}) % $P) AS sig$i").mkString(",\n         ")
    val bandSelects = (0 until NUM_BANDS).map(bi =>
      s"SELECT doc_id, $bi AS band, sig${2 * bi} AS v1, sig${2 * bi + 1} AS v2 FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |           WHERE LEN(string_split(text, ' ')) >= 3),
       |sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM (
       |  SELECT doc_id, UNNEST(list_transform(generate_series(1, LEN(ws) - 2),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh FROM d)),
       |shh AS (SELECT doc_id, sh,
       |  CAST(list_sum(list_transform(generate_series(1, 7),
       |    i -> (CAST(strpos('0123456789abcdef', substring(md5(sh), i, 1)) AS BIGINT) - 1)
       |         << (4 * (7 - i)))) AS BIGINT) AS h
       |  FROM sh),
       |sigs AS MATERIALIZED (SELECT doc_id,
       |         $sigExprs
       |      FROM shh GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.v1 = y.v1 AND x.v2 = y.v2
       |   AND x.doc_id < y.doc_id),
       |sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |  GROUP BY 1, 2)""".stripMargin
  }

  val qDedupMinhashDfSql: String =
    s"""$bandedCandidatesCte
       |SELECT doc_a, doc_b,
       |       ROUND(1.0 - CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |             / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE), 6) AS jaccard_dist
       |FROM cand c
       |LEFT JOIN inter i USING (doc_a, doc_b)
       |JOIN sizes sa ON sa.doc_id = c.doc_a
       |JOIN sizes sb ON sb.doc_id = c.doc_b
       |WHERE ROUND(1.0 - CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |      / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE), 6) <= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  val qDedupContainMinhashSql: String =
    s"""$bandedCandidatesCte
       |SELECT doc_a, doc_b,
       |       ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |             / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE), 6) AS containment
       |FROM cand c
       |LEFT JOIN inter i USING (doc_a, doc_b)
       |JOIN sizes sa ON sa.doc_id = c.doc_a
       |JOIN sizes sb ON sb.doc_id = c.doc_b
       |WHERE ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |      / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE), 6) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_dedup_minhash_df" -> qDedupMinhashDf,
    "q_dedup_contain_minhash" -> qDedupContainMinhash)
  val oracleSql: Map[String, String] = Map(
    "q_dedup_minhash_df" -> qDedupMinhashDfSql,
    "q_dedup_contain_minhash" -> qDedupContainMinhashSql)
}
