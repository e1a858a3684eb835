package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sign-band blocking over an embedding column — the
  * content-derived bucket that closes q_dedup_embed_cosine's (#63)
  * declared gap: #63 blocks pairs by the `label` column (a stand-in),
  * so its all-pairs-within-block plan dies when a block is large and
  * nothing content-derived bounds it. This module derives the block
  * from the VECTOR ITSELF, so the same query shape (bucket equi-join
  * → exact cosine re-rank) runs at 100 TB with candidates ∝ bucket
  * collisions instead of |block|².
  *
  * Scheme (SRP / sign-random-projection family, axis-aligned): a
  * fixed table of `BANDS` bands × `BITS` dimensions each (BAND_DIMS —
  * frozen constants, the same role as q_dedup_minhash_df's fixed hash
  * coefficients); band key = the packed sign bits of the vector at
  * that band's dimensions. Two vectors are CANDIDATES iff they share
  * at least one (band, key); survivors are re-ranked by exact cosine.
  * Every step is integer/sign arithmetic — identical in any engine —
  * which is what makes the row fully oracle-checkable (the DuckDB
  * oracle recomputes the same bands from the same table).
  *
  * Recall model (for a pair at angle θ, per-dim sign agreement
  * p = 1 − θ/π when coordinates are symmetrically distributed):
  * band collision ≈ p^BITS, recall ≈ 1 − (1 − p^BITS)^BANDS, while
  * unrelated (near-orthogonal, p ≈ ½) pairs collide at ≈ 2^−BITS per
  * band, bounding candidates by ≈ BANDS·2^−BITS of all pairs. At real
  * near-dup thresholds (cos ≥ 0.85 ⇒ p ≥ 0.82, p^8 ≈ 0.2) the default
  * 64×8 table gives recall ≈ 1 − 0.8^64 ≈ 1. The test fixture is the
  * WORST case — random unit vectors, τ = 0.4 (θ ≈ 66°, p ≈ 0.63,
  * p^8 ≈ 0.026) — and still concentrates true pairs ≈ 4× over chance
  * (measured in ExtrasSuite); production deployments with tighter τ
  * should RAISE bits (16–24) to shrink candidates further, which the
  * model above sizes in closed form.
  *
  * At scale: bandKeys is a projection (no shuffle); the candidate
  * join is a plain (band, key) hash join AQE can skew-split; re-rank
  * touches only candidates. Nothing is all-pairs.
  */
object EmbedBlocking {

  val DIM = 64
  val BANDS = 64
  val BITS = 8

  /** Frozen band→dimensions table (64 bands × 8 of 64 dims, sampled
    * once offline, seed 42). A constant, not config: changing it
    * changes candidate semantics, exactly like changing MinHash
    * coefficients. */
  val BAND_DIMS: Array[Array[Int]] = Array(
    Array(14, 1, 47, 17, 15, 63, 8, 61), Array(13, 43, 47, 57, 34, 5, 37, 27), Array(4, 1, 5, 13, 14, 32, 38, 62), Array(25, 45, 41, 44, 34, 26, 14, 28),
    Array(35, 51, 55, 0, 48, 62, 10, 44), Array(54, 21, 17, 9, 13, 48, 62, 6), Array(11, 24, 6, 22, 54, 60, 38, 16), Array(5, 46, 29, 34, 7, 24, 63, 35),
    Array(37, 53, 40, 39, 56, 55, 23, 36), Array(24, 45, 4, 2, 42, 14, 49, 18), Array(10, 54, 14, 55, 6, 24, 17, 29), Array(46, 10, 23, 22, 13, 42, 17, 44),
    Array(9, 38, 40, 10, 34, 46, 15, 60), Array(59, 24, 17, 63, 40, 44, 35, 14), Array(41, 53, 49, 61, 3, 14, 52, 2), Array(40, 25, 17, 4, 13, 58, 36, 56),
    Array(40, 13, 41, 31, 25, 56, 61, 29), Array(18, 16, 8, 15, 47, 35, 34, 62), Array(54, 57, 37, 25, 23, 14, 8, 32), Array(63, 5, 48, 3, 55, 7, 9, 40),
    Array(20, 50, 43, 27, 38, 4, 24, 57), Array(59, 33, 16, 35, 55, 0, 43, 46), Array(14, 43, 56, 34, 48, 17, 49, 41), Array(43, 7, 18, 27, 10, 29, 0, 46),
    Array(33, 62, 32, 48, 11, 61, 6, 55), Array(38, 53, 40, 32, 63, 12, 9, 23), Array(20, 34, 61, 49, 59, 33, 0, 38), Array(41, 31, 1, 7, 59, 23, 56, 53),
    Array(39, 15, 3, 62, 56, 36, 5, 57), Array(62, 52, 4, 48, 34, 49, 8, 57), Array(60, 63, 35, 10, 16, 33, 55, 38), Array(54, 61, 13, 59, 34, 48, 46, 44),
    Array(25, 45, 19, 63, 42, 41, 23, 28), Array(57, 7, 15, 14, 4, 21, 1, 37), Array(29, 37, 14, 0, 4, 45, 40, 3), Array(29, 4, 57, 2, 55, 21, 62, 32),
    Array(30, 17, 42, 31, 13, 34, 8, 46), Array(60, 15, 50, 30, 51, 26, 12, 6), Array(12, 42, 27, 22, 61, 26, 29, 55), Array(6, 43, 41, 61, 63, 3, 25, 46),
    Array(43, 51, 55, 6, 15, 12, 58, 34), Array(57, 8, 27, 11, 17, 29, 15, 55), Array(9, 28, 51, 55, 54, 35, 6, 3), Array(1, 62, 5, 59, 48, 54, 15, 10),
    Array(52, 31, 30, 13, 55, 25, 57, 3), Array(21, 24, 0, 62, 16, 50, 58, 29), Array(36, 27, 44, 46, 50, 35, 42, 45), Array(62, 9, 12, 18, 13, 3, 37, 47),
    Array(7, 47, 20, 3, 60, 37, 30, 32), Array(20, 3, 61, 32, 5, 54, 11, 4), Array(8, 43, 55, 15, 25, 7, 56, 36), Array(31, 37, 38, 2, 39, 5, 26, 42),
    Array(40, 59, 16, 13, 42, 45, 20, 15), Array(33, 25, 8, 42, 41, 19, 29, 20), Array(9, 0, 29, 39, 36, 6, 4, 34), Array(27, 32, 16, 8, 59, 22, 56, 4),
    Array(31, 23, 18, 10, 28, 53, 34, 45), Array(38, 39, 51, 41, 33, 0, 42, 52), Array(38, 59, 42, 6, 56, 8, 16, 7), Array(13, 47, 35, 9, 17, 18, 38, 63),
    Array(43, 13, 63, 40, 54, 16, 32, 31), Array(32, 57, 58, 54, 3, 5, 40, 27), Array(35, 2, 0, 21, 49, 8, 40, 16), Array(20, 47, 28, 35, 45, 27, 60, 0)
  )

  /** Deterministic band→dimensions table for any (bands, bits) —
    * the generator behind [[BAND_DIMS]]'s shape; seeded sampling
    * without replacement per band. Kept as the suite-only regression
    * generator; the contract rows use [[affineTable]], whose dims are
    * a closed-form formula BOTH engines (Spark and the DuckDB
    * oracle) compute — a seeded `Random` shuffle is not
    * SQL-reproducible, a modular affine progression is. */
  def bandTable(bands: Int, bits: Int, seed: Long = 4242L): Array[Array[Int]] = {
    require(bits >= 1 && bits <= 31 && bits <= DIM, s"bits out of range: $bits")
    val rnd = new scala.util.Random(seed)
    Array.fill(bands)(rnd.shuffle((0 until DIM).toVector).take(bits).toArray)
  }

  /** Closed-form dim selection: band `j`, position `t` reads
    * dimension `(17j + 7 + t·step_j) mod 64` with `step_j = 2·((5j +
    * 3) mod 32) + 1`. The step is odd ⇒ coprime with 64 ⇒ the `bits`
    * dims within a band are DISTINCT (sampling without replacement,
    * by construction); (offset, step) varies per band so band dim
    * sets differ. For unrelated vectors (iid sign bits) the per-band
    * collision rate is 2^−bits regardless of WHICH dims a band reads,
    * so the candidate bound is identical to the seeded table's; for
    * correlated pairs the affine sets are as good as random ones
    * (recall floors pinned in ExtrasSuite). Chosen over the seeded
    * shuffle so the DuckDB oracle can rebuild the table from the same
    * three integer constants (17, 7, 5·…·+3) — see [[scaledDimsCte]]. */
  def affineDim(band: Int, t: Int): Int = {
    val step = 2 * ((5 * band + 3) % 32) + 1
    ((17 * band + 7) + t * step) % DIM
  }

  def affineTable(bands: Int, bits: Int): Array[Array[Int]] = {
    require(bits >= 1 && bits <= 24, s"bits out of range: $bits")
    Array.tabulate(bands)(j => Array.tabulate(bits)(t => affineDim(j, t)))
  }

  /** Smallest b in [8, 24] with 2^b ≥ n — integer bit-length, NOT
    * float log2 (ceil(ln n / ln 2) can straddle an exact power of two
    * differently across engines; bit arithmetic cannot). */
  def scaledBits(nVectors: Long): Int = {
    val n = math.max(nVectors, 2L)
    val b = 64 - java.lang.Long.numberOfLeadingZeros(n - 1) // bitLength(n-1)
    math.min(24, math.max(BITS, b))
  }

  /** Bits sized so candidates stay LINEAR in corpus size: unrelated
    * pairs collide at ≈ 2^−bits per band, so 2^bits ≈ n keeps
    * expected candidates ≈ n · bands / 2 regardless of scale. Recall
    * at production thresholds stays high (cos ≥ 0.85 ⇒ p ≥ 0.82;
    * p^bits ≈ 0.05 at bits = 15, recall over 64 bands ≈ 0.96 — the
    * closed-form model in the header). Since r13 this IS the
    * `q_dedup_embed_bucketed` default (the contract row and the
    * 100 TB path agree — VERDICT r12 Next-round #2); the frozen
    * [[BAND_DIMS]] stays as a suite regression table. */
  def scaledTable(nVectors: Long, bands: Int = BANDS): Array[Array[Int]] =
    affineTable(bands, scaledBits(nVectors))

  /** DuckDB CTE fragment rebuilding [[scaledTable]] for `table`:
    * defines `nv(n)`, `bitsv(bits)` (integer shift comparison — the
    * SQL twin of [[scaledBits]]) and `dims(band, bit, dim)` (the
    * [[affineDim]] formula). Splice as the head of a WITH chain. */
  def scaledDimsCte(table: String): String =
    s"""nv AS (SELECT COUNT(*) AS n FROM $table),
       |bitsv AS (SELECT COALESCE((SELECT MIN(b) FROM generate_series(8, 24) t(b)
       |            WHERE (CAST(1 AS BIGINT) << b) >= (SELECT n FROM nv)), 24) AS bits),
       |dims AS (
       |  SELECT a.j AS band, s.t AS bit,
       |         ((a.j * 17 + 7) + s.t * (2 * ((a.j * 5 + 3) % 32) + 1)) % 64 AS dim
       |  FROM generate_series(0, ${BANDS - 1}) a(j)
       |  CROSS JOIN generate_series(0, 23) s(t)
       |  CROSS JOIN bitsv
       |  WHERE s.t < bitsv.bits)""".stripMargin

  /** (id, band, key) — one row per vector per band. Pure projection +
    * explode of a literal-built array: NO shuffle, NO UDF; the sign
    * tests and bit-packing are codegen'd Column arithmetic.
    *
    * Shape (r18 optimization round): the sign test of each dimension
    * is evaluated ONCE into a packed 64-bit `_signs` word (64 CASE
    * WHENs), then every band key is shift/mask arithmetic over that
    * word, each key its own projected column. The original form — a
    * bands × bits CASE-WHEN sum inlined per struct inside the explode
    * input (≈ 900 conditional element_at's in ONE Generate input
    * expression) — blew janino's 64 KB method limit at scaled bit
    * widths, so every run of the hot projection fell back to
    * INTERPRETED evaluation (and re-attempted + re-failed compilation
    * per query run: measured 2.2 s → 0.97 s on the sf0.1 candidate
    * subtree once codegen'd; the test logs carried the
    * "Code grows beyond 64 KB" stack). Key values are bit-identical:
    * ((signs >> d) & 1) << t == (vec[d] >= 0 ? 1 << t : 0). */
  def bandKeys(e: DataFrame, idCol: String, vecCol: String,
      table: Array[Array[Int]] = BAND_DIMS): DataFrame = {
    val signs = (0 until DIM).map(d =>
      when(element_at(col(vecCol), d + 1) >= lit(0f), lit(1L << d))
        .otherwise(lit(0L))).reduce(_ + _)
    val keyCols = table.zipWithIndex.map { case (dims, j) =>
      dims.zipWithIndex.map { case (d, t) =>
        shiftright(col("_signs"), d).bitwiseAND(lit(1L)) * lit(1L << t)
      }.reduce(_ + _).cast("int").as(s"_k$j")
    }
    val bandStructs = table.indices.map(j =>
      struct(lit(j).as("band"), col(s"_k$j").as("key")))
    e.select(col(idCol), signs.as("_signs"))
      .select(col(idCol) +: keyCols.toSeq: _*)
      .select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Distinct candidate id pairs (ia < ib) sharing ≥ 1 band key.
    *
    * The banded projection (64 sign-tests × 8 dims per row, then a
    * 64-way explode) is materialized ONCE via eager localCheckpoint
    * and read back by BOTH self-join sides — without it each side
    * recomputes the full scan+explode (observed ~25% of the query's
    * r9 bench time). LAZY (eager = false): materialization happens on
    * the first ACTION, so merely constructing the frame (schema
    * inspection, .explain, plan-only tests) stays plan-only and
    * launches no job; the sharing benefit is identical because both
    * join sides read the same checkpointed RDD once it exists. Same
    * planning-scale pattern as DedupClusters' per-round checkpoint:
    * executor-local blocks, no lineage, and at cluster scale the
    * blocks sit on the executors that produced them, so the only
    * remaining movement is the (band, key) shuffle the join needs
    * anyway. (Checkpoint blocks are freed by GC of the RDD, not by
    * spark.catalog.clearCache() — long-lived drivers re-running this
    * should not hold references to returned frames.) */
  def candidatePairs(e: DataFrame, idCol: String, vecCol: String,
      table: Array[Array[Int]] = BAND_DIMS): DataFrame = {
    val k = bandKeys(e, idCol, vecCol, table).localCheckpoint(eager = false)
    val a = k.select(col(idCol).as("ia"), col("band"), col("key"))
    val b = k.select(col(idCol).as("ib"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
      .distinct()
  }

  /** Bucketed embedding dedup: candidates from sign bands, exact
    * cosine (codegen `fvec_dot`, unit vectors ⇒ dot = cosine) ≥ `tau`
    * on survivors only. Output (ia, ib, cos_sim) rounded to 6 dp,
    * ordered — the scale-safe counterpart of #63's label-blocked row. */
  def dedupPairs(spark: SparkSession, e: DataFrame, idCol: String, vecCol: String,
      tau: Double, table: Array[Array[Int]] = BAND_DIMS): DataFrame = {
    graft.functions.FloatVecDot.register(spark)
    val cand = candidatePairs(e, idCol, vecCol, table)
    val ea = e.select(col(idCol).as("ia"), col(vecCol).as("_ea"))
    val eb = e.select(col(idCol).as("ib"), col(vecCol).as("_eb"))
    cand.join(ea, "ia").join(eb, "ib")
      .select(col("ia"), col("ib"),
        round(expr("fvec_dot(_ea, _eb)"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .orderBy("ia", "ib")
  }

  /** The BAND_DIMS table as a SQL VALUES list `(band, bit, dim), …` —
    * lets an oracle recompute the frozen table's band keys (the
    * contract row now uses [[scaledDimsCte]]; this remains for
    * suite-side regression checks against the frozen table). */
  def dimsValuesSql: String =
    BAND_DIMS.zipWithIndex.flatMap { case (dims, j) =>
      dims.zipWithIndex.map { case (d, t) => s"($j, $t, $d)" }
    }.mkString(", ")
}
