package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-family ANN (the HNSW/NSG regime — VERDICT r12 "What's
  * missing #5"), re-expressed as Spark relational algebra instead of
  * pointer-chasing:
  *
  *  - **Build** = a k-NN NEIGHBOR GRAPH as a DataFrame (id, nbr,
  *    cos_sim): LSH sign-band buckets seed candidate edges (bounded
  *    per bucket), one NN-DESCENT round refines them (the
  *    neighbors-of-my-neighbors join — Dong et al.'s observation
  *    that a good kNN graph is a fixpoint of that expansion), top-k
  *    per node kept, then MIRRORED so every kept edge is walkable in
  *    both directions (HNSW's bidirectional links).
  *  - **Query** = BEAM SEARCH as iterative joins: a batch of queries
  *    starts at shared entry points, and each hop expands the
  *    current per-query beam through the adjacency table (one
  *    id-keyed join), scores new nodes once (fvec_dot — codegen'd,
  *    unit vectors ⇒ dot = cosine), and keeps the best `beam` per
  *    query. After `hops` rounds the best k of everything evaluated
  *    is the answer.
  *
  * Why this shape at 100 TB: HNSW's in-memory pointer walk doesn't
  * distribute — but its two ingredients do. The graph is just an
  * edge TABLE (partitioned by id, cacheable, incrementally
  * maintainable), and a BATCH of queries amortizes each hop into one
  * shuffle-join against it, touching beam·deg rows per query instead
  * of the corpus. Build cost is bounded by construction: bucket
  * size is capped (bits scale with corpus count, like
  * EmbedBlocking.scaledBits) so LSH seeding is ~linear, and
  * NN-descent candidates are ≤ k² per node.
  *
  * Determinism: band tables are the closed-form affine dims; all
  * ranks tie-break on (cos_sim DESC, id); entry points are the
  * lowest `entries` ids. No RNG anywhere — a rebuild is
  * bit-identical. Like the other ANN rows (#55/#69/#87) the row is
  * declared no-oracle (recall is probabilistic, not SQL-expressible)
  * and carries seeded recall/structure property tests instead
  * (GraphAnnSuite).
  */
object NeighborGraphAnn {

  /** Bits sized so LSH buckets hold ~32 vectors: 2^bits ≈ n/32,
    * clamped to [4, 16]. Bounded buckets bound the seeding join. */
  def seedBits(n: Long): Int = {
    val target = math.max(n / 32L, 2L)
    val b = 64 - java.lang.Long.numberOfLeadingZeros(target - 1)
    math.min(16, math.max(4, b))
  }

  /** k-NN neighbor graph over unit vectors: (id, nbr, cos_sim),
    * id ≠ nbr, out-degree ≤ 2k after mirroring (≤ k forward links +
    * reverse links). `bucketCap` guards degenerate LSH buckets (all
    * near-identical vectors collapse into one key): each (band, key)
    * contributes at most cap² candidate pairs. */
  def build(spark: SparkSession, e: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, bands: Int = 8, bucketCap: Int = 64): DataFrame = {
    graft.functions.FloatVecDot.register(spark)
    val n = e.count() // planning-scale scalar (index build, not a query)
    val table = graft.api.EmbedBlocking.affineTable(bands, seedBits(n))
    val keys = graft.api.EmbedBlocking.bandKeys(e, idCol, vecCol, table)
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("band"), col("key")).orderBy(col(idCol))))
      .filter(col("_r") <= bucketCap)
      .select(col(idCol).as("id"), col("band"), col("key"))
    val seedPairs = keys.as("a").join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nbr"))
      .distinct()
    // localCheckpoint(lazy), not cache(): the blocks are reclaimed by
    // the ContextCleaner once the plan is unreferenced, so repeated
    // builds in one session don't accumulate pinned cache entries
    // (cache() blocks survive until explicit unpersist or eviction
    // pressure — ADVICE r13).
    val ev = e.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
      .localCheckpoint(false)
    def score(pairs: DataFrame): DataFrame = pairs
      .join(ev.select(col("_vid").as("id"), col("_v").as("_va")), "id")
      .join(ev.select(col("_vid").as("nbr"), col("_v").as("_vb")), "nbr")
      .select(col("id"), col("nbr"),
        round(expr("fvec_dot(_va, _vb)"), 6).as("cos_sim"))
    def topKPerNode(scored: DataFrame): DataFrame = scored
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nbr"))))
      .filter(col("_r") <= k).drop("_r")
    val g0 = topKPerNode(score(seedPairs))
      .localCheckpoint(true) // NN-descent reads it from 3 sides
    // one NN-descent round: my neighbors' neighbors (forward) plus
    // who points AT me (reverse) are the candidate improvements
    val nn = g0.select(col("id"), col("nbr"))
    val fwd = nn.as("g1").join(nn.as("g2"), col("g1.nbr") === col("g2.id"))
      .select(col("g1.id").as("id"), col("g2.nbr").as("nbr"))
      .filter(col("id") =!= col("nbr"))
    val rev = nn.select(col("nbr").as("id"), col("id").as("nbr"))
    val refined = topKPerNode(
      score(nn.unionByName(fwd).unionByName(rev).distinct()))
    // mirror (every kept edge walkable both ways), then CAP degree at
    // 2k keeping the highest-cosine edges — in-degree is otherwise
    // unbounded (hub vectors collect reverse links), which is exactly
    // HNSW's reason for its max-degree prune; the cap drops only a
    // hub's WORST links, so navigability survives (recall floors in
    // GraphAnnSuite are measured under the cap)
    refined
      .unionByName(refined.select(col("nbr").as("id"), col("id").as("nbr"), col("cos_sim")))
      .groupBy(col("id"), col("nbr")).agg(max(col("cos_sim")).as("cos_sim"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nbr"))))
      .filter(col("_r") <= 2 * k).drop("_r")
  }

  /** Incremental insert — HNSW's actual insert algorithm, batched:
    * each new vector finds its neighbors by BEAM SEARCH over the
    * EXISTING graph (so insertion cost is search cost, never a
    * corpus pass), takes its best k as forward edges, mirrors them,
    * and the merged table is re-capped at degree 2k (hubs shed their
    * worst links, exactly as in [[build]]). This is what makes the
    * edge-TABLE representation an index you maintain instead of
    * rebuild: at 100 TB the daily increment is a search+union+re-cap
    * over the increment's keys, not an O(corpus) job.
    *
    * Contract: `newVecs` (id, vec) ids are fresh (disjoint from the
    * corpus); edges AMONG batch members are not formed by this call —
    * near-dup pairs arriving in ONE batch become mutually reachable
    * via their shared corpus neighbors, and a periodic [[build]]
    * (or NN-descent round) re-tightens the graph, the standard
    * refresh cadence for incremental ANN indexes. Returns the
    * updated edge table; use it with corpus = e ∪ newVecs. */
  def insert(spark: SparkSession, graph: DataFrame, e: DataFrame,
      idCol: String, vecCol: String, newVecs: DataFrame,
      k: Int = 8, beam: Int = 24, hops: Int = 3, entries: Int = 16): DataFrame = {
    val q = newVecs.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val found = topK(spark, graph, e, idCol, vecCol, q, k = k,
      beam = beam, hops = hops, entries = entries)
    val fwd = found.select(col("qid").as("id"), col("nid").as("nbr"), col("cos_sim"))
    graph
      .unionByName(fwd)
      .unionByName(fwd.select(col("nbr").as("id"), col("id").as("nbr"), col("cos_sim")))
      .groupBy(col("id"), col("nbr")).agg(max(col("cos_sim")).as("cos_sim"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos_sim").desc, col("nbr"))))
      .filter(col("_r") <= 2 * k).drop("_r")
  }

  /** Persisted lifecycle (VERDICT r13 "missing #2" / next-round #4),
    * mirroring [[IvfPqIndex]]'s: the index is exactly two tables —
    * edges (id, nbr, cos_sim) and vectors (id, vec) — written under
    * one [[Versioned]] commit, so a probe can never pair edges with
    * vectors from a DIFFERENT build (the same atomicity argument as
    * codes-vs-codebooks there). A re-[[save]] publishes `v<N+1>`
    * without touching the live version; [[load]] reads the highest
    * committed version lazily, so [[topKLoaded]] probes pay parquet
    * scans of the two tables and the beam-search joins — never a
    * build. Search latency is thereby measurable separately from
    * build cost (GraphAnnProbe tool → BASELINE.md). */
  def save(spark: SparkSession, indexDir: String, graph: DataFrame,
      e: DataFrame, idCol: String, vecCol: String): String =
    Versioned.publish(spark, indexDir) { vdir =>
      graph.write.parquet(s"$vdir/edges")
      e.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .write.parquet(s"$vdir/vectors")
    }

  /** (edge table, vectors) of the current committed version. */
  def load(spark: SparkSession, indexDir: String): (DataFrame, DataFrame) = {
    val vdir = Versioned.current(spark, indexDir).getOrElse(throw
      new IllegalStateException(s"no committed neighbor-graph index under $indexDir"))
    (spark.read.parquet(s"$vdir/edges"), spark.read.parquet(s"$vdir/vectors"))
  }

  /** Probe-only entry point: beam search over a persisted index. */
  def topKLoaded(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, beam: Int = 24, hops: Int = 3, entries: Int = 16): DataFrame = {
    val (g, v) = load(spark, indexDir)
    topK(spark, g, v, "id", "vec", queries, k, beam, hops, entries)
  }

  /** Batched beam search over a built graph. `queries` is (qid, qvec);
    * returns (qid, rn, nid, cos_sim), top-k per query, rn 1..k,
    * self-matches (qid == nid over a shared id space) excluded. */
  def topK(spark: SparkSession, graph: DataFrame, e: DataFrame,
      idCol: String, vecCol: String, queries: DataFrame,
      k: Int, beam: Int = 24, hops: Int = 3, entries: Int = 16): DataFrame = {
    graft.functions.FloatVecDot.register(spark)
    // Materialize + id-key the two INDEX tables once per search batch
    // (r15, VERDICT r14 #3 — the probe-latency decomposition): every
    // hop joins the adjacency and vector tables by node id, and
    // without this each of the (hops + 2) joins re-SCANS the parquet
    // and re-EXCHANGES the table — which is why r14's probe-only cost
    // grew 5.1× for the sf1→sf10 decade (scan-bound, ∝ corpus) while
    // the beam·deg model predicts near-flat. One hash repartition on
    // the join key + a lazy localCheckpoint makes hop N read
    // in-memory blocks that are ALREADY distributed by nid
    // (LogicalRDD preserves the physical partitioning, so Catalyst
    // plans the per-hop joins without a fresh exchange on the index
    // side; the ContextCleaner reclaims the blocks when the plan goes
    // out of scope). This is the distributed analog of HNSW's
    // memory-resident index: at cluster scale the index tables live
    // partitioned-by-id across executors and each hop is a co-located
    // lookup, never a table re-shuffle.
    val ev = e.select(col(idCol).as("nid"), col(vecCol).as("_nv"))
      .repartition(col("nid")).localCheckpoint(false)
    val adj = graph.select(col("id").as("nid"), col("nbr"))
      .repartition(col("nid")).localCheckpoint(false)
    val q = queries.select(col("qid"), col("qvec"))
    // deterministic shared entry points: the `entries` lowest ids
    val entry = ev.orderBy(col("nid")).limit(entries)
    def score(cand: DataFrame): DataFrame = cand // (qid, nid)
      .join(q, "qid").join(ev, "nid")
      .select(col("qid"), col("nid"),
        round(expr("fvec_dot(qvec, _nv)"), 6).as("cos_sim"))
    var seen = score(q.select(col("qid")).crossJoin(broadcast(entry.select(col("nid")))))
      .localCheckpoint(true) // per-hop frontier reads; truncate lineage
    for (_ <- 1 to hops) {
      val frontier = seen
        .withColumn("_r", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))))
        .filter(col("_r") <= beam)
        .select(col("qid"), col("nid"))
      val expanded = frontier.join(adj, "nid")
        .select(col("qid"), col("nbr").as("nid")).distinct()
        .join(seen.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_anti")
      seen = seen.unionByName(score(expanded)).localCheckpoint(true)
    }
    seen
      .filter(col("qid") =!= col("nid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"), col("cos_sim"))
      .orderBy("qid", "rn")
  }
}
