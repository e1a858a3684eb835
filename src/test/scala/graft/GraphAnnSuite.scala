package graft

import org.apache.spark.sql.functions._

/** Property floors for the graph-family ANN (#140, api/
  * NeighborGraphAnn) — the no-oracle row's substitute for a DuckDB
  * hash check, same pattern as the IVF/LSH suites: structural
  * invariants of the built graph, measured recall floors vs brute
  * force on the fixture's worst-case geometry, and rank-1 recall of
  * planted tight near-dups (the regime graph ANN exists for).
  */
class GraphAnnSuite extends GraftSuite {

  private def brute(e: org.apache.spark.sql.DataFrame, k: Int) = {
    graft.functions.FloatVecDot.register(spark)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    q.crossJoin(e.select(col("vec_id").as("nid"), col("embedding").as("ne")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(expr("fvec_dot(qe, ne)"), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("nid"))))
      .filter(col("rn") <= k)
  }

  test("neighbor graph: structural invariants — no self-loops, bounded degree, mirrored edges, true cosines") {
    val e = Tables.embeddings(spark, sf0001)
    val g = graft.api.NeighborGraphAnn.build(spark, e, "vec_id", "embedding").cache()
    val all = g.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val rows = all.filter(!_._4).map(r => (r._1, r._2, r._3)) // short (capped) edges
    val longs = all.filter(_._4)
    assert(all.nonEmpty && all.forall { case (a, b, _, _) => a != b }, "no self-loops")
    assert(all.map(r => (r._1, r._2)).distinct.length == all.length,
      "(id, nbr) must be unique across short + long edges")
    val deg = rows.groupBy(_._1).view.mapValues(_.size)
    assert(deg.values.max <= 16, s"short out-degree must be <= 2k = 16, got ${deg.values.max}")
    assert(deg.size == e.count(), "every vector must have short out-edges")
    // long-range overlay (r16): present, mirrored exactly, bounded
    // (~2L per node on average; per-node fan-in bounded by hub math)
    val L = graft.api.NeighborGraphAnn.LONG_EDGES_PER_NODE
    assert(longs.nonEmpty && longs.length <= e.count() * 2 * L,
      s"overlay must be <= 2L rows per node, got ${longs.length}")
    val longSet = longs.map(r => (r._1, r._2)).toSet
    assert(longs.forall { case (a, b, _, _) => longSet.contains((b, a)) ||
        rows.exists(r => r._1 == b && r._2 == a) },
      "every long edge must be walkable in reverse (overlay mirror)")
    // after the degree cap, SHORT-edge symmetry is best-effort (a hub
    // may have dropped its reverse of a spoke's edge) — require it to
    // hold for the overwhelming majority
    val edgeSet = rows.map(r => (r._1, r._2)).toSet ++ longSet
    val sym = rows.count { case (a, b, _) => edgeSet.contains((b, a)) }
    assert(sym.toDouble / rows.length >= 0.85,
      s"only $sym/${rows.length} edges have a reverse after the degree cap")
    // scores are true cosines (spot-check against a driver recompute)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.take(50).foreach { case (a, b, c) =>
      val dot = vecs(a).zip(vecs(b)).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(c - dot) < 1e-4, s"edge ($a,$b) cos $c vs recompute $dot")
    }
    g.unpersist()
  }

  test("q_sim_graph_ann (#140): recall@5 vs brute force on the fixture's random-vector worst case") {
    val got = graft.queries.LlmPipeline.qSimGraphAnn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val want = brute(Tables.embeddings(spark, sf0001), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == want.keySet, "every query must return 5 rows")
    val recall = want.map { case (q, t) => (got(q) & t).size.toDouble / t.size }
      .sum / want.size
    // random unit vectors are graph ANN's WORST geometry (no cluster
    // structure to navigate); measured 0.912 here (deterministic
    // build + fixture) — floor with margin. Production embedding
    // corpora are clustered, where the planted test below pins the
    // behavior that matters.
    assert(recall >= 0.85, f"mean recall@5 $recall%.3f below floor")
  }

  test("persisted lifecycle: save/load roundtrip, probe-only results identical, re-save flips versions atomically") {
    val dir = java.nio.file.Files.createTempDirectory("gann").toString
    val e = Tables.embeddings(spark, sf0001)
    val g = graft.api.NeighborGraphAnn.build(spark, e, "vec_id", "embedding")
      .localCheckpoint(true) // pin one concrete build for the comparison
    graft.api.NeighborGraphAnn.save(spark, dir, g, e, "vec_id", "embedding")
    val (gl, vl) = graft.api.NeighborGraphAnn.load(spark, dir)
    assert(gl.count() == g.count() &&
      gl.exceptAll(g).isEmpty && g.exceptAll(gl).isEmpty,
      "loaded edge table must equal the saved one")
    assert(vl.count() == e.count(), "loaded vectors must cover the corpus")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val mem = keyed(graft.api.NeighborGraphAnn.topK(
      spark, g, e, "vec_id", "embedding", q, k = 5))
    val probed = keyed(graft.api.NeighborGraphAnn.topKLoaded(spark, dir, q, k = 5))
    assert(probed == mem,
      "probe over the persisted index must return exactly the in-memory results")
    // re-save publishes v2 without touching v1; load follows to the
    // newest committed version (the Versioned atomicity contract)
    val half = e.filter(col("vec_id") % 2 === 0)
    val g2 = graft.api.NeighborGraphAnn.build(spark, half, "vec_id", "embedding")
    graft.api.NeighborGraphAnn.save(spark, dir, g2, half, "vec_id", "embedding")
    val (gl2, vl2) = graft.api.NeighborGraphAnn.load(spark, dir)
    assert(vl2.count() == half.count() && gl2.count() == g2.count(),
      "load must follow the newest committed version")
    // missing index throws instead of returning empties
    intercept[IllegalStateException] {
      graft.api.NeighborGraphAnn.load(spark, s"$dir/nope")
    }
    // format stamp (ADVICE r16 #2): a pre-r16b index (no stamp — its
    // overlay used a different hub derivation) must read as absent to
    // hasIndex (probe rebuilds) and be refused by load, loudly
    assert(graft.api.NeighborGraphAnn.hasIndex(spark, dir), "fresh save must stamp")
    val vdirs = new java.io.File(dir).listFiles().filter(_.getName.matches("v\\d+"))
    vdirs.foreach(v => new java.io.File(v, "_graft_gann_format").delete())
    assert(!graft.api.NeighborGraphAnn.hasIndex(spark, dir),
      "unstamped index must not count as present")
    val ex = intercept[IllegalStateException] {
      graft.api.NeighborGraphAnn.load(spark, dir)
    }
    assert(ex.getMessage.contains("format"), s"got: ${ex.getMessage}")
  }

  test("incremental insert: held-out vectors wired in by search are findable at full-build recall") {
    val e = Tables.embeddings(spark, sf0001).cache()
    val base = e.filter(col("vec_id") >= 100)          // 400 vectors
    val incoming = e.filter(col("vec_id") < 100)       // the increment (includes the 50 query ids)
    val g0 = graft.api.NeighborGraphAnn.build(spark, base, "vec_id", "embedding")
    val g1 = graft.api.NeighborGraphAnn.insert(spark, g0, base, "vec_id", "embedding", incoming)
    // degree cap survives the merge (short edges — the long-range
    // overlay is cap-exempt by design, r16)
    val deg = g1.filter(!col("is_long"))
      .groupBy(col("id")).count().agg(max(col("count"))).head().getLong(0)
    assert(deg <= 16, s"short-edge degree cap must survive insert, got $deg")
    // the overlay also survives (insert must not re-cap it away)
    assert(g1.filter(col("is_long")).count() > 0, "overlay must survive insert")
    // query the standard 50 over the UPDATED graph + full corpus:
    // recall vs brute force must match the full-build floor — i.e.
    // inserted vectors are first-class citizens of the graph
    val got = graft.api.NeighborGraphAnn.topK(spark, g1, e, "vec_id", "embedding",
        e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val want = brute(e, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recall = want.map { case (q, t) => (got(q) & t).size.toDouble / t.size }
      .sum / want.size
    // measured 0.944 (vs 0.912 full-build — the inserted fifth of the
    // corpus gets edges from SEARCH, which on this geometry finds
    // slightly better neighbors than the LSH seeding did)
    assert(recall >= 0.85, f"post-insert recall@5 $recall%.3f below floor")
    // and inserted vectors appear as RESULTS where they truly belong:
    // of the true top-5 sets, the members with id < 100 must be found
    val insertedTruth = want.toSeq.flatMap { case (q, t) => t.filter(_ < 100).map((q, _)) }
    val insertedHit = insertedTruth.count { case (q, n) => got(q).contains(n) }
    assert(insertedTruth.nonEmpty &&
      insertedHit.toDouble / insertedTruth.size >= 0.75,
      s"only $insertedHit/${insertedTruth.size} true inserted neighbors found")
    e.unpersist()
  }

  test("planted tight near-dups are found at rank 1 (the navigable regime)") {
    val sess = spark; import sess.implicits._
    val rnd = new scala.util.Random(11L)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def jitter(v: Array[Float], eps: Float): Array[Float] = {
      val w = v.map(x => x + eps * rnd.nextGaussian().toFloat)
      val n = math.sqrt(w.map(x => x.toDouble * x).sum).toFloat
      w.map(_ / n)
    }
    val base = (0 until 800).map(i => (i.toLong, unit()))
    val planted = (0 until 25).map(i => ((10000 + i).toLong, jitter(base(i)._2, 0.05f)))
    val e = (base ++ planted).toDF("vec_id", "embedding")
    val g = graft.api.NeighborGraphAnn.build(spark, e, "vec_id", "embedding")
    val out = graft.api.NeighborGraphAnn.topK(spark, g, e, "vec_id", "embedding",
        planted.toDF("qid", "qvec"), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val hit = (0 until 25).count(i => out.get((10000 + i).toLong).contains(i.toLong))
    assert(hit >= 23, s"only $hit/25 planted twins found at rank 1")
  }
}
