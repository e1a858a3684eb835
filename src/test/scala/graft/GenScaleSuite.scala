package graft

import org.apache.spark.sql.functions._

import graft.tools.GenScale

/** Pins the r16 GenScale grow-mode invariants (VERDICT r15 Next-round
  * #1) that until now were validated only by measurement (vocab
  * predictions + cross-engine digests at g1/g10, BASELINE.md):
  *
  *  1. the closed-form codegen rewrite (md5 column arithmetic inside
  *     `scaleDocuments`) matches the specification function
  *     ([[GenScale.vocabGrow]]'s documented contract: select word w in
  *     replica i iff the first md5 byte of "gs-grow:i:w" < 192, image
  *     "w~i") — recomputed independently in this suite;
  *  2. the per-replica map is injective on shingles, so within-replica
  *     3-shingle Jaccard is preserved EXACTLY (the property that makes
  *     grow-mode candidate counts provably ~f×);
  *  3. vocabulary grows by exactly the spec-selected word count per
  *     replica (≈ 0.75·V each — linear in f, the anti-saturation
  *     property the mode exists for);
  *  4. the f > MAX_PERM_REPLICAS embeddings path (closed-form sign
  *     flip) is an orthogonal transform: within-replica dot products
  *     and norms are preserved bit-for-bit.
  */
class GenScaleSuite extends GraftSuite {

  private def md5SelectByte(i: Long, w: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"gs-grow:$i:$w".getBytes("UTF-8"))(0) & 0xff
  }
  private val threshold = (GenScale.GROW_SELECT_FRAC * 256).toInt

  /** The spec rewrite, implemented independently of the engine path. */
  private def specRewrite(text: String, i: Long): String =
    text.split(" ", -1).map { w =>
      if (md5SelectByte(i, w) < threshold) s"$w~$i" else w
    }.mkString(" ")

  private def shingles3(text: String): Set[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 3) Set(ws.mkString(" "))
    else ws.sliding(3).map(_.mkString(" ")).toSet
  }

  private lazy val grownDir: String = {
    val dst = java.nio.file.Files.createTempDirectory("gs_grow").toString
    GenScale.generate(spark, sf0001, dst, 3, "grow",
      Set("documents", "embeddings"))
    dst
  }

  test("grow mode: closed-form rewrite == spec, token-for-token, every replica") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val span = base.keys.max + 1
    val grown = spark.read.parquet(s"$grownDir/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    assert(grown.length == base.size * 3, "3 replicas of every doc")
    grown.foreach { r =>
      val id = r.getLong(0); val rep = id / span; val baseId = id % span
      val expected =
        if (rep == 0) base(baseId) else specRewrite(base(baseId), rep)
      assert(r.getString(1) == expected,
        s"doc $id (replica $rep of $baseId): engine rewrite != spec")
      assert(r.getLong(2) == expected.length.toLong,
        s"doc $id: n_chars not recomputed from rewritten text")
    }
  }

  test("grow mode: within-replica 3-shingle Jaccard preserved exactly (injective shingle map)") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val span = base.keys.max + 1
    val grown = spark.read.parquet(s"$grownDir/documents.parquet")
      .filter(col("doc_id") >= span && col("doc_id") < 2 * span)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) % span) -> r.getString(1)).toMap
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0
      else (a & b).size.toDouble / (a | b).size
    // deterministic pair sample: consecutive ids (the fixture plants
    // near-dups at adjacent ids) plus a stride-37 spread
    val ids = base.keys.toSeq.sorted
    val pairs = ids.zip(ids.tail) ++ ids.zip(ids.drop(37))
    pairs.foreach { case (a, b) =>
      val jBase = jac(shingles3(base(a)), shingles3(base(b)))
      val jGrown = jac(shingles3(grown(a)), shingles3(grown(b)))
      assert(jBase == jGrown,
        s"pair ($a,$b): base J=$jBase != grown J=$jGrown — shingle map not injective")
    }
    // distinct-shingle count per replica == base (set-level injectivity)
    val baseDistinct = base.values.flatMap(shingles3).toSet.size
    val grownDistinct = grown.values.flatMap(shingles3).toSet.size
    assert(baseDistinct == grownDistinct,
      s"replica-1 distinct shingles $grownDistinct != base $baseDistinct")
  }

  test("grow mode: vocabulary grows by exactly the spec-selected count per replica") {
    val baseVocab = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val grownVocab = spark.read.parquet(s"$grownDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    // deterministic expectation straight from the spec: replica i adds
    // one new token per selected word (and keeps unselected words in
    // the base form, already counted)
    val expected = baseVocab.size +
      (1 to 2).map(i => baseVocab.count(w => md5SelectByte(i, w) < threshold)).sum
    assert(grownVocab.size == expected,
      s"vocab ${grownVocab.size} != spec-predicted $expected (base ${baseVocab.size})")
    // and the growth is material: ≈ 0.75·V per replica, not a few words
    assert(grownVocab.size > (baseVocab.size * 2.0).toInt,
      "grow mode must add ~0.75·V new tokens per replica")
  }

  test("grow mode rejects a base corpus whose words contain '~' (chained-run guard)") {
    val sess = spark; import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gs_tilde").toString
    Seq((0L, "alpha beta~1 gamma", "en", "web", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      GenScale.generate(spark, dir, s"$dir/out", 2, "grow", Set("documents"))
    }
    assert(e.getMessage.contains("~"), s"unexpected error: ${e.getMessage}")
  }

  test("embeddings sign-flip path (f > MAX_PERM_REPLICAS): within-replica dots and norms bit-identical") {
    val f = GenScale.MAX_PERM_REPLICAS + 2 // forces the closed-form branch
    val dst = java.nio.file.Files.createTempDirectory("gs_sign").toString
    GenScale.generate(spark, sf0001, dst, f, "perm", Set("embeddings"))
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val span = base.keys.max + 1
    def dot(a: Array[Float], b: Array[Float]): Float =
      a.zip(b).map { case (x, y) => x * y }.sum
    // spot replicas across the range, incl. the last
    Seq(1L, 64L, (f - 1).toLong).foreach { rep =>
      val vecs = spark.read.parquet(s"$dst/embeddings.parquet")
        .filter(col("vec_id") >= rep * span && col("vec_id") < (rep + 1) * span)
        .filter(col("vec_id") % span < 8) // 8 vectors per replica suffice
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0) % span) -> r.getSeq[Float](1).toArray).toMap
      assert(vecs.size == 8, s"replica $rep: expected 8 sampled vectors")
      val ids = vecs.keys.toSeq.sorted
      for (a <- ids; b <- ids if a < b) {
        // sign flips cancel pairwise: dot products are EXACT, not ≈
        assert(dot(vecs(a), vecs(b)) == dot(base(a), base(b)),
          s"replica $rep pair ($a,$b): dot product not preserved")
      }
      ids.foreach { a =>
        assert(dot(vecs(a), vecs(a)) == dot(base(a), base(a)),
          s"replica $rep vec $a: norm not preserved")
        assert(vecs(a).map(math.abs).toSeq == base(a).map(math.abs).toSeq,
          s"replica $rep vec $a: not a sign flip of the base vector")
      }
    }
  }
}
