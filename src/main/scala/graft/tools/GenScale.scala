package graft.tools

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor amplifier: synthesize an sf-N× dataset from a driver
  * fixture directory by STRUCTURE-PRESERVING replication, so the
  * heavy queries can be measured at 10× and their scaling curves
  * published (VERDICT r11 "what's missing #1" — the builder may
  * generate under /tmp; driver fixtures stop at sf0.1 and are
  * read-only).
  *
  * Why replication and not a fresh generator: the point of the
  * scaling bench is that per-query cost should grow ~linearly in
  * rows WITH the fixture's own distributions (duplicate rates, key
  * skew, value ranges). Replicating each table F times with disjoint
  * key spaces preserves every distribution exactly while multiplying
  * cardinality — and it is what a real 10× corpus looks like to
  * every banded/blocked operator: F independent shards of the same
  * statistical shape.
  *
  * Per-table recipe (replica i ∈ [0, F)):
  *  - `region`/`nation`: copied (fixed dimensions at every SF).
  *  - `customer`/`supplier`/`part`/`orders`/`lineitem`: every key
  *    column shifts by i × (max(key)+1) — FK joins stay consistent
  *    WITHIN a replica, key spaces are disjoint ACROSS replicas.
  *  - `events`: event_id/user_id shift; ts is kept — 10× events in
  *    the same time span models traffic growth (sessionization and
  *    window queries keep non-degenerate groupings).
  *  - `documents`: doc_id shifts; replica i > 0 rewrites text under a
  *    PER-REPLICA VOCABULARY PERMUTATION (a seeded bijection of the
  *    corpus vocabulary). A bijective word relabeling preserves every
  *    shingle/MinHash/SimHash relationship within the replica
  *    EXACTLY — the planted duplicate/near-duplicate structure
  *    replicates at exactly 10× — while cross-replica texts share no
  *    more n-grams than random corpus docs already do (no artificial
  *    mega-clusters, which naive text copying would create and which
  *    would make dedup look super-linear for a fake reason). n_chars
  *    is recomputed from the rewritten text.
  *  - `embeddings`: vec_id shifts; replica i > 0 applies a seeded
  *    SIGNED PERMUTATION of the 64 dims — an orthogonal transform,
  *    so every within-replica dot product (and unit norm) is
  *    preserved bit-for-bit in structure while cross-replica cosines
  *    are random-like. ANN/dedup recall structure replicates at 10×.
  *
  * Everything is deterministic (fixed seeds); the whole job is
  * projection + crossJoin with a tiny replica range — no shuffles
  * except the output write.
  *
  * Usage: `runMain graft.tools.GenScale [srcDir] [dstDir] [factor]
  * [vocabMode] [tables]` (defaults: /root/testdata/sf0.1 →
  * /tmp/graft_sf1 × 10, vocabMode `perm`, all tables; `tables` is a
  * comma list for resuming a partial generation). vocabMode `grow` makes the documents vocabulary
  * scale with the corpus (see [[vocabGrow]] and [[generate]]) — the
  * mode to use beyond sf10, where the fixed fixture vocabulary
  * saturates the shingle space (r15 boundary).
  */
object GenScale {

  val DIM = 64

  private def reps(spark: SparkSession, f: Int): DataFrame =
    spark.range(f).select(col("id").cast("int").as("_rep"))

  /** key + i × (max+1), computed per column from the source table. */
  private def shifted(df: DataFrame, f: Int, keyCols: Seq[String]): DataFrame = {
    val spans = keyCols.map { k =>
      k -> (df.agg(max(col(k))).head.getLong(0) + 1L)
    }.toMap
    val rep = broadcast(reps(df.sparkSession, f))
    val out = df.crossJoin(rep)
    df.columns.foldLeft(out) { (cur, c) =>
      if (spans.contains(c))
        cur.withColumn(c, col(c) + col("_rep").cast("long") * spans(c))
      else cur
    }.drop("_rep")
  }

  private def copyTable(spark: SparkSession, src: String, dst: String, t: String): Unit =
    spark.read.parquet(s"$src/$t.parquet")
      .write.mode("overwrite").parquet(s"$dst/$t.parquet")

  /** Sharded write for the scaled tables (r14): the fixture inputs
    * are single-partition, and a broadcast crossJoin preserves that —
    * so without an explicit shuffle every scaled table landed as ONE
    * parquet file with ONE row group, which no reader can split: at
    * the 100× dataset the whole 500k-doc corpus scan became a single
    * task and serialized every CPU-heavy pipeline behind one core.
    * A real N× corpus is many files; 32 shards makes the generated
    * data splittable exactly like production layout. */
  private val OUT_SHARDS = 32
  private def writeSharded(df: DataFrame, path: String): Unit =
    df.repartition(OUT_SHARDS).write.mode("overwrite").parquet(path)

  /** Replica-i vocabulary bijection over `vocab`, seed-derived. */
  private def vocabPerm(vocab: Array[String], i: Int): Map[String, String] = {
    val rnd = new scala.util.Random(42L * 1000003L + i)
    val shuffled = rnd.shuffle(vocab.toVector)
    vocab.zip(shuffled).toMap
  }

  /** Fraction of the vocabulary each grow-mode replica rewrites to a
    * replica-unique token (hash-selected per (word, replica)). */
  val GROW_SELECT_FRAC = 0.75

  /** Replica-i GROW map (r16, VERDICT r15 Next-round #1): a
    * deterministic ~[[GROW_SELECT_FRAC]] of words get a
    * replica-unique suffix (`w` → `w~i`); the rest keep their
    * original form. Selection hashes (word, replica) jointly, so
    * each replica rewrites a DIFFERENT three-quarters of the
    * vocabulary.
    *
    * Why this shape:
    *  - **Per-replica duplicate-pair bijection is preserved** — the
    *    map is INJECTIVE on the vocabulary (suffixed images are
    *    pairwise distinct; an unsuffixed word can only collide with a
    *    suffixed image if `w2~i` already existed as a word, which is
    *    asserted against below), so within a replica every document's
    *    shingle SET is transformed by an injective shingle map:
    *    intersections, unions, Jaccards, containments, and distinct
    *    counts are preserved EXACTLY, and the planted dup/near-dup
    *    structure replicates at exactly f× — the same proof the perm
    *    mode carries, candidate counts provably ~f×.
    *  - **Vocabulary grows ∝ corpus** — each replica contributes
    *    ~0.75·V brand-new tokens, so |vocab(f)| ≈ V·(1 + 0.75(f−1)):
    *    linear in f, the way real corpora behave, which keeps the
    *    shingle/signature space from saturating (the r15 sf100
    *    boundary: the FIXED 31-word vocab capped possible 3-shingles
    *    at 29.8k under 5M docs and banding itself went quadratic).
    *  - **Cross-replica similarity decays to noise** — a word keeps
    *    its original form in two given replicas with probability
    *    (1−0.75)² = 1/16, a 3-shingle survives identically in both
    *    with (1/16)³ ≈ 2.4e-4, so even the same base doc in two
    *    replicas shares ~0.01 expected shingles (J ≈ 1e-4): at 6
    *    bands of r=2 the accidental band-collision rate is ~6·J² ≈
    *    1e-7 per cross-replica pair — a few hundred extra candidates
    *    across ALL 2.5e9 same-base-doc replica pairs at f=1000,
    *    structure-linear noise, not a quadratic cluster. */
  private def vocabGrow(vocab: Array[String], i: Int): Map[String, String] = {
    val vocabSet = vocab.toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    vocab.iterator.flatMap { w =>
      val h = md.digest(s"gs-grow:$i:$w".getBytes("UTF-8"))(0) & 0xff
      if (h < (GROW_SELECT_FRAC * 256).toInt) {
        val img = s"$w~$i"
        // injectivity guard (matters only when chaining grow runs):
        // a suffixed image must not equal an existing plain word
        require(!vocabSet.contains(img),
          s"grow-mode image '$img' collides with an existing vocab word")
        Some(w -> img)
      } else None
    }.toMap
  }

  private def scaleDocuments(spark: SparkSession, src: String, dst: String,
      f: Int, vocabMode: String): Unit = {
    // repartition BEFORE the crossJoin (r16): the fixture input is a
    // single parquet file = ONE partition, and a broadcast crossJoin
    // preserves that — so at f=1000 the whole 5M-doc text rewrite ran
    // as a single task on one core. 32-way input ⇒ 32-way rewrite.
    val d = spark.read.parquet(s"$src/documents.parquet")
      .repartition(OUT_SHARDS)
    val span = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val rep = broadcast(reps(spark, f))
    val textExpr = vocabMode match {
      case "perm" =>
        // legacy: per-replica vocabulary permutation via a broadcast
        // map. The corpus vocabulary is small by construction
        // (FIXTURES.md — 31 shared data-engineering terms), so the
        // f−1 bijections fit one literal map keyed by "rep:word".
        // NOTE the literal-map lookup is a linear scan per token —
        // fine at 31·f entries, which is why grow mode (unbounded
        // vocab) uses closed-form arithmetic instead.
        val vocab = d.select(explode(split(col("text"), " ")).as("w"))
          .distinct().collect().map(_.getString(0)).sorted
        val lookup: Map[String, String] =
          (1 until f).flatMap { i =>
            vocabPerm(vocab, i).map { case (w, w2) => s"$i:$w" -> w2 }
          }.toMap
        val lookupCol = typedlit(lookup)
        array_join(
          transform(split(col("text"), " "),
            w => coalesce(
              element_at(lookupCol, concat(col("_rep").cast("string"), lit(":"), w)),
              w)),
          " ")
      case "grow" =>
        // vocab ∝ corpus, NO map (r16): selection and image are
        // closed-form md5 arithmetic per (word, replica) — the exact
        // function [[vocabGrow]] specifies (identical md5 input
        // string, identical byte threshold), evaluated inside codegen
        // instead of via an O(|vocab·f|) literal-map scan per token.
        // The r15-style map path rewrote 5M docs in hours on one
        // core; this is minutes on 32.
        val guard = d.filter(col("text").contains("~")).limit(1).count()
        require(guard == 0L,
          "grow mode requires a base corpus whose words contain no '~' " +
            "(chain by regenerating from the fixture at a larger factor)")
        array_join(
          transform(split(col("text"), " "), w =>
            when(conv(substring(md5(concat(lit("gs-grow:"),
                col("_rep").cast("string"), lit(":"), w)), 1, 2), 16, 10)
                .cast("int") < lit((GROW_SELECT_FRAC * 256).toInt),
              concat(w, lit("~"), col("_rep").cast("string")))
              .otherwise(w)),
          " ")
      case other => throw new IllegalArgumentException(
        s"vocabMode must be perm or grow, got '$other'")
    }
    d.crossJoin(rep)
      .withColumn("doc_id", col("doc_id") + col("_rep").cast("long") * span)
      .withColumn("text",
        when(col("_rep") === 0, col("text")).otherwise(textExpr))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_rep")
      .pipe(d => writeSharded(d, s"$dst/documents.parquet"))
  }

  /** Signed permutation (orthogonal transform) of the DIM dims. */
  private def signedPerm(vec: Column, i: Int): Column = {
    val rnd = new scala.util.Random(77L * 1000003L + i)
    val perm = rnd.shuffle((0 until DIM).toVector)
    val signs = Vector.fill(DIM)(if (rnd.nextBoolean()) 1f else -1f)
    array((0 until DIM).map(j =>
      element_at(vec, perm(j) + 1) * lit(signs(j))): _*)
  }

  private def scaleEmbeddings(spark: SparkSession, src: String, dst: String, f: Int): Unit = {
    val e = spark.read.parquet(s"$src/embeddings.parquet")
      .repartition(OUT_SHARDS) // single-file source → parallel rewrite
    val span = e.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val rep = broadcast(reps(spark, f))
    // Per-replica transform: f ≤ MAX_PERM_REPLICAS keeps the seeded
    // SIGNED PERMUTATION (a CASE branch per replica — bit-compatible
    // with every prior generated dataset); above it the branch chain
    // itself becomes the bottleneck (a 999-way CASE over 64-wide
    // arrays defeats codegen), so large f switches to a closed-form
    // deterministic SIGN FLIP per (replica, dim) — a diagonal ±1
    // matrix, still orthogonal: within-replica dot products and norms
    // are preserved EXACTLY (signs cancel pairwise) while
    // cross-replica cosines become ~N(0, Σv_j⁴) noise, the same
    // structural contract as the permutation.
    val vecExpr =
      if (f <= MAX_PERM_REPLICAS)
        (1 until f).foldLeft(
            when(col("_rep") === 0, col("embedding"))) { (acc, i) =>
          acc.when(col("_rep") === i, signedPerm(col("embedding"), i))
        }
      else
        when(col("_rep") === 0, col("embedding")).otherwise(expr(
          "transform(embedding, (x, j) -> IF(CAST(conv(substring(md5(" +
            "concat('gs-emb:', CAST(_rep AS STRING), ':', CAST(j AS STRING))" +
            "), 1, 2), 16, 10) AS INT) < 128, x, -x))"))
    e.crossJoin(rep)
      .withColumn("vec_id", col("vec_id") + col("_rep").cast("long") * span)
      .withColumn("embedding", vecExpr)
      .drop("_rep")
      .pipe(d => writeSharded(d, s"$dst/embeddings.parquet"))
  }

  /** Above this factor [[scaleEmbeddings]] switches from the per-
    * replica signed permutation (CASE chain) to the closed-form sign
    * flip — see the comment at the switch. */
  val MAX_PERM_REPLICAS = 128

  /** `vocabMode` governs how replica texts are rewritten (documents
    * table only — every other table is mode-independent):
    * `perm` (legacy) keeps the source vocabulary and shuffles it per
    * replica — fine through sf10, but a FIXED vocab saturates the
    * shingle space around sf100 (the r15 boundary); `grow` suffixes a
    * hash-selected 3/4 of words per replica so vocabulary scales with
    * the corpus like real text does — see [[vocabGrow]]. */
  val ALL_TABLES: Set[String] = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def generate(spark: SparkSession, src: String, dst: String, f: Int,
      vocabMode: String = "perm", tables: Set[String] = ALL_TABLES): Unit = {
    require(f >= 1, s"factor must be >= 1 (got $f)")
    require(tables.subsetOf(ALL_TABLES),
      s"unknown tables: ${tables -- ALL_TABLES}")
    def want(t: String) = tables.contains(t)
    if (want("region")) copyTable(spark, src, dst, "region")
    if (want("nation")) copyTable(spark, src, dst, "nation")
    if (want("customer")) writeSharded(shifted(spark.read.parquet(s"$src/customer.parquet"), f,
      Seq("c_custkey")), s"$dst/customer.parquet")
    if (want("supplier")) writeSharded(shifted(spark.read.parquet(s"$src/supplier.parquet"), f,
      Seq("s_suppkey")), s"$dst/supplier.parquet")
    if (want("part")) writeSharded(shifted(spark.read.parquet(s"$src/part.parquet"), f,
      Seq("p_partkey")), s"$dst/part.parquet")
    // FK consistency: orders and lineitem shift each key by ITS OWN
    // parent's span, computed from the parent table. LAZY (r16b): a
    // table-subset run (resume, or a docs-only regen for a dedup
    // probe) must not require the unrelated parent tables to exist in
    // the source dir.
    val spark0 = spark
    lazy val custSpan = spark0.read.parquet(s"$src/customer.parquet")
      .agg(max(col("c_custkey"))).head.getLong(0) + 1L
    lazy val ordSpan = spark0.read.parquet(s"$src/orders.parquet")
      .agg(max(col("o_orderkey"))).head.getLong(0) + 1L
    lazy val partSpan = spark0.read.parquet(s"$src/part.parquet")
      .agg(max(col("p_partkey"))).head.getLong(0) + 1L
    lazy val suppSpan = spark0.read.parquet(s"$src/supplier.parquet")
      .agg(max(col("s_suppkey"))).head.getLong(0) + 1L
    val rep = broadcast(reps(spark, f))
    if (want("orders")) spark.read.parquet(s"$src/orders.parquet")
      .repartition(OUT_SHARDS).crossJoin(rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("_rep").cast("long") * ordSpan)
      .withColumn("o_custkey", col("o_custkey") + col("_rep").cast("long") * custSpan)
      .drop("_rep")
      .pipe(d => writeSharded(d, s"$dst/orders.parquet"))
    if (want("lineitem")) spark.read.parquet(s"$src/lineitem.parquet")
      .repartition(OUT_SHARDS).crossJoin(rep)
      .withColumn("l_orderkey", col("l_orderkey") + col("_rep").cast("long") * ordSpan)
      .withColumn("l_partkey", col("l_partkey") + col("_rep").cast("long") * partSpan)
      .withColumn("l_suppkey", col("l_suppkey") + col("_rep").cast("long") * suppSpan)
      .drop("_rep")
      .pipe(d => writeSharded(d, s"$dst/lineitem.parquet"))
    // events: keep raw schema AS THE DRIVER WROTE IT (µs timestamps) —
    // readers go through Tables.events either way
    if (want("events")) {
      val ev = spark.read.parquet(s"$src/events.parquet")
        .repartition(OUT_SHARDS)
      val evSpan = ev.agg(max(col("event_id"))).head.getLong(0) + 1L
      val userSpan = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
      ev.crossJoin(rep)
        .withColumn("event_id", col("event_id") + col("_rep").cast("long") * evSpan)
        .withColumn("user_id", col("user_id") + col("_rep").cast("long") * userSpan)
        .drop("_rep")
        .pipe(d => writeSharded(d, s"$dst/events.parquet"))
    }
    if (want("documents")) scaleDocuments(spark, src, dst, f, vocabMode)
    if (want("embeddings")) scaleEmbeddings(spark, src, dst, f)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val f = args.lift(2).map(_.toInt).getOrElse(10)
    val vocabMode = args.lift(3).getOrElse("perm")
    val tables = args.lift(4).map(_.split(",").map(_.trim).toSet)
      .getOrElse(ALL_TABLES)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.setEventsReadConfs(spark)
    val t0 = System.nanoTime()
    generate(spark, src, dst, f, vocabMode, tables)
    println(f"GenScale: $src x$f ($vocabMode) -> $dst in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
