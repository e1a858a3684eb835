package graft.api

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fused IVF-PQ index — the canonical billion-vector layout: PQ codes
  * stored INSIDE each IVF cell partition, so a probe reads only the
  * probed cells' codes. This is what [[IvfIndex]] (full vectors per
  * cell) and [[PqIndex]] (one flat codes table) compose toward but
  * individually miss: PqIndex.query's `restrictTo` semi-join still
  * scans the full codes table's row groups to filter it; here the
  * cell directories themselves bound the ADC scan.
  *
  * Layout:
  * {{{
  *   indexDir/meta/v<N>/centroids   (cell, center)        — coarse quantizer
  *   indexDir/meta/v<N>/codebooks   (subspace, code, center)
  *   indexDir/meta/v<N>/props       (residual flag, cells dir)
  *   indexDir/cells/v<N>/cell=<c>/  (vec_id, embedding, codes)
  * }}}
  *
  * Centroids, codebooks AND the cells dir they pair with publish
  * TOGETHER as one [[Versioned]] commit: ADC against a codebook from
  * a different build than the codes is silently wrong, so the trio
  * must flip atomically — including across a REBUILD, which writes a
  * fresh `cells/v<N>` and never touches the previous version's
  * files. The
  * cell files carry both the PQ codes and the original embedding as
  * sibling COLUMNS: parquet is columnar, so the ADC scan reads only
  * the codes bytes of probed cells (column pruning — plan-asserted
  * in IvfPqSuite) and the exact re-rank reads the embedding bytes of
  * probed cells only for the shortlist join.
  *
  * Codes encode the RAW vector by default; `residual = true` at
  * build time switches to the classic IVF-PQ residual encoding
  * (Jégou et al.): codes quantize `x − centroid(cell)`, which
  * concentrates the codebooks on the within-cell geometry and buys
  * ADC resolution when cells are tight. The trade is operational:
  * raw codes are independent of cell assignment — `splitCell` only
  * re-routes rows (codes unchanged) and `add` never needs a cell's
  * centroid — while residual codes tie to their cell, so `splitCell`
  * RE-ENCODES the split cell's rows (still O(one cell)) and the
  * query computes its ADC lookup table per (query, probed cell).
  * The flag persists in the meta version (`props`), so readers and
  * later mutations can never mix the two encodings.
  *
  * Query cost at scale: nProbe/k of the corpus' CODE bytes (m
  * byte-packed codes per vector — 64-dim float32 at m=8 is 32×
  * smaller), plus the shortlist's embeddings. Nothing touches
  * unprobed cells.
  */
object IvfPqIndex {

  private def metaPath(dir: String) = s"$dir/meta"

  private case class Meta(centers: Array[(Int, Array[Double])],
      books: Map[(Int, Int), Array[Double]],
      booksSeq: Seq[(Int, Int, Seq[Double])],
      residual: Boolean,
      cellsDir: String) {
    val m: Int = books.keys.map(_._1).max + 1
    val k: Int = books.keys.map(_._2).max + 1
    val sub: Int = books((0, 0)).length
    def cellsPath(indexDir: String): String = s"$indexDir/$cellsDir"
  }

  private def loadMetaOpt(spark: SparkSession, indexDir: String): Option[Meta] =
    Versioned.current(spark, metaPath(indexDir)).map(_ => loadMeta(spark, indexDir))

  /** True when `indexDir` holds a committed meta version — the
    * probe-tooling reuse gate (mirrors [[NeighborGraphAnn.hasIndex]]).
    */
  def hasIndex(spark: SparkSession, indexDir: String): Boolean =
    Versioned.current(spark, metaPath(indexDir)).isDefined

  private def loadMeta(spark: SparkSession, indexDir: String): Meta = {
    val vdir = Versioned.current(spark, metaPath(indexDir)).getOrElse(
      throw new IllegalStateException(s"no committed IVF-PQ index under $indexDir"))
    val booksSeq = spark.read.parquet(s"$vdir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .toSeq.sortBy(t => (t._1, t._2))
    val props = spark.read.parquet(s"$vdir/props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    Meta(IvfIndex.readCenters(spark, s"$vdir/centroids"),
      booksSeq.map(t => ((t._1, t._2), t._3.toArray)).toMap, booksSeq,
      props.get("residual").contains("true"),
      props.getOrElse("cellsDir", "cells"))
  }

  /** The meta version owns its cells dir (`props.cellsDir`), so a
    * REBUILD writes a fresh `cells/v<N>` and flips to it atomically
    * with the new codebooks: a crash mid-rebuild, or a reader holding
    * the previous meta, keeps pairing the OLD codebooks with the OLD
    * codes — new codes against old codebooks (silently wrong ADC) can
    * never be observed. In-place mutations (`add`, `splitCell`) write
    * inside the current version's cells dir and don't bump it.
    */
  private def publishMeta(spark: SparkSession, indexDir: String,
      centers: Seq[(Int, Seq[Double])], books: Seq[(Int, Int, Seq[Double])],
      residual: Boolean, cellsDir: String): Unit = {
    val sess = spark
    import sess.implicits._
    Versioned.publish(spark, metaPath(indexDir)) { vdir =>
      centers.sortBy(_._1).toDF("cell", "center")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/centroids")
      books.toDF("subspace", "code", "center")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/codebooks")
      Seq(("residual", residual.toString), ("cellsDir", cellsDir))
        .toDF("key", "value")
        .repartition(1).write.mode("overwrite").parquet(s"$vdir/props")
    }
  }

  /** GC superseded cells versions: everything under `cells/` except
    * the dirs in `keep` (the newly published one and the one the
    * PREVIOUS meta pointed at, retained for in-flight readers). Keyed
    * by dir membership, NOT by version arithmetic — meta versions
    * advance on splits without bumping the cells dir, so "delete
    * v < n-1" would delete the live previous dir.
    */
  private def gcCellVersions(spark: SparkSession, indexDir: String,
      keep: Set[String]): Unit = {
    val fs = Versioned.fs(spark, s"$indexDir/cells")
    val root = new org.apache.hadoop.fs.Path(s"$indexDir/cells")
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.matches("v\\d+") && !keep(s"cells/${p.getName}"))
      .foreach(p => fs.delete(p, true))
  }

  /** Drop cell dirs the committed meta does not route to — the
    * leftovers of a splitCell that crashed between its meta publish
    * and its old-dir delete. Probes never touch them (no centroid
    * routes there), but cellSizes/rebalance must not see them, and
    * they are dead bytes. Single-writer maintenance, like the split
    * itself.
    */
  private def sweepOrphanCells(spark: SparkSession, cellsPath: String,
      meta: Meta): Unit = {
    val fs = Versioned.fs(spark, cellsPath)
    val root = new org.apache.hadoop.fs.Path(cellsPath)
    if (!fs.exists(root)) return
    val live = meta.centers.map(_._1).toSet
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("cell=") &&
        !live(p.getName.stripPrefix("cell=").toInt))
      .foreach(p => fs.delete(p, true))
  }

  /** x − centroid(cell), as array<float> — the residual the PQ
    * codebooks quantize when `residual = true`. */
  private def residualUdf(centers: Array[(Int, Array[Double])]) = {
    val byCell = centers.toMap
    udf((a: Seq[Float], cell: Int) => {
      val c = byCell(cell)
      Array.tabulate(a.length)(i => (a(i) - c(i)).toFloat)
    })
  }

  /** Train the coarse quantizer and the PQ codebooks, then lay the
    * corpus out as cell partitions of (vec_id, embedding, codes).
    * `embeddings` needs (vec_id: long, embedding: array<float>); dim
    * must be divisible by `m`.
    *
    * @param kCells coarse-quantizer cell count; 0 (the default)
    *        auto-sizes to [[IvfIndex.defaultCells]] (~√n) — the r18
    *        probe measured fixed-16 at 2M: nProbe/16 of the corpus'
    *        codes ADC-scanned per query (see BASELINE.md r18).
    * @param trainSampleMod both KMeans fits (coarse and per-subspace)
    *        train on vectors with hash(vec_id) % mod == 0 — training
    *        cost must not scale with the corpus; assignment and
    *        encoding below always cover every vector.
    */
  def build(spark: SparkSession, embeddings: DataFrame, indexDir: String,
      kCells: Int = 0, m: Int = 8, kSub: Int = 16, seed: Long = 42L,
      trainSampleMod: Int = 1, residual: Boolean = false): Unit = {
    require(trainSampleMod >= 1, s"trainSampleMod must be >= 1 (got $trainSampleMod)")
    require(kCells >= 0, s"kCells must be >= 0 (0 = auto ~sqrt(n)) (got $kCells)")
    // kSub > 256 would silently truncate in the byte encoder — the
    // same guard PqIndex.build enforces
    require(m > 0 && kSub > 1 && kSub <= 256,
      s"need m > 0, 1 < kSub <= 256 (byte-packed codes) (got $m, $kSub)")
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feat = embeddings.select(col("vec_id"), col("embedding"),
      toVec(col("embedding")).as("features"))
    val train =
      if (trainSampleMod == 1) feat
      else feat.filter(pmod(hash(col("vec_id")), lit(trainSampleMod)) === 0)
    // auto sizing clamps to the TRAINING sample (KMeans needs
    // k <= points); defaultCells is driven by the full corpus size
    val kEff = if (kCells > 0) kCells
      else math.min(IvfIndex.defaultCells(embeddings.count()).toLong,
        math.max(2L, train.count())).toInt
    val coarse = new KMeans().setK(kEff).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell").fit(train)
    val centers = coarse.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    // the encoder's input: the raw vector, or its residual to the
    // assigned cell's centroid — codebooks train on the SAME signal
    // (the sample's residuals come from the same quantizer)
    def encodeInput(df: DataFrame): DataFrame = {
      val assigned = coarse.transform(df)
      if (!residual) assigned
      else assigned.withColumn("_enc",
        residualUdf(centers)(col("embedding"), col("cell")))
    }
    val encCol = if (residual) col("_enc") else col("embedding")
    val books = PqIndex.trainBooks(
      encodeInput(train).select(encCol.as("embedding")), m, kSub, sub, seed)
    val encode = PqIndex.encodeUdf(books, m, sub)
    // cells land in a FRESH version-owned dir, then the meta commit
    // flips codebooks and cells dir together: a rebuild over an
    // existing index never lets any reader (or a crash) pair new
    // codes with old codebooks. The previous version's cells are
    // retained for in-flight readers, older ones GC'd — mirroring
    // Versioned's retention.
    val fs = Versioned.fs(spark, metaPath(indexDir))
    val prevCellsDir = loadMetaOpt(spark, indexDir).map(_.cellsDir)
    val n = Versioned.committed(fs, metaPath(indexDir)).lastOption.getOrElse(0L) + 1
    val cellsDir = s"cells/v$n"
    val cellsAbs = s"$indexDir/$cellsDir"
    val stale = new org.apache.hadoop.fs.Path(cellsAbs)
    if (fs.exists(stale)) fs.delete(stale, true) // partial from a crashed attempt
    encodeInput(feat)
      .select(col("vec_id"), col("embedding"),
        encode(encCol).as("codes"), col("cell"))
      // one file per cell (see IvfIndex.build): W tasks × k cells of
      // small files add a flat listing/open cost to EVERY probe —
      // measured r18 at 2M/1414 cells (BASELINE.md r18)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(cellsAbs)
    // probe stats are keyed by cell id; a rebuild renumbers cells, so
    // carried-over counts would misattribute — reset the log BEFORE the
    // meta flip: a crash in between loses only advisory stats, whereas
    // deleting after the publish leaves a window where old traffic is
    // pinned on unrelated new cells
    val statsP = new org.apache.hadoop.fs.Path(statsPath(indexDir))
    if (fs.exists(statsP)) fs.delete(statsP, true)
    publishMeta(spark, indexDir,
      centers.toSeq.map { case (i, c) => (i, c.toSeq) }, books, residual, cellsDir)
    gcCellVersions(spark, indexDir, Set(cellsDir) ++ prevCellsDir)
  }

  /** Append new vectors: assign to the nearest EXISTING centroid and
    * encode with the EXISTING codebooks — growth with no retrain, no
    * rewrite, no meta change (re-`build` when drift degrades recall).
    */
  def add(spark: SparkSession, newVectors: DataFrame, indexDir: String): Unit = {
    val meta = loadMeta(spark, indexDir)
    val assign = IvfIndex.nearestCells(meta.centers, 1)
    val encode = PqIndex.encodeUdf(meta.booksSeq, meta.m, meta.sub)
    val assigned = newVectors.select(col("vec_id"), col("embedding"),
      assign(col("embedding")).getItem(0).as("cell"))
    val encCol =
      if (meta.residual) residualUdf(meta.centers)(col("embedding"), col("cell"))
      else col("embedding")
    assigned.select(col("vec_id"), col("embedding"),
        encode(encCol).as("codes"), col("cell"))
      .repartition(col("cell")) // one file per touched cell per batch
      .write.mode("append").partitionBy("cell").parquet(meta.cellsPath(indexDir))
  }

  /** Per-cell inverted-list sizes (one metadata-cheap aggregate),
    * restricted to the cells the committed meta routes to. */
  def cellSizes(spark: SparkSession, indexDir: String): Map[Int, Long] = {
    val meta = loadMeta(spark, indexDir)
    val live = meta.centers.map(_._1).toSeq
    spark.read.parquet(meta.cellsPath(indexDir))
      .filter(col("cell").isin(live: _*)) // partition-pruned; skips orphans
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** Split ONE hot cell in place — same ordering and crash story as
    * [[IvfIndex.splitCell]] (write fresh cell dirs → publish meta →
    * drop the orphan; single-writer). With raw codes the split only
    * RE-ROUTES rows (codes ride along unchanged); with residual codes
    * the moved rows RE-ENCODE against their new half's centroid —
    * still O(one cell), same codebooks.
    */
  def splitCell(spark: SparkSession, indexDir: String, cell: Int,
      seed: Long = 42L): Unit = {
    val meta = loadMeta(spark, indexDir)
    require(meta.centers.exists(_._1 == cell), s"no such cell $cell")
    val cells = meta.cellsPath(indexDir)
    // sweep first: removes BOTH a previous split's orphaned old dir
    // (crash between publish and delete) and this split's stale
    // partials from a crashed retry (fresh ids are never in meta)
    sweepOrphanCells(spark, cells, meta)
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    // partition-pruned read: exactly one cell directory
    val cellRows = spark.read.parquet(cells)
      .filter(col("cell") === cell)
      .select(col("vec_id"), col("embedding"), col("codes"),
        toVec(col("embedding")).as("features"))
      .cache()
    val split = new KMeans().setK(2).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("half").fit(cellRows)
    val base = meta.centers.map(_._1).max + 1
    val freshCenters = split.clusterCenters.zipWithIndex
      .map { case (c, i) => (base + i, c.toArray) }
    val rerouted = split.transform(cellRows)
      .withColumn("cell", col("half") + base)
    val withCodes =
      if (!meta.residual) rerouted
      else {
        val encode = PqIndex.encodeUdf(meta.booksSeq, meta.m, meta.sub)
        rerouted.withColumn("codes",
          encode(residualUdf(freshCenters)(col("embedding"), col("cell"))))
      }
    withCodes.select(col("vec_id"), col("embedding"), col("codes"), col("cell"))
      .repartition(col("cell")) // one file per fresh half
      .write.mode("append").partitionBy("cell").parquet(cells)
    publishMeta(spark, indexDir,
      meta.centers.filterNot(_._1 == cell).toSeq.map { case (i, c) => (i, c.toSeq) } ++
        freshCenters.map { case (i, c) => (i, c.toSeq) },
      meta.booksSeq, meta.residual, meta.cellsDir)
    val fs = Versioned.fs(spark, cells)
    val old = new org.apache.hadoop.fs.Path(s"$cells/cell=$cell")
    if (fs.exists(old)) fs.delete(old, true)
    cellRows.unpersist()
  }

  /** OPTIMIZE for the inverted file: every incremental [[add]] lands
    * one parquet file per touched cell per batch, so a streaming
    * ingest fragments the cell dirs. Compaction rewrites the corpus
    * as ONE file per cell into a FRESH `cells/v<N>` and republishes
    * the meta (same centroids/codebooks/flag) pointing at it — the
    * same atomic flip a rebuild uses, so a crash mid-compaction or an
    * in-flight reader keeps the old, complete version. Returns the
    * data-file count before compaction. Single-writer maintenance.
    */
  def compact(spark: SparkSession, indexDir: String): Long = {
    val meta = loadMeta(spark, indexDir)
    val cells = meta.cellsPath(indexDir)
    val fs = Versioned.fs(spark, cells)
    val filesBefore = {
      def walk(p: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(p).map { s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.startsWith("_") ||
            s.getPath.getName.startsWith(".")) 0L
          else 1L
        }.sum
      walk(new org.apache.hadoop.fs.Path(cells))
    }
    val n = Versioned.committed(fs, metaPath(indexDir)).last + 1
    val freshDir = s"cells/v$n"
    val freshAbs = s"$indexDir/$freshDir"
    val stale = new org.apache.hadoop.fs.Path(freshAbs)
    if (fs.exists(stale)) fs.delete(stale, true) // crashed prior attempt
    val live = meta.centers.map(_._1).toSeq
    spark.read.parquet(cells)
      .filter(col("cell").isin(live: _*)) // orphans die with the old version
      .repartition(live.size, col("cell")) // one task -> one file per cell
      .write.mode("overwrite").partitionBy("cell").parquet(freshAbs)
    publishMeta(spark, indexDir,
      meta.centers.toSeq.map { case (i, c) => (i, c.toSeq) },
      meta.booksSeq, meta.residual, freshDir)
    gcCellVersions(spark, indexDir, Set(freshDir, meta.cellsDir))
    compactStats(spark, indexDir) // bound the probe-stats log too
    filesBefore
  }

  /** Split every cell whose list exceeds `factor` × the mean cell
    * size. Returns the cells split. */
  def rebalance(spark: SparkSession, indexDir: String,
      factor: Double = 2.0, seed: Long = 42L): Seq[Int] = {
    val sizes = cellSizes(spark, indexDir)
    if (sizes.isEmpty) return Nil
    val mean = sizes.values.sum.toDouble / sizes.size
    val hot = sizes.filter { case (_, n) => n > factor * mean && n >= 2 }
      .keys.toSeq.sorted
    hot.foreach(c => splitCell(spark, indexDir, c, seed))
    hot
  }

  private def statsPath(dir: String) = s"$dir/stats/probes"

  /** Fallback batch id for non-streaming recordProbes calls: millis
    * disambiguated by an in-process counter, so two ad-hoc calls in
    * the same millisecond get distinct `batch=` dirs instead of the
    * second overwriting the first's stats. */
  private val adhocSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private def adhocId(): Long =
    System.currentTimeMillis() * 1000L + (adhocSeq.getAndIncrement() % 1000L)

  /** Log a query workload's probe routing into the index's stats
    * side-table (`stats/probes/batch=<id>`, one tiny aggregate row per
    * probed cell per call). The serving tier calls this on its query
    * log — e.g. per micro-batch from a `foreachBatch`, passing the
    * STREAMING BATCH ID: each id owns its own `batch=<id>` dir written
    * with overwrite, so a replayed micro-batch REWRITES its own stats
    * instead of double-counting (the same idempotency contract as
    * upsertBatch / StreamDecon batch dirs). Without a `batchId` the
    * call stamps wall-clock millis — still one dir per call, but a
    * replay then duplicates; fine for ad-hoc batch use, not for
    * checkpointed streams. Advisory only: stats never affect query
    * answers, and [[build]] resets them (a rebuild renumbers cells, so
    * carried-over counts would attribute old traffic to unrelated new
    * cells).
    */
  def recordProbes(spark: SparkSession, queries: DataFrame, indexDir: String,
      nProbe: Int = 4, batchId: Option[Long] = None): Unit = {
    val meta = loadMeta(spark, indexDir)
    val probe = IvfIndex.nearestCells(meta.centers, nProbe)
    val id = batchId.getOrElse(adhocId())
    queries.select(explode(probe(col("embedding"))).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_probes"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"${statsPath(indexDir)}/batch=$id")
  }

  /** Accumulated probe counts per LIVE cell (cells retired by a split
    * drop out; their replacement halves start at zero and re-earn
    * their traffic). All-time sums — see [[probeTrafficWeighted]] for
    * the recency-decayed view. */
  def probeTraffic(spark: SparkSession, indexDir: String): Map[Int, Long] =
    probeTrafficWeighted(spark, indexDir, halfLifeBatches = None)
      .map { case (c, v) => c -> math.round(v) } // exact sums when undecayed

  /** Probe counts per live cell, optionally decayed by RECENCY so a
    * historical hotspot doesn't keep out-scoring current traffic:
    * with `halfLifeBatches = Some(h)`, a count recorded r batches ago
    * (r = rank of its `batch=` id among all recorded ids, newest = 0)
    * is weighted 0.5^(r/h). Rank-based, not id-difference-based, so
    * stream batch ids (0,1,2,…) and wall-clock millis decay on the
    * same scale: one recordProbes call = one tick.
    */
  def probeTrafficWeighted(spark: SparkSession, indexDir: String,
      halfLifeBatches: Option[Double]): Map[Int, Double] = {
    val fs = Versioned.fs(spark, statsPath(indexDir))
    if (!fs.exists(new org.apache.hadoop.fs.Path(statsPath(indexDir)))) return Map.empty
    val live = loadMeta(spark, indexDir).centers.map(_._1).toSet
    val df = spark.read.parquet(statsPath(indexDir))
    val weighted = halfLifeBatches match {
      case None => df.withColumn("w", col("n_probes").cast("double"))
      case Some(h) =>
        require(h > 0, s"halfLifeBatches must be > 0 (got $h)")
        // planning-scale metadata fetch: one distinct id per
        // recordProbes call, bounded by compactStats
        val ids = df.select(col("batch").cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted.reverse
        val rank = typedlit(ids.zipWithIndex.map { case (id, r) => id -> r }.toMap)
        df.withColumn("w", col("n_probes") *
          pow(lit(0.5), element_at(rank, col("batch").cast("long")) / h))
    }
    weighted.groupBy(col("cell")).agg(sum(col("w")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
      .filter { case (c, _) => live(c) }.toMap
  }

  /** Bound the stats log: one `batch=` dir accrues per
    * [[recordProbes]] call, so a long-lived serving tier accumulates
    * small files without bound. Collapse every dir older than the
    * newest `keepRecent` into ONE dir re-stamped at the OLDEST
    * collapsed id — old traffic stays maximally old, so decayed views
    * only ever UNDER-weight collapsed history, never promote it —
    * dropping rows for retired cells on the way (their live-view
    * filter becomes physical). Advisory data, single-writer
    * maintenance: a crash between delete and rewrite loses only the
    * collapsed slice. Called from [[compact]]; harmless standalone.
    */
  def compactStats(spark: SparkSession, indexDir: String,
      keepRecent: Int = 16): Unit = {
    val sp = statsPath(indexDir)
    val fs = Versioned.fs(spark, sp)
    if (!fs.exists(new org.apache.hadoop.fs.Path(sp))) return
    val ids = fs.listStatus(new org.apache.hadoop.fs.Path(sp))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).sorted
    if (ids.length <= keepRecent + 1) return
    val oldIds = ids.dropRight(keepRecent)
    val live = loadMeta(spark, indexDir).centers.map(_._1).toSeq
    // tiny aggregate (≤ one row per live cell) — collect, then rewrite
    val collapsed = spark.read.option("basePath", sp)
      .parquet(oldIds.map(id => s"$sp/batch=$id"): _*)
      .filter(col("cell").isin(live: _*))
      .groupBy(col("cell")).agg(sum(col("n_probes")).as("n_probes"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    oldIds.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$sp/batch=$id"), true))
    if (collapsed.nonEmpty) {
      import spark.implicits._
      collapsed.toDF("cell", "n_probes").repartition(1)
        .write.mode("overwrite").parquet(s"$sp/batch=${oldIds.min}")
    }
  }

  /** [[query]] + [[recordProbes]] in one call — the serving-tier
    * shape: answer the batch AND log its routing so
    * [[rebalanceByTraffic]] sees real traffic. The stats write is one
    * tiny eager aggregate over the (small) query batch; the returned
    * probe plan stays lazy. */
  def queryAndRecord(spark: SparkSession, queries: DataFrame, indexDir: String,
      nProbe: Int = 4, topK: Int = 5, shortlist: Int = 0,
      broadcastQueries: Boolean = true, batchId: Option[Long] = None): DataFrame = {
    recordProbes(spark, queries, indexDir, nProbe, batchId)
    query(spark, queries, indexDir, nProbe, topK, shortlist, broadcastQueries)
  }

  /** Traffic-weighted rebalance: split the cells that dominate the
    * workload's SCAN cost, not merely the biggest ones. A probe of
    * cell c costs |c| code rows, so c's share of total ADC work is
    * probes(c) × size(c) — a mid-size cell a hot query region hammers
    * outweighs a giant cell nobody visits, and splitting the cold
    * giant (what size-based [[rebalance]] does) buys the workload
    * nothing. Splits every cell whose load exceeds `factor` × the
    * mean load; zero-traffic cells never split. Returns the cells
    * split.
    *
    * `halfLifeBatches` applies [[probeTrafficWeighted]]'s recency
    * decay, so a cell that WAS hammered many batches ago but is cold
    * now stops qualifying — without it, a big historical spike
    * out-scores live traffic forever and keeps splitting an idle
    * cell (IvfPqSuite pins both behaviors).
    */
  def rebalanceByTraffic(spark: SparkSession, indexDir: String,
      factor: Double = 2.0, seed: Long = 42L,
      halfLifeBatches: Option[Double] = None): Seq[Int] = {
    val sizes = cellSizes(spark, indexDir)
    if (sizes.isEmpty) return Nil
    val traffic = probeTrafficWeighted(spark, indexDir, halfLifeBatches)
    val load = sizes.map { case (c, n) => c -> n.toDouble * traffic.getOrElse(c, 0.0) }
    val total = load.values.sum
    if (total == 0.0) return Nil // no recorded traffic: nothing is hot
    val mean = total / load.size
    val hot = load.filter { case (c, l) => l > factor * mean && sizes(c) >= 2 }
      .keys.toSeq.sorted
    hot.foreach(c => splitCell(spark, indexDir, c, seed))
    hot
  }

  /** Top-k cosine neighbors per query: probe nProbe cells, ADC-scan
    * ONLY those cells' codes (the native codegen `pq_adc` expression
    * over byte-packed codes — no UDF on the corpus side), exact
    * `fvec_dot` re-rank of the per-query
    * shortlist against the probed cells' embeddings. Returns
    * (qid, rn, nid, cos_sim), self-matches excluded.
    *
    * `broadcastQueries` picks the same two regimes as
    * [[IvfIndex.query]]: broadcast + dynamic partition pruning for
    * interactive batches; a shuffled cell join for bulk batches.
    */
  def query(spark: SparkSession, queries: DataFrame, indexDir: String,
      nProbe: Int = 4, topK: Int = 5, shortlist: Int = 0,
      broadcastQueries: Boolean = true): DataFrame = {
    graft.functions.FloatVecDot.register(spark)
    graft.functions.PqAdc.register(spark)
    // shortlist 0 = auto 40·topK: the r18 2M probe measured the old
    // fixed 50 (10·topK) CUTTING true rank-3..5 neighbors out of the
    // ADC shortlist (recall@5 0.72), while 40·topK restores 0.988 at
    // the SAME latency (7.8 vs 8.4 ms/query at batch 800) — the
    // shortlist is candidates per query, so its cost is corpus-size-
    // independent and the deeper default is free at any scale
    val slEff = if (shortlist > 0) shortlist else 40 * topK
    val meta = loadMeta(spark, indexDir)
    val probe = IvfIndex.nearestCells(meta.centers, nProbe)
    val lut = PqIndex.lutUdf(meta.books, meta.m, meta.k, meta.sub)
    // raw codes: one LUT per query row, computed BEFORE the probe
    // explode. Residual codes: the LUT is per (query, cell) — the
    // codebooks quantized x − centroid(cell), so the query shifts by
    // the same centroid; still only nProbe tiny UDF calls per query.
    val q =
      if (!meta.residual) queries
        .select(col("qid"), col("embedding").as("qe"), lut(col("embedding")).as("lut"),
          explode(probe(col("embedding"))).as("cell"))
      else queries
        .select(col("qid"), col("embedding").as("qe"),
          explode(probe(col("embedding"))).as("cell"))
        .withColumn("lut", lut(residualUdf(meta.centers)(col("qe"), col("cell"))))
    val qSide = if (broadcastQueries) broadcast(q) else q
    // ADC side reads (cell, vec_id, codes) — column pruning drops the
    // embedding bytes from the probed cells' scan (suite-asserted)
    val codes = spark.read.parquet(meta.cellsPath(indexDir))
      .select(col("cell"), col("vec_id").as("nid"), col("codes"))
    val short = qSide.join(codes, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("adc_dist", expr("pq_adc(codes, lut)"))
      .withColumn("_sr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc_dist"), col("nid"))))
      .filter(col("_sr") <= slEff)
      .select(col("qid"), col("qe"), col("cell"), col("nid"))
    // exact re-rank joins back on (cell, nid): the embedding read is
    // partition-bounded to the probed cells too
    val vecs = spark.read.parquet(meta.cellsPath(indexDir))
      .select(col("cell"), col("vec_id").as("nid"), col("embedding").as("ne"))
    (if (broadcastQueries) broadcast(short) else short)
      .join(vecs, Seq("cell", "nid"))
      .select(col("qid"), col("nid"),
        round(expr("fvec_dot(qe, ne)"), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("rn"), col("nid"), col("cos_sim"))
      .orderBy("qid", "rn")
  }
}
