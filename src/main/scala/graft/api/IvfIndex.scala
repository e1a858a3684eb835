package graft.api

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index — the build-once /
  * query-many / grow-incrementally lifecycle that the inline
  * `q_sim_ivf_ann` demo omits:
  *
  *  - `build`: train a seeded KMeans coarse quantizer, persist the
  *    centroids (tiny) and the corpus PARTITIONED BY CELL on disk.
  *    The cell directories ARE the inverted lists: a probe reads
  *    nProbe directories and Spark's partition pruning skips the
  *    rest — at 100 TB a query touches nProbe/k of the corpus bytes,
  *    which is the entire point of IVF (no flag: ProbeSuite asserts
  *    the PartitionFilters in the scan plan).
  *  - `add`: assign NEW vectors to their nearest EXISTING centroid
  *    and append to the corresponding cell directories — index
  *    growth with no retrain, no rewrite of existing lists (the
  *    standard IVF maintenance story; re-`build` when drift degrades
  *    recall).
  *  - `query`: explode each query over its nProbe nearest cells,
  *    join only those cells' lists, exact cosine re-rank (codegen
  *    `fvec_dot`), top-k per query.
  *
  * Centroids ride in a UDF closure (k × dim doubles — broadcast-
  * sized by construction at any corpus scale).
  *
  * REBUILD caveat: the corpus dir is not versioned here (centroids
  * are), so re-running `build` over a live index overwrites cell
  * dirs before the new centroid version commits — run rebuilds into
  * a FRESH indexDir and flip the path at the caller, or use
  * [[IvfPqIndex]], whose meta version owns its cells dir and flips
  * both atomically.
  */
object IvfIndex {

  private def centroidsPath(dir: String) = s"$dir/centroids"
  private def corpusPath(dir: String) = s"$dir/corpus"

  /** n-scaled coarse-quantizer cell count: ~√n, floored at 16.
    *
    * Why not a constant: a FIXED kCells is the same trap the r17
    * entry-probe sweep killed for graph-ANN entry counts — at 2M
    * vectors, nProbe = 4 of 16 cells scans 25% of the corpus per
    * query, and the fraction never improves as the corpus grows. √n
    * keeps both sides of the cost balanced as n scales: the quantizer
    * assignment is O(kCells · dim) per query and the probed lists are
    * O(nProbe · n / kCells) rows, so kCells ≈ √n grows the per-query
    * cost as O(√n) instead of O(n) — the standard IVF sizing (FAISS
    * recommends √n–16√n). Capped at 65536: past that the centroid
    * table stops being comfortably broadcast/UDF-closure sized and a
    * hierarchical quantizer is the right structure instead.
    */
  def defaultCells(n: Long): Int =
    math.min(math.max(16, math.round(math.sqrt(n.toDouble))), 65536L).toInt

  /** Versioned centroid publish (see [[Versioned]]): a mutation in
    * progress (or crashed) is invisible and the previous quantizer
    * stays fully readable, replacing the old delete-then-write
    * overwrite.
    */
  private def publishCenters(spark: SparkSession, indexDir: String,
      centers: Seq[(Int, Seq[Double])]): Unit = {
    val sess = spark
    import sess.implicits._
    Versioned.publish(spark, centroidsPath(indexDir)) { vdir =>
      centers.sortBy(_._1).toDF("cell", "center")
        .repartition(1).write.mode("overwrite").parquet(vdir)
    }
  }

  /** Train the quantizer and lay the corpus out as an inverted file.
    * `embeddings` needs (vec_id: long, embedding: array<float>).
    *
    * @param k coarse-quantizer cell count; 0 (the default) auto-sizes
    *        to [[defaultCells]] (~√n) — a fixed count is only right
    *        when the caller knows the corpus scale won't move (the r18
    *        IVF probe measured fixed-16 at 2M: every probe ADC/exact-
    *        scans nProbe/16 of the corpus — see BASELINE.md r18).
    * @param trainSampleMod quantizer-training sample gate: fit KMeans
    *        on vectors with hash(vec_id) % mod == 0 (deterministic).
    *        1 (default) trains on everything — fine at suite scale; at
    *        corpus scale SET THIS so the sample is ~thousands of
    *        vectors per cell: a coarse quantizer's quality saturates
    *        there, and training must not scale with the corpus. Cell
    *        ASSIGNMENT below always covers every vector.
    */
  def build(spark: SparkSession, embeddings: DataFrame, indexDir: String,
      k: Int = 0, seed: Long = 42L, trainSampleMod: Int = 1): Unit = {
    require(trainSampleMod >= 1, s"trainSampleMod must be >= 1 (got $trainSampleMod)")
    require(k >= 0, s"k must be >= 0 (0 = auto ~sqrt(n)) (got $k)")
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feat = embeddings.select(col("vec_id"), col("embedding"),
      toVec(col("embedding")).as("features"))
    val train =
      if (trainSampleMod == 1) feat
      else feat.filter(pmod(hash(col("vec_id")), lit(trainSampleMod)) === 0)
    // auto sizing clamps to the TRAINING sample (KMeans needs
    // k <= points); defaultCells is driven by the full corpus size
    val kEff = if (k > 0) k
      else math.min(defaultCells(embeddings.count()).toLong,
        math.max(2L, train.count())).toInt
    val model = new KMeans().setK(kEff).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell").fit(train)
    val centers = model.clusterCenters.map(_.toArray)
    publishCenters(spark, indexDir,
      centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
    model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("cell"))
      // one file per cell, not one per (writer task × cell): without
      // this, W tasks × k cells lays down W·k small files — measured
      // r18 at 2M/1414 cells: 45,135 files, and EVERY probe's scan
      // paid a flat ~16 s of listing/open overhead that swamped the
      // pruning win (probe wall flat across batch 50→800). One
      // shuffle at build buys k files and restores probed-bytes-
      // proportional query cost (BASELINE.md r18).
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(corpusPath(indexDir))
  }

  /** True when `indexDir` holds a committed centroid table — the
    * probe-tooling reuse gate (mirrors [[NeighborGraphAnn.hasIndex]]).
    */
  def hasIndex(spark: SparkSession, indexDir: String): Boolean =
    Versioned.current(spark, centroidsPath(indexDir)).isDefined

  private def loadCenters(spark: SparkSession, indexDir: String): Array[(Int, Array[Double])] = {
    val fs = Versioned.fs(spark, centroidsPath(indexDir))
    val path = Versioned.current(spark, centroidsPath(indexDir)) match {
      case Some(vdir) => vdir
      case None if fs.exists(new org.apache.hadoop.fs.Path(centroidsPath(indexDir))) =>
        centroidsPath(indexDir) // pre-versioning flat layout: readable as-is
      case None => throw new IllegalStateException(
        s"no centroid table under ${centroidsPath(indexDir)}")
    }
    readCenters(spark, path)
  }

  private[api] def readCenters(spark: SparkSession, path: String): Array[(Int, Array[Double])] =
    spark.read.parquet(path)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Nearest-cell assignment against the persisted centroids (no
    * retrain); `n` cells per vector, nearest first.
    */
  private[api] def nearestCells(centers: Array[(Int, Array[Double])], n: Int) =
    udf((a: Seq[Float]) => {
      val v = a.map(_.toDouble).toArray
      centers.map { case (i, c) =>
        var d = 0.0; var j = 0
        while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(n).map(_._2)
    })

  /** Append new vectors to the inverted file without retraining.
    * One file per touched cell per batch (same layout rule as
    * [[build]]); a long-lived ingest still fragments across batches —
    * compaction (see [[IvfPqIndex.compact]]) is the maintenance move.
    */
  def add(spark: SparkSession, newVectors: DataFrame, indexDir: String): Unit = {
    val assign = nearestCells(loadCenters(spark, indexDir), 1)
    newVectors.select(col("vec_id"), col("embedding"),
        assign(col("embedding")).getItem(0).as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(corpusPath(indexDir))
  }

  /** Per-cell inverted-list sizes (one metadata-cheap aggregate). */
  def cellSizes(spark: SparkSession, indexDir: String): Map[Int, Long] =
    spark.read.parquet(corpusPath(indexDir))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Split ONE hot cell in place: train a 2-means on the cell's own
    * vectors, retire its centroid, append two fresh-id centroids, and
    * rewrite just that cell's inverted list into the two new cell
    * directories. Nothing outside the split cell is touched — the
    * standard IVF maintenance move when incremental `add` makes a
    * cell hot (a hot cell inflates every probe that lands on it).
    * Cost: O(one cell), never O(index).
    */
  def splitCell(spark: SparkSession, indexDir: String, cell: Int,
      seed: Long = 42L): Unit = {
    val centers = loadCenters(spark, indexDir)
    require(centers.exists(_._1 == cell), s"no such cell $cell")
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    // partition-pruned read: exactly one cell directory
    val cellRows = spark.read.parquet(corpusPath(indexDir))
      .filter(col("cell") === cell)
      .select(col("vec_id"), col("embedding"), toVec(col("embedding")).as("features"))
      .cache()
    val sub = new KMeans().setK(2).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("half").fit(cellRows)
    val base = centers.map(_._1).max + 1
    // Ordering: (1) write the two new cell dirs — no centroid routes
    // there yet, the old cell is still probed as before; (2) publish
    // the centroid table as a FRESH version (readers flip from the
    // old quantizer to the new one at the commit marker and never see
    // a partial table); (3) drop the orphaned old dir. Data-side
    // steps are crash-retryable: a rerun recomputes the same `base`
    // (the committed centroid version is unchanged until step 2) and
    // the fresh-cell dirs are cleared before writing, so no
    // duplicates survive. LIMITATION: a reader that resolved the
    // PREVIOUS centroid version before step 3 probes the now-deleted
    // old cell and quietly misses its vectors until it re-resolves —
    // versioning protects against partial tables, not against the
    // split cell's relocation; run splits from the single writer.
    val fs = new org.apache.hadoop.fs.Path(corpusPath(indexDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(base, base + 1).foreach { c =>
      val p = new org.apache.hadoop.fs.Path(s"${corpusPath(indexDir)}/cell=$c")
      if (fs.exists(p)) fs.delete(p, true) // stale partial from a crashed retry
    }
    val reassigned = sub.transform(cellRows)
      .select(col("vec_id"), col("embedding"), (col("half") + base).as("cell"))
    reassigned.repartition(col("cell")) // one file per fresh half
      .write.mode("append").partitionBy("cell").parquet(corpusPath(indexDir))
    publishCenters(spark, indexDir,
      centers.filterNot(_._1 == cell).map { case (i, c) => (i, c.toSeq) } ++
        sub.clusterCenters.zipWithIndex.map { case (c, i) => (base + i, c.toArray.toSeq) })
    // the old cell dir is dead weight once the centroid table no
    // longer routes probes to it; drop it
    val old = new org.apache.hadoop.fs.Path(s"${corpusPath(indexDir)}/cell=$cell")
    if (fs.exists(old)) fs.delete(old, true)
    cellRows.unpersist()
  }

  /** Split every cell whose inverted list exceeds `factor` × the mean
    * cell size. Returns the cells split. */
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

  /** Top-k cosine neighbors per query, probing nProbe cells.
    * `queries` needs (qid: long, embedding: array<float>); returns
    * (qid, rn, nid, cos_sim) — self-matches (qid == nid) excluded.
    *
    * Two probe-join regimes, chosen by `broadcastQueries`:
    *
    *  - `true` (default — interactive/small batches): the query
    *    batch broadcasts, and dynamic partition pruning drops every
    *    unprobed cell directory from the corpus scan — a probe reads
    *    ~nProbe/k of the corpus bytes (IvfIndexSuite pins the
    *    `dynamicpruning` filter in the plan). Correct while the
    *    batch is broadcast-sized; a forced broadcast of a huge batch
    *    would fail the job.
    *  - `false` (bulk batches, e.g. corpus-vs-corpus linking): plain
    *    shuffled hash join on `cell` — each side shuffles once, no
    *    broadcast-size ceiling. No partition pruning, but a bulk
    *    batch probes essentially every cell anyway, so one full
    *    corpus pass is the optimal plan, and each (query, cell)
    *    probe still joins only that cell's inverted list, never the
    *    cross product. Results are identical (suite-proven).
    */
  def query(spark: SparkSession, queries: DataFrame, indexDir: String,
      nProbe: Int = 4, topK: Int = 5,
      broadcastQueries: Boolean = true): DataFrame = {
    graft.functions.FloatVecDot.register(spark)
    val probe = nearestCells(loadCenters(spark, indexDir), nProbe)
    val corpus = spark.read.parquet(corpusPath(indexDir))
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), col("cell"))
    val q = queries
      .select(col("qid"), col("embedding").as("qe"),
        explode(probe(col("embedding"))).as("cell"))
    (if (broadcastQueries) broadcast(q) else q).join(corpus, "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(expr("fvec_dot(qe, ne)"), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("rn"), col("nid"), col("cos_sim"))
      .orderBy("qid", "rn")
  }
}
