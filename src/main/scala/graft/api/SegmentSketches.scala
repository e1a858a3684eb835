package graft.api

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-segment distinct sketches + rescan-free overlap
  * algebra — the operational form of the theta row (#126): ONE linear
  * pass builds a KB-sized theta sketch per segment (source, language,
  * date, shard…); after that, EVERY audience/coverage question —
  * pairwise overlap matrices, union coverage of a segment subset,
  * incremental refresh — is pure sketch algebra on the driver, no
  * data rescan. This is how a 100 TB corpus answers "how much do
  * source A and source B overlap in users/URLs/doc hashes" in
  * milliseconds instead of a shuffle.
  *
  * Layout: one parquet table of (segment, sketch bytes, n_rows) at
  * `dir` — segment-count-sized (thousands at most), trivially
  * readable anywhere. [[refresh]] unions NEW data's sketches into the
  * stored ones (theta unions are associative and idempotent-friendly:
  * re-adding the same keys never inflates the estimate), which is the
  * incremental-maintenance property plain `COUNT(DISTINCT)` tables do
  * not have.
  */
object SegmentSketches {

  private def heapify(b: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(b))

  /** One linear pass: per-segment theta sketch of `keyCol` (+ exact
    * row count), written to `dir`. */
  def build(spark: SparkSession, df: DataFrame, segmentCol: String,
      keyCol: String, dir: String,
      nominalEntries: Int = graft.functions.ThetaSketch.DEFAULT_NOMINAL): Unit = {
    graft.functions.ThetaSketch.register(spark)
    df.createOrReplaceTempView("segment_sketch_in")
    spark.sql(
      s"""SELECT $segmentCol AS segment,
         |       theta_sketch_agg($keyCol, $nominalEntries) AS sketch,
         |       COUNT(*) AS n_rows
         |FROM segment_sketch_in GROUP BY $segmentCol""".stripMargin)
      .repartition(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Union new data into the stored sketches (incremental refresh —
    * segments absent so far appear, existing ones grow; re-ingesting
    * already-seen keys is harmless by construction). */
  def refresh(spark: SparkSession, newData: DataFrame, segmentCol: String,
      keyCol: String, dir: String,
      nominalEntries: Int = graft.functions.ThetaSketch.DEFAULT_NOMINAL): Unit = {
    graft.functions.ThetaSketch.register(spark)
    val tmp = dir + ".tmp"
    newData.createOrReplaceTempView("segment_sketch_new")
    val old = spark.read.parquet(dir)
      .select(col("segment"), col("sketch"), col("n_rows"))
    old.createOrReplaceTempView("segment_sketch_old")
    spark.sql(
      s"""SELECT segment, theta_union_agg(sketch) AS sketch,
         |       CAST(SUM(n_rows) AS BIGINT) AS n_rows
         |FROM (
         |  SELECT segment, sketch, n_rows FROM segment_sketch_old
         |  UNION ALL
         |  SELECT $segmentCol AS segment,
         |         theta_sketch_agg($keyCol, $nominalEntries) AS sketch,
         |         COUNT(*) AS n_rows
         |  FROM segment_sketch_new GROUP BY $segmentCol)
         |GROUP BY segment""".stripMargin)
      .repartition(1)
      .write.mode("overwrite").parquet(tmp)
    // overwrite target from tmp (small files; same-FS rename-free
    // copy — the target cannot be read and overwritten in one job)
    spark.read.parquet(tmp).repartition(1)
      .write.mode("overwrite").parquet(dir)
    Versioned.fs(spark, tmp).delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Continuous maintenance: keep the stored sketches current from a
    * STREAMING frame — each micro-batch unions its per-segment
    * sketches into the table ([[build]] bootstraps an absent table).
    * At-least-once delivery needs NO dedup here: a replayed batch
    * re-unions keys the table already holds, and theta union of
    * already-seen keys cannot move the estimate — the sketch is
    * idempotent by construction, which is exactly why sketch tables
    * beat `COUNT(DISTINCT)` materializations for streaming upkeep.
    * n_rows (an advisory ingest counter) CAN double-count on replay;
    * documented, never part of any estimate. */
  def sinkRefresh(df: DataFrame, segmentCol: String, keyCol: String,
      dir: String, checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      nominalEntries: Int = graft.functions.ThetaSketch.DEFAULT_NOMINAL)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val exists = Versioned.fs(spark, dir)
          .exists(new org.apache.hadoop.fs.Path(dir))
        if (exists) refresh(spark, batch, segmentCol, keyCol, dir, nominalEntries)
        else build(spark, batch, segmentCol, keyCol, dir, nominalEntries)
      }.start()

  /** The stored sketches, heapified driver-side: segment →
    * (sketch, exact ingested row count). Segment-count-sized. */
  def load(spark: SparkSession, dir: String): Map[String, (CompactSketch, Long)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("segment") ->
        (heapify(r.getAs[Array[Byte]]("sketch")), r.getAs[Long]("n_rows")))
      .toMap

  /** All-pairs overlap matrix from the STORED sketches alone — K²
    * driver-side sketch intersections for K segments, zero data
    * access. Rows: (seg_a, seg_b, est_a, est_b, est_union,
    * est_intersect, jaccard_est) for a < b. */
  def overlapMatrix(spark: SparkSession, dir: String): Seq[(String, String, Double, Double, Double, Double, Double)] = {
    val sk = load(spark, dir).toSeq.sortBy(_._1)
    sk.combinations(2).toSeq.map { pair =>
      val (a, (ska, _)) = pair(0)
      val (b, (skb, _)) = pair(1)
      val u = SetOperation.builder().buildUnion().union(ska, skb).getEstimate
      val i = SetOperation.builder().buildIntersection().intersect(ska, skb).getEstimate
      (a, b, ska.getEstimate, skb.getEstimate, u, i, if (u == 0.0) 0.0 else i / u)
    }
  }

  /** Distinct-coverage estimate of a SUBSET of segments (e.g. "how
    * many unique users would these five sources contribute") — one
    * driver-side union chain over the stored sketches. */
  def unionCoverage(spark: SparkSession, dir: String, segments: Seq[String]): Double = {
    val sk = load(spark, dir)
    val u = SetOperation.builder().buildUnion()
    segments.foreach(s => sk.get(s).foreach { case (c, _) => u.union(c) })
    u.getResult.getEstimate
  }
}
