package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}
import graft.queries.MinHashDf

/** STREAMING near-duplicate detection — the continuous-ingestion
  * counterpart of the batch MinHash row (#71): each arriving document
  * is matched against EVERY previously-seen document, in bounded
  * per-key state, emitting (doc, matched earlier doc, estimated
  * similarity). This is the operator a always-on data-ingest pipeline
  * needs: batch dedup re-scans the corpus; this holds only MinHash
  * signatures (96 bytes/doc/band) and answers per micro-batch.
  *
  * Mechanics, all shared arithmetic with #71 (`MinHashDf.A/B/P`):
  *
  *  1. signatures: 12 universal-hash minima over md5-derived 28-bit
  *     shingle hashes — computed as a PURE higher-order-function
  *     projection (`transform`/`array_min`/`aggregate`), no
  *     groupBy, so the same code runs stateless on a stream and
  *     (provably identical) in the batch dual.
  *  2. banding: 6 bands × r=2 → a string band key; the stream is
  *     keyed by band key, so state shards across executors exactly
  *     like the batch band join shuffles — linear, never all-pairs.
  *  3. per-key `transformWithState` ListState holds (id, signature)
  *     of every doc seen in that bucket; a new doc compares against
  *     the bucket's history (est. similarity = matching signature
  *     fraction — the standard unbiased Jaccard estimator) and is
  *     appended. Bucket population is governed by band collision
  *     probability, the same quantity that bounds the batch join.
  *
  * Output is per (pair, band): a pair sharing k bands emits k times
  * (a per-band-key handler cannot see other buckets). Consumers
  * dedup with `dropDuplicates("doc_id","matched_id")` or any
  * aggregation; the suite's batch-equivalence check does exactly
  * that. Within a micro-batch, rows are processed in id order, so
  * same-batch pairs match exactly once (larger id sees smaller).
  *
  * The BATCH DUAL ([[nearDupBatch]]) — same signatures, band
  * self-join, same estimator — is §2B row 124's oracled query: every
  * hash is deterministic integer arithmetic, so DuckDB reproduces
  * the identical matches (same reason #71 is oracle-able).
  */
object NearDupStream {

  val NUM_HASHES: Int = MinHashDf.A.length // 12

  /** (id, sigs: array<bigint>[12]) via HOFs only — stateless, no
    * shuffle, streaming-safe. Docs with < 3 words have no 3-shingles
    * and are dropped (same contract as #71). */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigArray = MinHashDf.A.zip(MinHashDf.B).map { case (a, b) =>
      s"array_min(transform(hs, h -> (${a}L * h + ${b}L) % ${MinHashDf.P}L))"
    }.mkString("array(", ", ", ")")
    df.select(col(idCol).cast("long").as("id"),
        split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("id"), expr(
        "transform(array_distinct(transform(sequence(0, size(ws) - 3), " +
          "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))), " +
          "s -> CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT))").as("hs"))
      .select(col("id"), expr(sigArray).as("sigs"))
  }

  /** (key: "band:v1:v2", id, sigs) — one row per doc per band. */
  private def bandRows(sigs: DataFrame): DataFrame = {
    val keys = (0 until MinHashDf.NUM_BANDS).map(bi =>
      s"concat('$bi', ':', sigs[${2 * bi}], ':', sigs[${2 * bi + 1}])")
    sigs.select(col("id"), col("sigs"),
      explode(expr(keys.mkString("array(", ", ", ")"))).as("key"))
  }

  // not private: Catalyst's generated (de)serializers must access them
  case class BandDoc(key: String, id: Long, sigs: Seq[Long], bt: Long)
  case class NearDupMatch(doc_id: Long, matched_id: Long, band: Int, est_sim: Double)

  /** Per-band-bucket matcher: ListState of every (id, sigs, ingest
    * time) seen in the bucket; new rows (id-ordered within the batch)
    * match against history then append. `ttlMs > 0` bounds state on
    * an UNBOUNDED corpus: entries older than `ttlMs` — by the BATCH
    * timestamp each row carries (`current_timestamp()` is pinned to
    * the micro-batch's own timestamp by streaming execution and
    * persisted in the offset log, so a batch REPLAYED after a failure
    * sees the same clock and expires the same entries —
    * replay-deterministic, unlike executor wall clock). Expiry has
    * two tiers, both on the same pinned batch clock:
    *
    *  - handler-managed (always on when `ttlMs > 0`): the read-time
    *    filter + touch-time compaction give the exact trailing-window
    *    MATCHING semantics — but they only reclaim a bucket when it
    *    is touched again, and on a realistic corpus most band buckets
    *    are touched ONCE (their doc has no near-dup), so COLD-bucket
    *    state still grows with corpus size, not with the window
    *    (measured by the r15 streaming scale probe: 274k state rows
    *    at sf1 with ttl=10s, identical to unbounded).
    *  - store-side `TTLConfig` (`storeTtl = true`): the store itself
    *    evicts expired entries each batch via its expiry index,
    *    reclaiming cold buckets WITHOUT a touch — state becomes
    *    ∝ ingest rate × window, the bound an unbounded stream needs.
    *    This requires `TimeMode.ProcessingTime`, whose forced
    *    TTL-cleanup batches keep the query alive forever: AvailableNow
    *    never terminates and `processAllAvailable` never settles
    *    (measured: 211 empty epochs in 3 min on a 500-doc corpus), so
    *    it is an explicit opt-in for CONTINUOUS queries driven by a
    *    ProcessingTime trigger and stopped by the operator. */
  class NearDupProcessor(minSim: Double, ttlMs: Long = 0L,
      storeTtl: Boolean = false)
      extends StatefulProcessor[String, BandDoc, NearDupMatch] {
    @transient private var seen:
      org.apache.spark.sql.streaming.ListState[(Long, Seq[Long], Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // storeTtl → TTLConfig on the list state: the store's expiry
      // index evicts entries each batch even when their bucket is
      // never touched again (the cold-bucket reclaim the handler
      // filter below cannot do); the handler filter stays as the
      // exact live-subset matching semantics. Requires the
      // ProcessingTime time mode — see the class scaladoc for the
      // termination trade.
      seen = getHandle.getListState[(Long, Seq[Long], Long)]("seen",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long], Long)](),
        if (storeTtl && ttlMs > 0)
          org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[BandDoc],
        tv: TimerValues): Iterator[NearDupMatch] = {
      val band = key.takeWhile(_ != ':').toInt
      val buffered = rows.toSeq
      // batch timestamp (identical on every row of a batch), not wall
      // clock: stable across micro-batch replays
      val now = if (buffered.isEmpty) 0L else buffered.head.bt
      val all = scala.collection.mutable.ArrayBuffer.from(seen.get())
      val history =
        if (ttlMs <= 0) all
        else {
          val live = all.filter { case (_, _, t) => now - t <= ttlMs }
          if (live.length != all.length) { // compact the bucket
            seen.clear()
            live.foreach(seen.appendValue)
          }
          live
        }
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupMatch]
      buffered.sortBy(_.id).foreach { d =>
        history.foreach { case (pid, psigs, _) =>
          if (pid != d.id) {
            val eq = psigs.iterator.zip(d.sigs.iterator).count { case (x, y) => x == y }
            val est = eq.toDouble / NUM_HASHES
            if (est >= minSim)
              out += NearDupMatch(d.id, pid,
                band, math.rint(est * 1e6) / 1e6)
          }
        }
        history += ((d.id, d.sigs, now))
        seen.appendValue((d.id, d.sigs, now))
      }
      out.iterator
    }
  }

  /** The streaming operator: `df` is a STREAMING DataFrame of docs;
    * returns (doc_id, matched_id, band, est_sim) per band-bucket
    * match against all previously-seen docs (Update mode; one row
    * per pair per shared band — see the dedup note above). Assumes
    * ids arrive in increasing order across batches (ingestion order);
    * within a batch, order is handled internally. `ttlMs > 0` caps
    * the MATCHING window at the trailing `ttlMs` (see
    * [[NearDupProcessor]]); 0 (default) keeps every doc, matching the
    * batch dual exactly. `storeTtl = true` additionally bounds the
    * STORE to the same window (cold-bucket eviction via `TTLConfig`)
    * — the required setting for a genuinely unbounded stream, at the
    * cost of a query that only suits continuous ProcessingTime
    * triggers (forced TTL-cleanup batches never let AvailableNow /
    * `processAllAvailable` settle; see the processor scaladoc). */
  def nearDupStream(df: DataFrame, idCol: String, textCol: String,
      minSim: Double = 0.5, ttlMs: Long = 0L,
      storeTtl: Boolean = false): DataFrame = {
    implicit val inEnc = Encoders.product[BandDoc]
    implicit val outEnc = Encoders.product[NearDupMatch]
    implicit val keyEnc = Encoders.STRING
    // bt = the batch timestamp: streaming execution pins
    // current_timestamp() per micro-batch and records it in the
    // offset log, so the TTL clock replays identically
    val typed: Dataset[BandDoc] =
      bandRows(signatures(df, idCol, textCol)).select(
        col("key"), col("id"), col("sigs"),
        unix_millis(current_timestamp()).as("bt")).as[BandDoc]
    // ProcessingTime mode is REQUIRED for TTLConfig (and only then:
    // it makes the engine force empty cleanup batches forever, so it
    // must not leak into the default handler-managed mode)
    typed.groupByKey(_.key)
      .transformWithState(new NearDupProcessor(minSim, ttlMs, storeTtl),
        if (storeTtl && ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
      .toDF("doc_id", "matched_id", "band", "est_sim")
  }

  /** Outcome of [[drainAndStop]]: the (stopped) query handle for
    * progress/state inspection, source rows seen, and the drain wall
    * time (EXCLUDING the grace period — comparable to an AvailableNow
    * run's wall time). */
  case class DrainResult(query: org.apache.spark.sql.streaming.StreamingQuery,
      drained: Long, drainSec: Double)

  /** Clean-shutdown helper for continuous (`storeTtl = true`) near-dup
    * queries over a BOUNDED source (r16, VERDICT r15 Next-round #4).
    *
    * `TTLConfig` requires `TimeMode.ProcessingTime`, whose forced
    * TTL-cleanup batches keep the query alive forever: AvailableNow
    * never terminates and `processAllAvailable` never settles
    * (measured r15: 211 empty epochs / 3 min on a drained source). So
    * a storeTtl deployment that needs to STOP — a backfill, a test, a
    * blue/green handover — was left with a script idiom. This is that
    * idiom productized:
    *
    *  1. register a progress listener BEFORE starting the query (no
    *     early micro-batch can be missed; counts are keyed by runId
    *     so concurrent queries don't pollute the tally),
    *  2. `startQuery()` and wait until the listener has seen
    *     `sourceRows` input rows (the drain; `timeoutMs` bounds it),
    *  3. sleep `graceMs` — forced cleanup batches keep running, and
    *     the store's expiry index evicts every entry older than the
    *     TTL, including cold buckets (set `graceMs` > the query's
    *     `ttlMs` to observe a fully-evicted store),
    *  4. `stop()` and deregister.
    *
    * The returned handle's `lastProgress` reflects the final cleanup
    * batch, so `stateOperators.numRowsTotal` reads the post-eviction
    * state size (0 once grace exceeds the TTL — pinned by
    * StreamingSuite, which also checks the drained output equals the
    * batch dual).
    *
    * @throws java.util.concurrent.TimeoutException if the source has
    *         not drained within `timeoutMs` and `throwOnTimeout` is
    *         true (the default). With `throwOnTimeout = false` a
    *         timed-out drain instead stops the query and returns the
    *         CENSORED result (`drained < sourceRows`, no grace sleep)
    *         — for probes that must record a censored leg and keep
    *         running rather than abort the JVM (ADVICE r17). */
  def drainAndStop(spark: org.apache.spark.sql.SparkSession,
      startQuery: () => org.apache.spark.sql.streaming.StreamingQuery,
      sourceRows: Long, graceMs: Long, timeoutMs: Long = 1800000L,
      throwOnTimeout: Boolean = true): DrainResult = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val perRun = new java.util.concurrent.ConcurrentHashMap[java.util.UUID,
      java.util.concurrent.atomic.AtomicLong]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        perRun.computeIfAbsent(e.progress.runId,
          _ => new java.util.concurrent.atomic.AtomicLong(0L))
          .addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val t0 = System.nanoTime()
      val q = startQuery()
      def drained: Long =
        Option(perRun.get(q.runId)).map(_.get()).getOrElse(0L)
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (drained < sourceRows && System.nanoTime() < deadline) {
        q.exception.foreach(throw _) // surface a failed query, not a timeout
        Thread.sleep(100)
      }
      val drainSec = (System.nanoTime() - t0) / 1e9
      if (drained < sourceRows) {
        q.stop()
        if (throwOnTimeout) throw new java.util.concurrent.TimeoutException(
          s"drainAndStop: saw $drained of $sourceRows source rows after ${timeoutMs} ms")
        return DrainResult(q, drained, drainSec)
      }
      Thread.sleep(graceMs) // expiry index evicts the trailing window
      q.stop()
      DrainResult(q, drained, drainSec)
    } finally spark.streams.removeListener(listener)
  }

  /** The batch dual (§2B #124's oracled query): identical signatures,
    * band self-join (newer id vs every older id), identical
    * estimator; DISTINCT pairs with the estimate. The stream's
    * deduped output on the same corpus equals this exactly
    * (StreamingSuite). */
  /** The batch twin of [[signatures]]: (id, sig0..sig11) columns via
    * explode + one codegen'd 12-min HashAggregate over the per-doc
    * DISTINCT shingle hashes — bit-identical values (min over the
    * same h multiset = array_min over `hs`; ExtrasSuite pins the two
    * paths equal row-for-row). */
  private[graft] def batchSignatures(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sh = df
      .select(col(idCol).cast("long").as("id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("id"), explode(array_distinct(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("s"))
      .select(col("id"),
        expr("CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT)").as("h"))
    val sigCols = MinHashDf.A.indices.map(i =>
      min(expr(s"(${MinHashDf.A(i)}L * h + ${MinHashDf.B(i)}L) % ${MinHashDf.P}L"))
        .as(s"sig$i"))
    sh.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*)
  }

  def nearDupBatch(df: DataFrame, idCol: String, textCol: String,
      minSim: Double = 0.5): DataFrame = {
    // r19 optimization round: the batch dual now computes the SAME
    // signatures through explode + groupBy instead of the streaming
    // path's per-row HOF projection. The HOF chain (transform +
    // array_min ×12 + zip_with estimator) is CodegenFallback —
    // interpreted expression trees allocating an array per signature
    // per doc — and the band key was a STRING concat. This twin is
    // whole-stage-codegen end to end: one explode of the per-doc
    // DISTINCT shingles (array_distinct before explode, so the h
    // multiset per doc is exactly the HOF path's `hs`), one codegen'd
    // HashAggregate with 12 min() columns (partial-merged map-side —
    // also the 100 TB shape, where per-row arrays don't partial-agg),
    // band self-join on (band, v1, v2) numeric columns instead of the
    // concat string, and the estimator as a Σ CASE WHEN over the 12
    // signature columns — the exact eqSum shape the DuckDB oracle
    // runs. Value identity: min over the same h multiset = array_min
    // over `hs`; round(k/12.0, 6) computes the same division on the
    // same integers. StreamingSuite pins stream == batch on every
    // corpus, and ExtrasSuite pins the two signature paths equal
    // row-for-row (r19 focused test).
    val sigs = batchSignatures(df, idCol, textCol)
    val bandStructs = (0 until MinHashDf.NUM_BANDS).map(bi =>
      s"struct($bi AS band, sig${2 * bi} AS v1, sig${2 * bi + 1} AS v2)")
    val b = sigs.select(
      (col("id") +: MinHashDf.A.indices.map(i => col(s"sig$i"))) :+
        explode(expr(s"array(${bandStructs.mkString(", ")})")).as("bk"): _*)
      .select((col("id") +: MinHashDf.A.indices.map(i => col(s"sig$i"))) ++
        Seq(col("bk.band").as("band"), col("bk.v1").as("v1"), col("bk.v2").as("v2")): _*)
      .cache() // both sides of the self-join below
    val eqSum = MinHashDf.A.indices.map(i =>
      when(col(s"x.sig$i") === col(s"y.sig$i"), 1).otherwise(0))
      .reduce(_ + _)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.v1") === col("y.v1") &&
          col("x.v2") === col("y.v2") && col("x.id") > col("y.id"))
      .select(col("x.id").as("doc_id"), col("y.id").as("matched_id"),
        round(eqSum.cast("double") / lit(NUM_HASHES.toDouble), 6).as("est_sim"))
      .filter(col("est_sim") >= minSim)
      .distinct()
      .orderBy("doc_id", "matched_id")
  }
}
