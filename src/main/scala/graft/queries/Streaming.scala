package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Streaming-semantics queries (SURVEY.md §2B #46–#51) declared as
  * batch equivalents — the driver oracle-checks these; the same
  * transformations run as real Structured Streaming queries in the
  * ScalaTest suite (readStream + Trigger.AvailableNow), proving
  * streaming ≡ batch on identical input.
  *
  * Scale: every one of these is keyed (by window bucket and/or
  * user_id), so state partitions across executors; watermarks bound
  * state in the streaming execution (§4.3).
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- #46 q_stream_tumbling ---------------------------------------------
  val qStreamTumbling: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("decimal(38,2)")
             .cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  val qStreamTumblingSql: String = EV +
    """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM e
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---- #47 q_stream_sliding ----------------------------------------------
  // 1h windows every 30 min: each event lands in exactly 2 windows.
  // Oracle reproduces Spark's epoch-aligned grid with integer µs
  // arithmetic (exact — no float epoch).
  val qStreamSliding: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))
      .orderBy("win_start")

  val qStreamSlidingSql: String = EV +
    """SELECT make_timestamp(((epoch_us(ts) - off) // 3600000000) * 3600000000 + off) AS win_start,
      |       COUNT(*) AS cnt
      |FROM e CROSS JOIN (SELECT UNNEST([CAST(0 AS BIGINT), CAST(1800000000 AS BIGINT)]) AS off) offs
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- #48 q_stream_session ----------------------------------------------
  // Gap semantics (verified in StreamingSuite against real
  // session_window execution): an event at EXACTLY +30min still
  // merges — a new session starts only when the gap is STRICTLY
  // GREATER than 30min → oracle uses `> INTERVAL 30 MINUTE`.
  val qStreamSession: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  val qStreamSessionSql: String = EV +
    """, e2 AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN LAG(ts) OVER w IS NULL
      |              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e2)
      |SELECT user_id, DATE_TRUNC('second', MIN(ts)) AS session_start,
      |       COUNT(*) AS n_events
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---- #49 q_stream_dedup ------------------------------------------------
  // `unique()` semantics: first event per (user_id, event_type) in
  // (ts, event_id) order — declared deterministically via row_number
  // (dropDuplicates picks an arbitrary row; the streaming test uses
  // dropDuplicatesWithinWatermark for the same key set).
  val qStreamDedup: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"),
        date_trunc("second", col("ts")).as("first_ts"))
      .orderBy("user_id", "event_type")
  }

  val qStreamDedupSql: String = EV +
    """SELECT user_id, event_type, event_id AS first_event_id,
      |       DATE_TRUNC('second', ts) AS first_ts
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts, event_id) AS rn FROM e)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ---- #50 q_cdc_latest_by_key -------------------------------------------
  // The reference's table-replication semantic (§2A): changelog keyed
  // by user_id, versioned by (ts, event_id) → latest state per key.
  val qCdcLatestByKey: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        dec(col("value")).cast("double").as("last_value"),
        date_trunc("second", col("ts")).as("last_ts"))
      .orderBy("user_id")
  }

  val qCdcLatestByKeySql: String = EV +
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
      |       DATE_TRUNC('second', ts) AS last_ts
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM e)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ---- #51 q_cdc_scd2 ----------------------------------------------------
  // Slowly-changing-dimension type 2: validity [ts, next ts) per key +
  // current-row flag.
  val qCdcScd2: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .select(col("user_id"), col("event_id"),
        col("ts_sec").as("valid_from"),
        lead(col("ts_sec"), 1).over(w).as("valid_to"),
        lead(col("ts_sec"), 1).over(w).isNull.cast("int").as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  val qCdcScd2Sql: String = EV +
    """SELECT user_id, event_id,
      |       DATE_TRUNC('second', ts) AS valid_from,
      |       LEAD(DATE_TRUNC('second', ts), 1) OVER w AS valid_to,
      |       CAST(LEAD(ts, 1) OVER w IS NULL AS INT) AS is_current
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ---- #59 q_stream_watermark_late ---------------------------------------
  // Declared fn = the 10-min-window agg the watermark would feed
  // (withWatermark is a no-op in batch, so batch output = "no rows
  // late"); the late-row-DROP behavior is only observable in a real
  // stream and is asserted in StreamingSuite with out-of-order
  // MemoryStream input.
  val qStreamWatermarkLate: Q = (s, dir) =>
    Tables.events(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))
      .orderBy("win_start")

  val qStreamWatermarkLateSql: String = EV +
    """SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS win_start,
      |       COUNT(*) AS cnt
      |FROM e
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- #60 q_stream_stateful_count ---------------------------------------
  // Custom state: flatMapGroupsWithState executed in batch mode (one
  // state fold per key); the incremental multi-batch execution with
  // EventTimeTimeout is asserted in StreamingSuite.
  val qStreamStatefulCount: Q = (s, dir) => {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator.single((uid, n))
        })
      .toDF("user_id", "n_events")
      .orderBy("user_id")
  }

  val qStreamStatefulCountSql: String = EV +
    """SELECT user_id, COUNT(*) AS n_events
      |FROM e
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- #88 q_stream_stream_join --------------------------------------------
  // Stream-STREAM interval join (the Structured Streaming flagship the
  // inventory lacked): click→purchase attribution — each click pairs
  // with the SAME user's purchases in the following 24 h. Declared as
  // the batch equi+range join (what the oracle checks); the real
  // two-stream execution — both sides watermarked, the time-range
  // condition bounding both buffers' state — is asserted in
  // StreamingSuite against this exact output. Scale: state is keyed by
  // user and bounded to watermark + 24 h per side; the join shuffles
  // both streams on user_id, never materializes either side whole.
  // lag_us is exact integer µs arithmetic (§2.5 determinism — no
  // float intervals).
  val qStreamStreamJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("lag_us"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val qStreamStreamJoinSql: String = EV +
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
      |FROM e c JOIN e p
      |  ON c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.user_id = c.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
      |ORDER BY 1, 2, 3""".stripMargin

  // ---- #92 q_stream_stream_join_left ---------------------------------------
  // LEFT OUTER stream-stream join: #88 plus the unconverted clicks —
  // every click emits, null purchase columns when no purchase followed
  // within 24 h. The semantic only a watermark makes possible on two
  // streams: a null-padded row is emittable only once the watermark
  // proves no match can still arrive, so the streaming execution emits
  // matches eagerly and non-matches late (StreamingSuite pins both).
  // Batch (= the oracle) is a plain left join. NULL lag_us marks the
  // unconverted rows in both engines.
  val qStreamStreamJoinLeft: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("lag_us"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val qStreamStreamJoinLeftSql: String = EV +
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
      |FROM (SELECT * FROM e WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
      |  ON p.user_id = c.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
      |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin

  // ---- #124 q_stream_neardup (added r11) ---------------------------------
  // Streaming near-dup detection's BATCH DUAL (api/NearDupStream):
  // per doc, every EARLIER doc sharing a MinHash band (#71's exact
  // hash arithmetic), with the signature-estimated Jaccard ≥ 0.5.
  // The streaming path (transformWithState ListState per band
  // bucket) is pinned equal to this row in StreamingSuite — same
  // signatures (HOF-only projection, shared code), same estimator.
  // Deterministic integer hashes ⇒ DuckDB reproduces identical
  // matches, like #71.
  val qStreamNeardup: Q = (s, dir) =>
    graft.api.NearDupStream.nearDupBatch(
      Tables.documents(s, dir), "doc_id", "text", minSim = 0.5)

  val qStreamNeardupSql: String = {
    import MinHashDf.{A, B, P, NUM_BANDS}
    val sigExprs = A.indices.map(i =>
      s"MIN((${A(i)} * h + ${B(i)}) % $P) AS sig$i").mkString(",\n         ")
    val bandSelects = (0 until NUM_BANDS).map(bi =>
      s"SELECT doc_id, $bi AS band, sig${2 * bi} AS v1, sig${2 * bi + 1} AS v2 FROM sigs")
      .mkString("\n  UNION ALL ")
    val eqSum = A.indices.map(i =>
      s"CASE WHEN a.sig$i = b.sig$i THEN 1 ELSE 0 END").mkString(" + ")
    // AS MATERIALIZED on sigs/bands (r14): sigs is referenced 6x by
    // the band selects and 2x by the final join; DuckDB inlines plain
    // CTEs and re-evaluates the 5M-doc shingle+md5 pipeline per
    // reference at the 100x dataset (the failure the sf10 spot sweep
    // measured on the shared #71 CTE — >75 GB temp spill).
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
       |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS matched_id
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.v1 = y.v1 AND x.v2 = y.v2
       |   AND x.doc_id > y.doc_id)
       |SELECT c.doc_id, c.matched_id,
       |       ROUND(($eqSum) / ${A.length}.0, 6) AS est_sim
       |FROM cand c
       |JOIN sigs a ON a.doc_id = c.doc_id
       |JOIN sigs b ON b.doc_id = c.matched_id
       |WHERE ROUND(($eqSum) / ${A.length}.0, 6) >= 0.5
       |ORDER BY c.doc_id, c.matched_id""".stripMargin
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_stream_neardup" -> qStreamNeardup,
    "q_stream_stream_join" -> qStreamStreamJoin,
    "q_stream_stream_join_left" -> qStreamStreamJoinLeft,
    "q_stream_tumbling" -> qStreamTumbling,
    "q_stream_sliding" -> qStreamSliding,
    "q_stream_session" -> qStreamSession,
    "q_stream_dedup" -> qStreamDedup,
    "q_cdc_latest_by_key" -> qCdcLatestByKey,
    "q_cdc_scd2" -> qCdcScd2,
    "q_stream_watermark_late" -> qStreamWatermarkLate,
    "q_stream_stateful_count" -> qStreamStatefulCount,
  )

  val oracleSql: Map[String, String] = Map(
    "q_stream_neardup" -> qStreamNeardupSql,
    "q_stream_stream_join" -> qStreamStreamJoinSql,
    "q_stream_stream_join_left" -> qStreamStreamJoinLeftSql,
    "q_stream_tumbling" -> qStreamTumblingSql,
    "q_stream_sliding" -> qStreamSlidingSql,
    "q_stream_session" -> qStreamSessionSql,
    "q_stream_dedup" -> qStreamDedupSql,
    "q_cdc_latest_by_key" -> qCdcLatestByKeySql,
    "q_cdc_scd2" -> qCdcScd2Sql,
    "q_stream_watermark_late" -> qStreamWatermarkLateSql,
    "q_stream_stateful_count" -> qStreamStatefulCountSql,
  )
}
