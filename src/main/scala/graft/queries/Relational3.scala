package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational surface, wave 3 (added r8; SURVEY.md §2B rows 94–97):
  * ordered string aggregation, correlated LATERAL join, batch
  * sessionization (gaps-and-islands), fixed-width histogram binning.
  * All oracle-checked.
  */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- #94 q_string_agg --------------------------------------------------
  // Grouped ORDERED string aggregation (LISTAGG/STRING_AGG): the
  // ordered-distinct form, built as sort_array(collect_set) +
  // array_join — every step is a codegen'd built-in, and the explicit
  // sort makes the result deterministic regardless of row arrival
  // order (a bare collect_list would hash-differ run to run; SQL
  // LISTAGG ... WITHIN GROUP expresses the same plan). At scale:
  // collect_set partially aggregates map-side; per-group state is
  // bounded by the distinct-value count, the dimension-like use case
  // (priorities, tags, codes) this operator exists for.
  val qStringAgg: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  val qStringAggSql: String =
    """SELECT o_custkey,
      |       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
      |       count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---- #95 q_join_lateral ------------------------------------------------
  // Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
  // top-N-per-key join shape. Catalyst decorrelates the lateral into a
  // window (DecorrelateInnerQuery rewrites the correlated LIMIT as a
  // partitioned row_number filter), so execution is ONE shuffle by the
  // correlation key — no per-customer re-scan of orders, which is what
  // makes the declarative form survive 100×: the naive interpretation
  // is O(customers) subquery executions.
  val qJoinLateral: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_total
        |FROM customer,
        |LATERAL (SELECT o_orderkey,
        |                CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_total
        |         FROM orders WHERE o_custkey = c_custkey
        |         ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
        |         LIMIT 2) AS t
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, o_total DESC, o_orderkey""".stripMargin)
  }

  val qJoinLateralSql: String =
    """SELECT c_custkey, o_orderkey, o_total
      |FROM customer,
      |LATERAL (SELECT o_orderkey,
      |                CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_total
      |         FROM orders WHERE o_custkey = c_custkey
      |         ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
      |         LIMIT 2) AS t
      |WHERE c_mktsegment = 'BUILDING'
      |ORDER BY c_custkey, o_total DESC, o_orderkey""".stripMargin

  // ---- #96 q_sessionize_gap ----------------------------------------------
  // BATCH sessionization — the gaps-and-islands dual of the streaming
  // session_window (#48): a session breaks where the per-user gap
  // exceeds 30 min; session_id is the running count of breaks. Two
  // window passes over ONE partitioning (user_id) — Spark reuses the
  // sort/shuffle across both Window specs, so the whole query is one
  // exchange. Timestamps truncated to seconds and compared in exact
  // integer µs (unix_micros vs DuckDB epoch_us — §2.5.3).
  // delegates to the generalized api/EventAnalytics.sessionizeDf (also
  // the graft_sessionize TVF) so the SQL surface and this oracled row
  // can't drift — same single-exchange two-window plan (PlanSuite).
  val qSessionizeGap: Q = (s, dir) =>
    graft.api.EventAnalytics.sessionizeDf(
      Tables.events(s, dir)
        .withColumn("ts_sec", date_trunc("second", col("ts"))),
      "user_id", "ts_sec", "event_id", gapUs = 1800000000L)

  val qSessionizeGapSql: String = EV +
    """, s AS (SELECT user_id, event_id, DATE_TRUNC('second', ts) AS ts_sec,
      |        CASE WHEN LAG(ts) OVER w IS NULL
      |             OR epoch_us(DATE_TRUNC('second', ts)) - epoch_us(LAG(DATE_TRUNC('second', ts)) OVER w) > 1800000000
      |             THEN 1 ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY DATE_TRUNC('second', ts), event_id)),
      |g AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s)
      |SELECT user_id, session_id, MIN(ts_sec) AS session_start,
      |       MAX(ts_sec) AS session_end, COUNT(*) AS n_events
      |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // ---- #97 q_histogram ---------------------------------------------------
  // Fixed-width histogram binning: bin arithmetic stays in exact
  // decimals until the floor, so a value on a bin boundary lands in
  // the same bin in every engine; per-bin money sums follow §2.5.1
  // (decimal sum → double at the edge). Linear single-pass two-phase
  // aggregate — the canonical distribution-profiling scan over a fact
  // column at any scale.
  val qHistogram: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(floor(dec(col("o_totalprice")) / 50000).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("decimal(38,2)")
          .cast("double").as("total"))
      .orderBy("bin")
  }

  val qHistogramSql: String =
    """SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) / 50000) AS BIGINT) AS bin,
      |       COUNT(*) AS n,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- #99 q_anomaly_zscore ----------------------------------------------
  // Per-key z-score outlier flagging — the monitoring/data-quality
  // sweep over a metric stream: events whose value sits > 2σ from
  // their user's own mean. One window partitioning (user_id) computes
  // mean and sample-stddev in a single pass; z rounds to 6 dp before
  // the compare so the (order-dependent) float aggregation cannot
  // flip a boundary row between engines (§2.5.2). NULLIF guards the
  // constant-valued user (σ = 0 → no anomalies, not a div-by-zero).
  val qAnomalyZscore: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("z", round((col("value") - col("mu")) /
        nullif(col("sd"), lit(0.0)), 6))
      .filter(abs(col("z")) > 2.0)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 2).as("value"), col("z"))
      .orderBy("user_id", "event_id")
  }

  val qAnomalyZscoreSql: String = EV +
    """, s AS (SELECT user_id, event_id, value,
      |        AVG(value) OVER (PARTITION BY user_id) AS mu,
      |        STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
      |        FROM e)
      |SELECT user_id, event_id, ROUND(value, 2) AS value,
      |       ROUND((value - mu) / NULLIF(sd, 0), 6) AS z
      |FROM s WHERE ABS(ROUND((value - mu) / NULLIF(sd, 0), 6)) > 2
      |ORDER BY user_id, event_id""".stripMargin

  // ---- #101 q_join_range_binned ------------------------------------------
  // PURE interval join — no equi key at all: for each purchase event,
  // count click events in the trailing 15-minute window
  // (ts − 15 min, ts]. The #12 theta-range join has a user=cust equi
  // key for the hash join to grab; here there is none, and Spark's
  // naive plan for a range-only condition is a BroadcastNestedLoopJoin
  // (O(|purchases|·|clicks|) — pinned as exactly that in ExtrasSuite).
  // The scale rewrite is RangeBinJoin: bucket time into 15-min bins
  // (= the window width, so each purchase interval explodes into just
  // 2 bin rows), equi-join on the bin id, re-check the exact range on
  // the co-binned candidates. All arithmetic is integer µs — no float
  // anywhere, so the oracle (which states the range join directly)
  // matches bit-exactly.
  val qJoinRangeBinned: Q = (s, dir) => {
    val W = 900000000L // 15 min in µs = the bin width
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), (col("us") - W).as("lo"), col("us").as("hi"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("us").as("v"))
    graft.api.RangeBinJoin.intervalJoin(p, "lo", "hi", c, "v", W)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  val qJoinRangeBinnedSql: String = EV +
    """SELECT p.event_id, COUNT(*) AS n_clicks
      |FROM e p JOIN e c
      |  ON c.event_type = 'click' AND p.event_type = 'purchase'
      | AND epoch_us(c.ts) > epoch_us(p.ts) - 900000000
      | AND epoch_us(c.ts) <= epoch_us(p.ts)
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin

  // ---- #123 q_join_interval_overlap (added r11) --------------------------
  // The SECOND pure range-join shape: interval × interval OVERLAP
  // (point-in-interval is #101). Per purchase "attention window"
  // [ts, ts+30 min], every click "activity window" [ts, ts+15 min]
  // that overlaps it, with the exact overlap length. No equi key —
  // naive Spark plans this as a BNLJ; `RangeBinJoin.overlapJoin` bins
  // BOTH interval sets and emits each pair exactly once in the bin
  // holding the overlap start (max of the los) — dedup by
  // construction, no distinct() shuffle (ExtrasSuite pins rows ==
  // the naive range-only join; PlanSuite pins no-BNLJ). All-integer
  // µs arithmetic — bit-exact; the oracle states the overlap join
  // directly.
  val qJoinIntervalOverlap: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("us").as("p_lo"), (col("us") + 1800000000L).as("p_hi"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("us").as("c_lo"), (col("us") + 900000000L).as("c_hi"))
    graft.api.RangeBinJoin.overlapJoin(
        p, "p_lo", "p_hi", c, "c_lo", "c_hi", binWidth = 1800000000L)
      .select(col("purchase_id"), col("click_id"),
        (least(col("p_hi"), col("c_hi")) - greatest(col("p_lo"), col("c_lo")))
          .as("overlap_us"))
      .orderBy("purchase_id", "click_id")
  }

  // Oracle note (r15): the semantic statement is the naive overlap
  // join `p JOIN c ON p_lo <= c_hi AND c_lo <= p_hi` — but DuckDB
  // cannot evaluate that shape past sf0.1 (no equi key; >9 min at
  // sf1, the reason for the old sf1/sf10 oracle skips). The shipped
  // oracle states the SAME relation through the bin decomposition in
  // plain SQL (explode both interval sets to 30-min bins, equi-join
  // on bin, keep each pair only in the bin holding the overlap start
  // — dedup by construction, exactly RangeBinJoin's argument), which
  // DuckDB hash-joins: sf1 in 7 s instead of timing out. Equivalence
  // to the naive form verified as a zero EXCEPT ALL multiset diff in
  // DuckDB itself at sf0.01 AND sf0.1 (415 099 rows) before shipping.
  val qJoinIntervalOverlapSql: String = EV +
    """, p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS p_lo,
      |               epoch_us(ts) + 1800000000 AS p_hi
      |        FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, epoch_us(ts) AS c_lo,
      |             epoch_us(ts) + 900000000 AS c_hi
      |      FROM e WHERE event_type = 'click'),
      |pb AS (SELECT purchase_id, p_lo, p_hi,
      |              unnest(range(p_lo // 1800000000, p_hi // 1800000000 + 1)) AS bin
      |       FROM p),
      |cb AS (SELECT click_id, c_lo, c_hi,
      |              unnest(range(c_lo // 1800000000, c_hi // 1800000000 + 1)) AS bin
      |       FROM c)
      |SELECT purchase_id, click_id,
      |       LEAST(p_hi, c_hi) - GREATEST(p_lo, c_lo) AS overlap_us
      |FROM pb JOIN cb USING (bin)
      |WHERE p_lo <= c_hi AND c_lo <= p_hi
      |  AND GREATEST(p_lo, c_lo) // 1800000000 = bin
      |ORDER BY purchase_id, click_id""".stripMargin

  // ---- #112 q_join_asof_binned -------------------------------------------
  // The as-of join (#13's semantics, result-identical) on the bin
  // machinery instead of the join-all-history + row_number trick:
  // per-(user, 30-day bin) latest order + a carry window over the
  // per-bin timeline, so each purchase event touches one bin's raw
  // orders plus one carried row — linear under key skew where #13's
  // shape is per-key quadratic (api/AsofBinJoin has the full cost
  // argument). Oracle = #13's exact SQL: same semantics, same rows.
  val qJoinAsofBinned: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("_t"))
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        // o_orderdate is TIMESTAMP_NTZ; UTC session ⇒ the cast is the
        // same wall-clock instant mapping #13's NTZ<=TZ coercion uses
        unix_micros(col("o_orderdate").cast("timestamp")).as("_rt"))
    graft.api.AsofBinJoin.asofJoin(
        ev, leftIdCol = "event_id", leftTimeCol = "_t", keysLeft = Seq("user_id"),
        right = o, rightTimeCol = "_rt", keysRight = Seq("o_custkey"),
        tieBreakCols = Seq("o_orderkey"), binWidth = 30L * 86400000000L)
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_orderdate").cast("date").as("asof_orderdate"))
      .orderBy("event_id")
  }

  val qJoinAsofBinnedSql: String = Relational.qJoinAsofSql

  // ---- #114 q_join_asof_forward ------------------------------------------
  // The forward as-of: for each purchase, the user's EARLIEST click
  // strictly after it (time-to-next-action). Exercises AsofBinJoin's
  // direction="forward" dual — per-bin min(struct), carry from
  // FOLLOWING bins, strict residual — end-to-end against a DuckDB
  // row_number oracle. 1-day bins over the 30-day fixture span, so
  // the carry window genuinely crosses bins. (Orders all predate
  // events in this fixture, so the orders pairing that #13/#112 use
  // would match nothing forward — the events self-pairing is the
  // meaningful forward shape.)
  val qJoinAsofForward: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("_t"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user_id"),
        unix_micros(col("ts")).as("_rt"))
    graft.api.AsofBinJoin.asofJoin(
        p, leftIdCol = "event_id", leftTimeCol = "_t", keysLeft = Seq("user_id"),
        right = c, rightTimeCol = "_rt", keysRight = Seq("c_user_id"),
        tieBreakCols = Seq("c_event_id"), binWidth = 86400000000L,
        direction = "forward", strict = true)
      .select(col("event_id"), col("user_id"),
        col("c_event_id").as("next_click_id"), col("_rt").as("next_click_us"))
      .orderBy("event_id")
  }

  val qJoinAsofForwardSql: String = EV +
    """SELECT event_id, user_id, next_click_id, next_click_us FROM (
      |  SELECT p.event_id, p.user_id, c.event_id AS next_click_id,
      |         epoch_us(c.ts) AS next_click_us,
      |         ROW_NUMBER() OVER (PARTITION BY p.event_id
      |           ORDER BY c.ts ASC NULLS LAST, c.event_id ASC NULLS LAST) AS rn
      |  FROM e p LEFT JOIN e c
      |    ON p.user_id = c.user_id AND c.event_type = 'click' AND c.ts > p.ts
      |  WHERE p.event_type = 'purchase')
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---- #118 q_join_asof_tolerance ----------------------------------------
  // #114 with a merge_asof-style bound: the next click counts only
  // within 24 h of the purchase — the "did they come back QUICKLY"
  // variant. Same binned plan; the tolerance nulls a pick farther
  // than the bound (pick is the time-extreme, so pick-outside-bound
  // ⟺ no candidate inside — the oracle can put the bound in the
  // join predicate and stay equivalent).
  val qJoinAsofTolerance: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("_t"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user_id"),
        unix_micros(col("ts")).as("_rt"))
    graft.api.AsofBinJoin.asofJoin(
        p, leftIdCol = "event_id", leftTimeCol = "_t", keysLeft = Seq("user_id"),
        right = c, rightTimeCol = "_rt", keysRight = Seq("c_user_id"),
        tieBreakCols = Seq("c_event_id"), binWidth = 86400000000L,
        direction = "forward", strict = true, toleranceUs = Some(86400000000L))
      .select(col("event_id"), col("user_id"),
        col("c_event_id").as("next_click_id"), col("_rt").as("next_click_us"))
      .orderBy("event_id")
  }

  val qJoinAsofToleranceSql: String = EV +
    """SELECT event_id, user_id, next_click_id, next_click_us FROM (
      |  SELECT p.event_id, p.user_id, c.event_id AS next_click_id,
      |         epoch_us(c.ts) AS next_click_us,
      |         ROW_NUMBER() OVER (PARTITION BY p.event_id
      |           ORDER BY c.ts ASC NULLS LAST, c.event_id ASC NULLS LAST) AS rn
      |  FROM e p LEFT JOIN e c
      |    ON p.user_id = c.user_id AND c.event_type = 'click' AND c.ts > p.ts
      |       AND epoch_us(c.ts) - epoch_us(p.ts) <= 86400000000
      |  WHERE p.event_type = 'purchase')
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------------
  // ---- #132 q_win_pct_rank (added r12) -----------------------------------
  // Relative-standing window functions: percent_rank (= (rank−1)/(n−1))
  // and cume_dist (= #rows ≤ current / n) per l_returnflag partition,
  // ordered by price. Pure rank arithmetic over the same partitioned
  // sort every other window row pays — deterministic cross-engine
  // because both engines derive the SAME doubles from the same
  // integer rank/count pairs (ties share a rank in both).
  val qWinPctRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("l_returnflag", "pct_rank", "l_orderkey", "l_linenumber")
  }

  val qWinPctRankSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |       ROUND(CUME_DIST() OVER w, 6) AS cume
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice)
      |ORDER BY l_returnflag, pct_rank, l_orderkey, l_linenumber""".stripMargin

  // ---- #133 q_agg_mode (added r12) ---------------------------------------
  // Per-group MODE with a DETERMINISTIC tie-break (smallest modal
  // value wins) — deliberately NOT the engines' built-in mode()
  // (DuckDB's breaks ties by first-seen arrival, Spark 4's
  // `mode(col)` is non-deterministic under ties), so both engines
  // state the same count→rank pipeline: value counts, then one row
  // per group by (count DESC, value ASC). Two shuffles, both keyed
  // by the group — the standard scale shape for grouped arg-max.
  val qAggMode: Q = (s, dir) => {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      .orderBy("l_returnflag")
  }

  val qAggModeSql: String =
    """SELECT l_returnflag, l_quantity AS mode_qty, cnt
      |FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
      |             ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |               ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
      |      FROM lineitem GROUP BY l_returnflag, l_quantity)
      |WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin

  // ---- #134 q_join_asof_nearest (added r12) ------------------------------
  // pandas merge_asof(direction='nearest'): for each purchase, the
  // user's click CLOSEST in time in EITHER direction. Composes the
  // two existing AsofBinJoin duals — backward (≤, non-strict) and
  // forward (>, strict) partition the candidates exactly (every click
  // is on one side), so the nearest pick is a per-row choice between
  // the two time-extremes: smaller |Δt| wins, ties go backward (and
  // within a direction the binned join's own lexicographic tie rule
  // applies — MAX id backward, MIN id forward — which the oracle
  // mirrors with a signed-id sort). Scale shape: two binned as-of
  // joins (each linear, carry-windowed) + one equi-join on the left
  // id — no new machinery.
  val qJoinAsofNearest: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("_t"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"), col("user_id").as("c_user_id"),
        unix_micros(col("ts")).as("_rt"))
    def side(direction: String, strict: Boolean) =
      graft.api.AsofBinJoin.asofJoin(
        p, leftIdCol = "event_id", leftTimeCol = "_t", keysLeft = Seq("user_id"),
        right = c, rightTimeCol = "_rt", keysRight = Seq("c_user_id"),
        tieBreakCols = Seq("c_event_id"), binWidth = 86400000000L,
        direction = direction, strict = strict)
    val back = side("backward", strict = false)
      .select(col("event_id"), col("user_id"), col("_t"),
        col("c_event_id").as("b_id"), col("_rt").as("b_rt"))
    val fwd = side("forward", strict = true)
      .select(col("event_id").as("f_event"),
        col("c_event_id").as("f_id"), col("_rt").as("f_rt"))
    back.join(fwd, col("event_id") === col("f_event"))
      .withColumn("pick_back",
        col("f_id").isNull ||
          (col("b_id").isNotNull &&
            (col("_t") - col("b_rt")) <= (col("f_rt") - col("_t"))))
      .select(col("event_id"), col("user_id"),
        when(col("pick_back"), col("b_id")).otherwise(col("f_id"))
          .as("nearest_click_id"),
        when(col("pick_back"), col("b_rt") - col("_t"))
          .otherwise(col("f_rt") - col("_t")).as("delta_us"))
      .orderBy("event_id")
  }

  val qJoinAsofNearestSql: String = EV +
    """SELECT event_id, user_id, nearest_click_id, delta_us FROM (
      |  SELECT p.event_id, p.user_id, c.event_id AS nearest_click_id,
      |         epoch_us(c.ts) - epoch_us(p.ts) AS delta_us,
      |         ROW_NUMBER() OVER (PARTITION BY p.event_id
      |           ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC NULLS LAST,
      |                    (c.ts > p.ts) ASC NULLS LAST,
      |                    CASE WHEN c.ts > p.ts THEN c.event_id
      |                         ELSE -c.event_id END ASC NULLS LAST) AS rn
      |  FROM e p LEFT JOIN e c
      |    ON p.user_id = c.user_id AND c.event_type = 'click'
      |  WHERE p.event_type = 'purchase')
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---- #135 q_agg_corr (added r12) ---------------------------------------
  // Bivariate aggregate statistics — the pair-moments family #20's
  // univariate stats lacked: Pearson correlation, sample covariance,
  // and the OLS line (slope + intercept) of price against quantity
  // per return flag. Same determinism class as #20's stddev (sums of
  // products over doubles, merge-order differences land below the
  // 6-dp round — §2.5.2); every function is a built-in partial
  // aggregate, one shuffle keyed by the group.
  val qAggCorr: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val qAggCorrSql: String =
    """SELECT l_returnflag,
      |       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
      |       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qp,
      |       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
      |       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- #139 q_tpch_q21_flagship (added r13) ------------------------------
  // The deep relational composite VERDICT r12 Next-round #8 named as
  // the remaining obvious row beyond #93's star join: TPC-H Q21's
  // shape ("suppliers who kept orders waiting") adapted to the
  // fixture's columns — per supplier of 5 nations, count 'F'-status
  // orders where the supplier shipped a RETURNED ('R') line, the
  // order involved ANOTHER supplier (EXISTS ⇒ decorrelated LeftSemi
  // with a non-equi residual), and NO other supplier's line on the
  // order was returned (NOT EXISTS ⇒ LeftAnti) — top 20.
  // What it exercises that no other row does: TWO correlated
  // subqueries against the FACT table itself (self-semi + self-anti
  // on the fact's join key, each with a <> residual), stacked under
  // broadcast dim joins and a TakeOrdered — Q21 is the classic
  // optimizer torture test for exactly this decorrelation. Plan is
  // PlanSuite-pinned: LeftSemi + LeftAnti hash joins (never a
  // per-row subquery or a cartesian), dims broadcast, top-k as
  // TakeOrderedAndProject.
  // Scale: both subqueries key on l_orderkey — the same shuffle the
  // main fact join needs — so the whole plan is one fact-table
  // exchange reused across semi/anti sides plus broadcast dims.
  // Determinism: integer counts; (numwait DESC, s_name) is a total
  // order (s_name unique), so LIMIT 20 is stable cross-engine.
  private val tpchQ21Text =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation   ON n_nationkey = s_nationkey
      | AND n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  val qTpchQ21Flagship: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    s.sql(tpchQ21Text)
  }

  val qTpchQ21FlagshipSql: String = tpchQ21Text

  val queries: Map[String, Q] = Map(
    "q_tpch_q21_flagship" -> qTpchQ21Flagship,
    "q_win_pct_rank" -> qWinPctRank,
    "q_agg_mode" -> qAggMode,
    "q_join_asof_nearest" -> qJoinAsofNearest,
    "q_agg_corr" -> qAggCorr,
    "q_string_agg" -> qStringAgg,
    "q_join_lateral" -> qJoinLateral,
    "q_sessionize_gap" -> qSessionizeGap,
    "q_histogram" -> qHistogram,
    "q_anomaly_zscore" -> qAnomalyZscore,
    "q_join_range_binned" -> qJoinRangeBinned,
    "q_join_interval_overlap" -> qJoinIntervalOverlap,
    "q_join_asof_binned" -> qJoinAsofBinned,
    "q_join_asof_forward" -> qJoinAsofForward,
    "q_join_asof_tolerance" -> qJoinAsofTolerance,
  )

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q21_flagship" -> qTpchQ21FlagshipSql,
    "q_win_pct_rank" -> qWinPctRankSql,
    "q_agg_mode" -> qAggModeSql,
    "q_join_asof_nearest" -> qJoinAsofNearestSql,
    "q_agg_corr" -> qAggCorrSql,
    "q_string_agg" -> qStringAggSql,
    "q_join_lateral" -> qJoinLateralSql,
    "q_sessionize_gap" -> qSessionizeGapSql,
    "q_histogram" -> qHistogramSql,
    "q_anomaly_zscore" -> qAnomalyZscoreSql,
    "q_join_range_binned" -> qJoinRangeBinnedSql,
    "q_join_interval_overlap" -> qJoinIntervalOverlapSql,
    "q_join_asof_binned" -> qJoinAsofBinnedSql,
    "q_join_asof_forward" -> qJoinAsofForwardSql,
    "q_join_asof_tolerance" -> qJoinAsofToleranceSql,
  )
}
