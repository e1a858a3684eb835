package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binned as-of join — "latest right row at or before each left
  * row's time, per key" without the per-key candidate blowup.
  *
  * The classic Spark spelling (q_join_asof #13): keyed equi-join with
  * `rt <= t`, then `row_number() = 1` per left row. Correct, but each
  * left row materializes EVERY earlier right row of its key before
  * the window discards all but one — a power key with millions of
  * history rows makes that per-key quadratic (rows × history).
  *
  * The binned spelling reuses the RangeBinJoin idea — cut time into
  * fixed-width bins — but where an interval join explodes intervals,
  * as-of needs UNBOUNDED lookback, so the trick is a carry instead:
  *
  *  1. per (key, bin): the latest right row IN that bin, via ONE
  *     `max(struct(t, tieBreak…, payload))` aggregate (struct
  *     ordering = the as-of ordering) — map-side combinable;
  *  2. a running `max` window over the per-(key, bin) timeline —
  *     the latest right row STRICTLY BEFORE each bin ("carry").
  *     The timeline includes every bin the LEFT needs (full outer
  *     with the left's distinct (key, bin) set), so a left bin with
  *     no right rows still receives its carry. The window runs over
  *     per-bin aggregates, not raw rows: its input is ≤ one row per
  *     (key, bin) per side — never the raw history;
  *  3. each left row equi-joins its OWN bin's raw right rows
  *     (`rt <= t` residual, candidates = one bin's density, not the
  *     whole history) for the in-bin latest, and its bin's carry for
  *     everything earlier; in-bin wins when present (any in-bin time
  *     ≥ bin start > every carried time).
  *
  * Cost: two (key, bin)-keyed shuffles + one per-left-row aggregate —
  * linear in |L| + |R| for any key skew, the shape that survives a
  * power user with 1e6 history rows. The same per-bin
  * latest + carry decomposition is what a streaming combine_latest
  * keeps as state (latest per key ≡ the carry of the open bin).
  *
  * Contract: `leftIdCol` is a UNIQUE left row id (drives the in-bin
  * argmax); time columns are non-negative BIGINT in a shared unit;
  * left/right column sets disjoint; right rows ordered by
  * (time, tieBreak…) — the as-of pick is the lexicographic max ≤ t.
  * Left rows with no qualifying right row keep nulls (left join).
  *
  * `direction = "forward"` mirrors everything: EARLIEST right row at
  * or after t — per-bin `min(struct)`, carry from FOLLOWING bins,
  * `rt >= t` residual; the in-bin row still beats the carry (any
  * in-bin time ≤ bin end < every later-bin time). `strict = true`
  * excludes the exact-tie time (rt == t) — it only touches the
  * in-bin residual, because carry bins lie strictly past the
  * boundary by construction in both directions. `toleranceUs`
  * (pandas merge_asof's bound) nulls a pick farther than the bound
  * from t: because the pick is the time-EXTREME on its side, a pick
  * outside the bound implies no candidate inside it, so filtering
  * the chosen row is equivalent to bounding the candidates.
  */
object AsofBinJoin {

  def asofJoin(left: DataFrame, leftIdCol: String, leftTimeCol: String,
               keysLeft: Seq[String],
               right: DataFrame, rightTimeCol: String, keysRight: Seq[String],
               tieBreakCols: Seq[String], binWidth: Long,
               direction: String = "backward", strict: Boolean = false,
               toleranceUs: Option[Long] = None): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    toleranceUs.foreach(t =>
      require(t > 0, s"toleranceUs must be positive when set, got $t"))
    val backward = direction match {
      case "backward" => true
      case "forward" => false
      case other =>
        throw new IllegalArgumentException(
          s"direction must be 'backward' or 'forward', got '$other'")
    }
    require(keysLeft.length == keysRight.length && keysLeft.nonEmpty,
      "need matching non-empty key lists")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column collision between sides: $overlap")
    val working = Seq("_bin", "_best", "_carry", "_payload", "_ib_id")
    require(!(left.columns ++ right.columns).exists(working.contains),
      s"inputs must not use the join's working names $working")

    val rightCols = right.columns.toSeq
    // as-of ordering struct: (t, tieBreaks…, full payload) — struct
    // comparison is lexicographic, so max = latest by (t, tieBreak…)
    val bestStruct = struct(
      (col(rightTimeCol) +: tieBreakCols.map(col)) :+
        struct(rightCols.map(col): _*).as("_payload"): _*)

    // integer `div`, not `/`: a double quotient at epoch-µs magnitude
    // can round across a bin boundary (same escaping rule as
    // RangeBinJoin for hostile column names)
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    val rb = right.withColumn("_bin", expr(s"${q(rightTimeCol)} div ${binWidth}L"))
    val lb = left.withColumn("_bin", expr(s"${q(leftTimeCol)} div ${binWidth}L"))

    // direction duals: the as-of pick aggregate, the in-bin residual,
    // and the carry frame all mirror
    def bestAgg = if (backward) max(bestStruct) else min(bestStruct)
    val residual = (backward, strict) match {
      case (true, false)  => col(rightTimeCol) <= col(leftTimeCol)
      case (true, true)   => col(rightTimeCol) < col(leftTimeCol)
      case (false, false) => col(rightTimeCol) >= col(leftTimeCol)
      case (false, true)  => col(rightTimeCol) > col(leftTimeCol)
    }

    // 1. the in-bin extreme per (key, bin) is NOT enough for the
    //    same-bin case (it may fall on the wrong side of t), so
    //    same-bin candidates join raw:
    val inBinCond = keysLeft.zip(keysRight)
      .map { case (lk, rk) => col(lk) === col(rk) }
      .reduce(_ && _) && lb("_bin") === rb("_bin") && residual
    val inBest = lb.join(rb, inBinCond)
      .groupBy(col(leftIdCol).as("_ib_id"))
      .agg(bestAgg.as("_best"))

    // 2. carry = the extreme right row strictly past each bin (before
    //    it when backward, after it when forward), over the
    //    per-(key, bin) timeline (left-needed bins ∪ right bins)
    val perBin = rb.groupBy(keysRight.map(col) :+ col("_bin"): _*)
      .agg(bestAgg.as("_best"))
      .select(keysRight.zip(keysLeft).map { case (rk, lk) => col(rk).as(lk) } ++
        Seq(col("_bin"), col("_best")): _*)
    val needBins = lb.select(keysLeft.map(col) :+ col("_bin"): _*).distinct()
    val timeline = needBins.join(perBin, keysLeft :+ "_bin", "full_outer")
    val carryW = Window.partitionBy(keysLeft.map(col): _*)
      .orderBy(col("_bin"))
    val carried = timeline
      .withColumn("_carry",
        if (backward)
          max(col("_best")).over(carryW.rowsBetween(Window.unboundedPreceding, -1))
        else
          min(col("_best")).over(carryW.rowsBetween(1, Window.unboundedFollowing)))
      .select(keysLeft.map(col) ++ Seq(col("_bin"), col("_carry")): _*)

    // 3. stitch: in-bin beats carry (strictly closer to t by
    //    construction, in either direction). Tolerance (the pandas
    //    merge_asof bound) applies to the CHOSEN row, not the
    //    candidates: the pick inside the window is unchanged, a pick
    //    farther than `toleranceUs` just nulls out — so it composes
    //    with both directions and strictness for free. (A cost-side
    //    carry bound — skip bins beyond tolerance — would be an
    //    optimization on top; the filter alone is the semantics.)
    val chosen = coalesce(col("_best"), col("_carry"))
    val inTol = toleranceUs match {
      case None => lit(true)
      case Some(tol) =>
        val dist = if (backward) col(leftTimeCol) - chosen.getField(rightTimeCol)
          else chosen.getField(rightTimeCol) - col(leftTimeCol)
        dist <= lit(tol)
    }
    val payload = when(chosen.isNotNull && inTol, chosen.getField("_payload"))
    lb.join(inBest, col(leftIdCol) === col("_ib_id"), "left")
      .join(carried, keysLeft :+ "_bin", "left")
      .select(left.columns.map(col) ++
        rightCols.map(c => payload.getField(c).as(c)): _*)
  }
}
