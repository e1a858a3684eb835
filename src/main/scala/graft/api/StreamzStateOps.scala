package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING analogs of the StreamzOps ops that are batch-only there
  * (accumulate / sliding_window use global or non-time windows that
  * Structured Streaming rejects — see StreamzOps's scaladoc). Here the
  * same per-key semantics run on an unbounded stream via
  * `flatMapGroupsWithState`: state is the fold accumulator (or the
  * last-n ring), keyed by the stream key, checkpointed with the query.
  *
  * Ordering contract: within one micro-batch, rows of a key are folded
  * in ascending `ord` order (sorted here — group iterators carry no
  * order guarantee); ACROSS micro-batches the caller must deliver a
  * key's rows in non-decreasing `ord` order, which is exactly the
  * per-key ordering the CDC source guarantees (key-hash partitions,
  * seq-sorted — PgCdcSimSource) and any replication protocol provides.
  * Out-of-order delivery across batches folds in arrival order, the
  * same behavior as the push-based reference.
  *
  * At scale: state is per-key O(1) (accumulate) or O(n) (sliding
  * ring); keys distribute across executors by the groupByKey shuffle;
  * use RocksDB state store for large key spaces (RecoverySuite proves
  * the provider works).
  *
  * Shapes are pinned to (key: Long, ord: Long, value: Double) — the
  * CDC envelope's natural projection. A production library would
  * derive these via Encoders from the caller's types; fixed primitives
  * keep the state schema stable across restarts here.
  */
object StreamzStateOps {

  // not private: Catalyst's generated (de)serializers must access them
  case class KOV(key: Long, ord: Long, value: Double)
  case class AccOut(key: Long, ord: Long, value: Double, acc: Double)
  case class WinOut(key: Long, ord: Long, value: Double, win: Seq[Double])

  /** streamz `accumulate(fn=+, start)` on a STREAM: running per-key
    * sum, one output row per input row, state = the fold value.
    * Input df (streaming or batch) must have columns (keyCol, ordCol,
    * valueCol), castable to (long, long, double).
    */
  def accumulateStream(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    implicit val kovEnc = Encoders.product[KOV]
    implicit val outEnc = Encoders.product[AccOut]
    implicit val stateEnc = Encoders.scalaDouble
    implicit val keyEnc = Encoders.scalaLong
    val typed: Dataset[KOV] = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("double").as("value")).as[KOV]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[Double, AccOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[KOV], state: GroupState[Double]) =>
          var acc = state.getOption.getOrElse(0.0)
          val out = rows.toSeq.sortBy(_.ord).map { r =>
            acc += r.value
            AccOut(key, r.ord, r.value, acc)
          }
          state.update(acc)
          out.iterator
      }
      .toDF("key", "ord", "value", "acc")
  }

  /** streamz `sliding_window(n)` on a STREAM: per key, the last n
    * values (oldest→newest, ≤ n while warming up) emitted per row as
    * an array column `win` — callers aggregate it with
    * `aggregate(win, ...)` / `array_max` etc. State = the ring of the
    * last n values.
    */
  def slidingWindowStream(df: DataFrame, n: Int, keyCol: String,
      ordCol: String, valueCol: String): DataFrame = {
    require(n > 0, s"sliding window size must be > 0 (got $n)")
    implicit val kovEnc = Encoders.product[KOV]
    implicit val outEnc = Encoders.product[WinOut]
    implicit val stateEnc = Encoders.kryo[List[Double]]
    implicit val keyEnc = Encoders.scalaLong
    val typed: Dataset[KOV] = df.select(
      col(keyCol).cast("long").as("key"),
      col(ordCol).cast("long").as("ord"),
      col(valueCol).cast("double").as("value")).as[KOV]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[List[Double], WinOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[KOV], state: GroupState[List[Double]]) =>
          var ring = state.getOption.getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.ord).map { r =>
            ring = (ring :+ r.value).takeRight(n)
            WinOut(key, r.ord, r.value, ring)
          }
          state.update(ring)
          out.iterator
      }
      .toDF("key", "ord", "value", "win")
  }
}
