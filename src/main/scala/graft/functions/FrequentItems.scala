package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator — the
  * bounded-memory grouped top-k shape a training-data pipeline needs
  * (frequent domains/tokens/URLs per shard) when exact per-group
  * groupBy(item).count() would blow state.
  *
  * Guarantees (classical MG, mergeable-summaries form):
  *  - state ≤ `capacity` counters per group, whatever the cardinality;
  *  - estimates never overcount: est(w) ≤ true(w);
  *  - undercount ≤ N / (capacity + 1), N = total items in the group —
  *    so any item with true count > N/(capacity+1) is guaranteed
  *    present;
  *  - if a group's DISTINCT item count never exceeds `capacity`, no
  *    decrement ever fires and every count is EXACT (what makes the
  *    fixture query below fully oracle-checkable);
  *  - merge (partial aggregation) preserves all of the above, so the
  *    map-side-combine two-phase plan Spark picks for an Aggregator
  *    is safe.
  */
class FrequentItems(capacity: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    if (w == null) buf // SQL aggregates skip NULL inputs; also a null
                       // map key would break the MapType serializer
    else buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1)
      case None if buf.size < capacity => buf.updated(w, 1L)
      case None => // decrement-all step: drop counters reaching zero
        buf.flatMap { case (k, v) => if (v > 1) Some(k -> (v - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count from everything,
      // drop non-positive — the standard mergeable-summaries compress
      val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, v) => if (v > d) Some(k -> (v - d)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  // real MapType encoders (not kryo binary): the output must be
  // explodable / SQL-visible as map<string,bigint>
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
