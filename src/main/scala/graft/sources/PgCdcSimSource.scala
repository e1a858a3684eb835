package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Postgres-CDC *simulator* source (SURVEY.md §7 M4): the reference's
  * snapshot-then-poll table replication semantics re-expressed as a
  * DataSource V2 `MicroBatchStream`.
  *
  * Semantics emulated (SURVEY.md §2A):
  *  - initial table snapshot → served as the FIRST micro-batch
  *    (offsets (-1, snapshotSeq]);
  *  - then incremental polling: each trigger advances the offset by at
  *    most `batchSize` sequence numbers (the poll quantum);
  *  - per-key ordering by a monotonically increasing seq (the
  *    transaction horizon — xmin/PK watermark in the reference);
  *  - op = I for a key's first appearance, U afterwards (poll-based
  *    CDC sees inserts and updates, never deletes);
  *  - at-least-once replay from any committed offset (offsets are a
  *    single monotonic long → trivially restartable from the
  *    checkpoint WAL).
  *
  * The changelog is derived deterministically from `events.parquet`
  * (seq = event_id, key = user_id). THIS SIM loads it driver-side and
  * ships row slices inside `InputPartition`s — fine for a replay
  * fixture. In production only `ChangelogSlice` changes: each
  * partition would hold a JDBC predicate (`seq > start AND seq <=
  * end AND hash(key) % n = i`) or a Kafka topic-partition range, and
  * the reader would pull rows remotely; offsets, planning, and
  * downstream semantics stay identical.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("pg-cdc-sim")
  *     .option("path", s"$dir/events.parquet")
  *     .option("batchSize", "100")     // poll quantum (seqs per trigger)
  *     .option("snapshotSeq", "499")   // last seq included in the snapshot
  *     .option("numPartitions", "4")
  *     .load()
  * }}}
  */
class PgCdcSimSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pg-cdc-sim"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgCdcSim.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PgCdcSimTable(new CaseInsensitiveStringMap(properties))
}

object PgCdcSim {
  /** CDC envelope: seq (tx horizon), key, op, event time, payload. */
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  final case class CdcRow(seq: Long, key: Long, op: String, tsUs: Long,
      eventType: String, value: java.lang.Double) // value nullable per schema

  /** Deterministic changelog from events.parquet: seq = event_id,
    * key = user_id, op = I on first appearance of key (in seq order).
    */
  def loadChangelog(path: String): Array[CdcRow] = {
    val spark = SparkSession.active
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rows = spark.read.parquet(path)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
      .orderBy("event_id")
      .collect()
    val seen = scala.collection.mutable.HashSet.empty[Long]
    rows.map { r =>
      val key = r.getLong(1)
      val op = if (seen.add(key)) "I" else "U"
      val value: java.lang.Double = if (r.isNullAt(4)) null else r.getDouble(4)
      CdcRow(r.getLong(0), key, op, r.getLong(2), r.getString(3), value)
    }
  }
}

/** Offset = last sequence number included (single monotonic long). */
final case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class PgCdcSimTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException("pg-cdc-sim requires option 'path'"))
  private val batchSize = options.getLong("batchSize", 1000L)
  require(batchSize > 0,
    s"pg-cdc-sim batchSize must be > 0 (got $batchSize): a zero poll " +
      "quantum can never advance the offset, so AvailableNow never terminates")
  private val snapshotSeq = options.getLong("snapshotSeq", -1L)
  private val numPartitions = options.getInt("numPartitions", 4)

  override def name(): String = s"pg-cdc-sim($path)"
  override def schema(): StructType = PgCdcSim.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PgCdcSimScan(path, batchSize, snapshotSeq, numPartitions)
    }
}

class PgCdcSimScan(path: String, batchSize: Long, snapshotSeqOpt: Long,
    numPartitions: Int) extends Scan {
  override def readSchema(): StructType = PgCdcSim.schema
  override def description(): String = s"PgCdcSim(path=$path, batchSize=$batchSize)"

  override def toBatch: Batch = new Batch {
    private lazy val rows = PgCdcSim.loadChangelog(path)
    override def planInputPartitions(): Array[InputPartition] =
      ChangelogSlice.slices(rows, Long.MinValue, Long.MaxValue, numPartitions)
    override def createReaderFactory(): PartitionReaderFactory =
      new ChangelogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PgCdcSimMicroBatchStream(path, batchSize, snapshotSeqOpt, numPartitions)
}

class PgCdcSimMicroBatchStream(path: String, batchSize: Long,
    snapshotSeqOpt: Long, numPartitions: Int) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  private lazy val rows: Array[PgCdcSim.CdcRow] = PgCdcSim.loadChangelog(path)
  private lazy val maxSeq: Long = if (rows.isEmpty) -1L else rows.map(_.seq).max
  // clamped to maxSeq on BOTH paths: an out-of-range snapshotSeq or an
  // empty changelog (maxSeq = -1, where -1/2 == 0 in Scala) must not
  // create offsets beyond the data — otherwise latestOffset would
  // oscillate non-monotonically forever
  private lazy val snapshotSeq: Long =
    math.min(if (snapshotSeqOpt >= 0) snapshotSeqOpt else maxSeq / 2, maxSeq)

  override def initialOffset(): Offset = SeqOffset(-1L)

  /** One "poll" (admission control): from the engine's current start
    * offset, expose the snapshot first, then at most one quantum more
    * seqs — the reference's poll semantics. Stateless: restart-safe
    * from the checkpoint WAL, because the next batch derives purely
    * from the committed offset the engine passes in. The quantum
    * comes from the engine's ReadLimit (which echoes
    * getDefaultReadLimit unless wrapped by AvailableNow), so rate
    * control composes with triggers the standard way.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].seq
    val quantum = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => r.maxRows()
      case _ => batchSize
    }
    val next = if (s < snapshotSeq) snapshotSeq
               else math.min(s + quantum, maxSeq)
    SeqOffset(next)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)
  override def reportLatestOffset(): Offset = SeqOffset(maxSeq)
  // maxSeq is fixed for a replay fixture — nothing to freeze.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is always used")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    ChangelogSlice.slices(rows, s, e, numPartitions)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangelogReaderFactory
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object ChangelogSlice {
  /** Rows with seq in (start, end], hash-partitioned by key so each
    * key's changes stay in one partition (ordered by seq within it) —
    * the same layout a real CDC source needs for per-key ordering.
    */
  def slices(rows: Array[PgCdcSim.CdcRow], start: Long, end: Long,
      numPartitions: Int): Array[InputPartition] = {
    val inRange = rows.filter(r => r.seq > start && r.seq <= end)
    (0 until numPartitions).map { i =>
      ChangelogSlice(inRange.filter(r => math.floorMod(r.key, numPartitions.toLong) == i)
        .sortBy(_.seq)): InputPartition
    }.toArray
  }
}

final case class ChangelogSlice(rows: Array[PgCdcSim.CdcRow]) extends InputPartition

class ChangelogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[ChangelogSlice]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < slice.rows.length }
      override def get(): InternalRow = {
        val r = slice.rows(i)
        InternalRow(r.seq, r.key, UTF8String.fromString(r.op), r.tsUs,
          UTF8String.fromString(r.eventType), r.value)
      }
      override def close(): Unit = ()
    }
  }
}
