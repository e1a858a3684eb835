package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.unsafe.types.UTF8String

/** Parser for the PUBLIC Debezium JSON change-event envelope
  * (`op`/`before`/`after`/`source.lsn`/`ts_ms` — the wire format
  * every Debezium connector emits), shared by the driver-side horizon
  * poll and the executor-side slice readers so the two can never
  * disagree on a line's meaning.
  *
  * Accepted shapes, per line:
  *  - schema-less: `{"before":…,"after":…,"source":{"lsn":…},
  *    "op":"c|r|u|d","ts_ms":…}` (converter `schemas.enable=false`,
  *    the common deployment);
  *  - schema-wrapped: `{"schema":…,"payload":{<the same>}}`
  *    (`schemas.enable=true`) — unwrapped transparently;
  *  - `null` / blank lines (Kafka compaction tombstones dumped into
  *    the feed) — skipped.
  *
  * Mapping onto the [[PgCdcSim.schema]] envelope: `op` c/r → I
  * (r = snapshot read), u → U, d → D; `seq` = `source.lsn` (the
  * log-sequence total order, falling back to a top-level `lsn`);
  * `ts` = `ts_ms` × 1000 µs; the key is `keyField` read from `after`
  * (or `before` for deletes — Debezium nulls `after` on d); payload
  * columns (`event_type`, `value`) come from `after` and are null on
  * deletes, exactly like the simulator's tombstones.
  */
object DebeziumEnvelope {
  private val mapper = new ObjectMapper()

  /** Junk tolerance is part of the contract: a live directory feed
    * contains torn/partial last lines (a writer mid-append), and one
    * malformed line must not fail the whole executor task or stream —
    * anything unparseable is skipped exactly like blanks/tombstones. */
  def parseLine(line: String, keyField: String): Option[PgCdcSim.CdcRow] =
    try parseLineStrict(line, keyField)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseLineStrict(line: String, keyField: String): Option[PgCdcSim.CdcRow] = {
    if (line == null || line.trim.isEmpty) return None
    val root0 = mapper.readTree(line)
    if (root0 == null || root0.isNull) return None
    val root = if (root0.has("payload")) root0.get("payload") else root0
    if (root == null || root.isNull || !root.has("op")) return None
    val op = root.get("op").asText() match {
      case "c" | "r" => "I"
      case "u" => "U"
      case "d" => "D"
      case _ => return None // unknown op (e.g. "m" message events): skip
    }
    val src = if (root.has("source") && !root.get("source").isNull) root.get("source") else root
    val seqNode = if (src.has("lsn")) src.get("lsn") else root.get("lsn")
    if (seqNode == null || seqNode.isNull) return None
    // ts_ms may live on the envelope or on source — and a truncated
    // event can carry neither; that line is incomplete, skip it
    // (don't NPE the task).
    val tsNode =
      if (root.has("ts_ms") && !root.get("ts_ms").isNull) root.get("ts_ms")
      else src.get("ts_ms")
    if (tsNode == null || tsNode.isNull) return None
    val tsMs = tsNode.asLong()
    val img = if (op == "D") root.get("before") else root.get("after")
    if (img == null || img.isNull) return None
    val keyNode = img.get(keyField)
    if (keyNode == null || keyNode.isNull) return None
    val (et, v): (String, java.lang.Double) =
      if (op == "D") (null, null)
      else {
        val etn = img.get("event_type")
        val vn = img.get("value")
        (if (etn == null || etn.isNull) null else etn.asText(),
          if (vn == null || vn.isNull) null else java.lang.Double.valueOf(vn.asDouble()))
      }
    Some(PgCdcSim.CdcRow(seqNode.asLong(), keyNode.asLong(), op, tsMs * 1000L, et, v))
  }

  /** Streams lines with a BufferedReader instead of materializing the
    * whole file (`Files.readAllLines` holds every line of a multi-GB
    * archive segment in heap at once). The reader closes itself when
    * the iterator is exhausted — every caller (horizon poll, slice
    * reader flatMap) drains it fully. */
  private[sources] def readLines(file: String): Iterator[String] = {
    val br = Files.newBufferedReader(Paths.get(file), StandardCharsets.UTF_8)
    new Iterator[String] {
      private var nextLine: String = br.readLine()
      private var closed = false
      override def hasNext: Boolean = {
        if (nextLine == null && !closed) { closed = true; br.close() }
        nextLine != null
      }
      override def next(): String = {
        val l = nextLine
        nextLine = br.readLine()
        l
      }
    }
  }
}

/** One planned slice of the feed: the file list is CAPTURED at plan
  * time on the driver, so every executor of a batch reads the same
  * snapshot of the directory even while new files land. */
final case class DebeziumSlice(files: Seq[String], start: Long, end: Long,
    partId: Int, n: Int) extends InputPartition

/** Executor-side resolution of one [[DebeziumSlice]]: parse, then
  * filter to `seq ∈ (start, end]` and this slice's key-hash class —
  * the same predicate contract as the JDBC/parquet backends, so a
  * key's whole history stays partition-local. */
final class DebeziumReaderFactory(keyField: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[DebeziumSlice]
    val it = s.files.iterator
      .flatMap(DebeziumEnvelope.readLines)
      .flatMap(l => DebeziumEnvelope.parseLine(l, keyField))
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

/** Debezium JSON-envelope DIRECTORY feed as a [[CdcChangelog]] — the
  * first on-disk REAL-wire-format adapter behind the connector seam
  * (VERDICT r12 Next-round #4): a directory of `*.json`/`*.jsonl`
  * files, one Debezium change event per line, Kafka-less (the shape a
  * connect-file-sink or an S3 archiver produces).
  *
  * The stream machinery above the seam is untouched: ops arrive IN
  * the envelope (no first-seen derivation — that is parquet-simulator
  * work), `seq` is the LSN total order, and slices carry predicates,
  * not rows. The simulator's `deletes` option does not apply here.
  *
  * [[pollHorizon]] is incremental: per-file (maxDataSeq, maxSeq) is
  * memoized under the file's (size, mtime) fingerprint, so a poll
  * re-parses only files that grew or appeared since the last poll —
  * the steady-state cost is O(new data), not O(feed). (A production
  * transport would hand the horizon over directly — Kafka end
  * offsets, a replication slot's confirmed LSN; a bare directory has
  * no sidecar, so the adapter maintains its own.)
  */
final class DebeziumJsonChangelog(dir: String, keyField: String,
    numPartitions: Int) extends CdcChangelog {

  // path → ((size, mtimeMs) fingerprint, (maxDataSeq, maxAllSeq)).
  // Keying by PATH (with the fingerprint as part of the value) means a
  // file that grows replaces its stale entry instead of accumulating
  // one memo row per observed (size, mtime) — an append-heavy feed
  // polls thousands of times per file and must not grow the driver
  // map without bound.
  private val horizonMemo = mutable.HashMap.empty[String, ((Long, Long), (Long, Long))]

  private def listFeed(): Seq[String] = {
    val fs = new File(dir).listFiles()
    if (fs == null) Seq.empty
    else fs.filter(f => f.isFile &&
        (f.getName.endsWith(".json") || f.getName.endsWith(".jsonl")))
      .map(_.getAbsolutePath).sorted.toSeq
  }

  private def fileHorizon(path: String): (Long, Long) = {
    val f = new File(path)
    val fp = (f.length(), f.lastModified())
    horizonMemo.get(path) match {
      case Some((`fp`, h)) => h
      case _ =>
        var maxData = -1L
        var maxAll = -1L
        DebeziumEnvelope.readLines(path)
          .flatMap(l => DebeziumEnvelope.parseLine(l, keyField))
          .foreach { r =>
            maxAll = math.max(maxAll, r.seq)
            if (r.op != "D") maxData = math.max(maxData, r.seq)
          }
        val h = (maxData, maxAll)
        horizonMemo.update(path, (fp, h))
        h
    }
  }

  override def pollHorizon(): (Long, Long) = {
    val hs = listFeed().map(fileHorizon)
    if (hs.isEmpty) (-1L, -1L)
    else (hs.map(_._1).max, hs.map(_._2).max)
  }

  override def planSlices(start: Long, end: Long): Array[InputPartition] = {
    val fs = listFeed()
    (0 until numPartitions).map(i =>
      DebeziumSlice(fs, start, end, i, numPartitions): InputPartition).toArray
  }

  override def readerFactory(): PartitionReaderFactory =
    new DebeziumReaderFactory(keyField)
}
