package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder-prompt first-class addition;
  * SURVEY.md §2B row 68): media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * No real image/audio libs exist in this environment, so the decode
  * step is a clearly-marked deterministic FAKE (features computed from
  * the actual bytes); everything around it — binary column, metadata
  * struct, partition-wise batched UDF execution via `mapPartitions`
  * (the Scala analog of `mapInPandas`: one iterator per partition, so
  * a real decoder would amortize model/codec init per partition, not
  * per row), flat typed output — is real, tested plumbing. Swap
  * `decodeStub` for a JNI/ONNX decoder and nothing else changes.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** FAKE decoder (deterministic): real code would decode an image
    * and return (height, width, mean pixel). Here: byte stats over
    * the real binary payload.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    (bytes.length, sum)
  }

  // ---- #68 q_multimodal_decode -------------------------------------------
  // "Media" = unhex(md5(text)): a real 16-byte binary column derived
  // deterministically from the fixture (both engines agree on md5).
  // Metadata struct rides alongside and is carried through the decode.
  val qMultimodalDecode: Q = (s, dir) => {
    import s.implicits._
    val withMedia = Tables.documents(s, dir)
      .select(col("doc_id"),
        unhex(md5(col("text"))).as("media"),           // opaque bytes
        struct(col("lang").as("container"),            // typed metadata
               col("n_chars").cast("int").as("payload_hint")).as("meta"))
    val decoded = withMedia
      .select(col("doc_id"), col("media"), col("meta.container"), col("meta.payload_hint"))
      .as[(Long, Array[Byte], String, Int)]
      .mapPartitions { it =>
        // per-partition init would happen HERE (codec, model, …)
        it.map { case (id, bytes, container, hint) =>
          val (nBytes, byteSum) = decodeStub(bytes)
          (id, container, hint, nBytes, byteSum)
        }
      }
      .toDF("doc_id", "container", "payload_hint", "n_bytes", "byte_sum")
    decoded
      .select(col("doc_id"), col("container"), col("payload_hint"),
        col("n_bytes"), col("byte_sum"),
        round(col("byte_sum").cast("double") / col("n_bytes").cast("double"), 6)
          .as("mean_byte"))
      .orderBy("doc_id")
  }

  // Oracle re-derives the byte values from the md5 hex string (no
  // blob byte-access needed in DuckDB): byte i = hi·16 + lo from hex
  // digit pairs.
  val qMultimodalDecodeSql: String =
    """WITH h AS (SELECT doc_id, lang AS container, CAST(n_chars AS INT) AS payload_hint,
      |                  MD5(text) AS hex FROM documents),
      |b AS (
      |  SELECT doc_id, container, payload_hint,
      |         CAST(LENGTH(hex) / 2 AS INT) AS n_bytes,
      |         CAST(list_sum(list_transform(generate_series(1, CAST(LENGTH(hex) / 2 AS INT)),
      |           i -> (CAST(strpos('0123456789abcdef', substring(hex, 2*i-1, 1)) AS BIGINT) - 1) * 16
      |                + CAST(strpos('0123456789abcdef', substring(hex, 2*i, 1)) AS BIGINT) - 1))
      |           AS BIGINT) AS byte_sum
      |  FROM h)
      |SELECT doc_id, container, payload_hint, n_bytes, byte_sum,
      |       ROUND(CAST(byte_sum AS DOUBLE) / CAST(n_bytes AS DOUBLE), 6) AS mean_byte
      |FROM b
      |ORDER BY doc_id""".stripMargin

  // ---- #85 q_multimodal_framesample --------------------------------------
  // Frame sampling for "video" media: every 2nd frame of an
  // n_frames-long container (n_frames from the metadata: 1 + n_chars
  // div 40, capped at 8). The split of labor is the one that scales:
  //  - frame-INDEX selection is declarative (explode(sequence(...)))
  //    — Catalyst sees the one-to-many, prunes and pushes around it;
  //  - frame DECODE is partition-wise imperative (mapPartitions with
  //    per-partition codec init — here the FAKE decoder derives the
  //    frame's 16 bytes as md5("<media hex>-<idx>"), a stand-in for
  //    seeking a real container).
  // Fully oracle-checked: DuckDB reproduces the same frame hashes and
  // byte stats from MD5 strings.
  val qMultimodalFramesample: Q = (s, dir) => {
    import s.implicits._
    val frames = Tables.documents(s, dir)
      .select(col("doc_id"),
        unhex(md5(col("text"))).as("media"),
        expr("CAST(least(n_chars div 40 + 1, 8) AS INT)").as("n_frames"))
      .select(col("doc_id"), col("media"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, 2)")).as("frame_idx"))
    val decoded = frames
      .select(col("doc_id"), col("media"), col("n_frames"), col("frame_idx"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        // per-partition decoder init (real code: open codec once)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexChars = "0123456789abcdef"
        it.map { case (id, media, nFrames, idx) =>
          val hex = media.map(b => s"${hexChars((b >> 4) & 0xf)}${hexChars(b & 0xf)}").mkString
          md.reset()
          val frame = md.digest(s"$hex-$idx".getBytes("UTF-8"))
          val (nBytes, byteSum) = decodeStub(frame)
          (id, idx, nFrames, nBytes, byteSum)
        }
      }
      .toDF("doc_id", "frame_idx", "n_frames", "frame_bytes", "frame_byte_sum")
    decoded
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("frame_bytes"), col("frame_byte_sum"),
        round(col("frame_byte_sum").cast("double") /
          col("frame_bytes").cast("double"), 6).as("frame_mean"))
      .orderBy("doc_id", "frame_idx")
  }

  val qMultimodalFramesampleSql: String =
    """WITH h AS (SELECT doc_id, MD5(text) AS hex,
      |                  CAST(LEAST(n_chars // 40 + 1, 8) AS INT) AS n_frames
      |           FROM documents),
      |f AS (SELECT doc_id, hex, n_frames,
      |             UNNEST(generate_series(0, n_frames - 1, 2)) AS frame_idx
      |      FROM h),
      |fr AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, n_frames,
      |              MD5(hex || '-' || CAST(frame_idx AS VARCHAR)) AS fhex
      |       FROM f),
      |b AS (
      |  SELECT doc_id, frame_idx, n_frames,
      |         CAST(LENGTH(fhex) / 2 AS INT) AS frame_bytes,
      |         CAST(list_sum(list_transform(generate_series(1, CAST(LENGTH(fhex) / 2 AS INT)),
      |           i -> (CAST(strpos('0123456789abcdef', substring(fhex, 2*i-1, 1)) AS BIGINT) - 1) * 16
      |                + CAST(strpos('0123456789abcdef', substring(fhex, 2*i, 1)) AS BIGINT) - 1))
      |           AS BIGINT) AS frame_byte_sum
      |  FROM fr)
      |SELECT doc_id, frame_idx, n_frames, frame_bytes, frame_byte_sum,
      |       ROUND(CAST(frame_byte_sum AS DOUBLE) / CAST(frame_bytes AS DOUBLE), 6) AS frame_mean
      |FROM b
      |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_multimodal_decode" -> qMultimodalDecode,
    "q_multimodal_framesample" -> qMultimodalFramesample,
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_decode" -> qMultimodalDecodeSql,
    "q_multimodal_framesample" -> qMultimodalFramesampleSql,
  )
}
