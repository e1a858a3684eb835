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

  val queries: Map[String, Q] = Map(
    "q_multimodal_decode" -> qMultimodalDecode,
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_decode" -> qMultimodalDecodeSql,
  )
}
