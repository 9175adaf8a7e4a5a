package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.Q

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batch (the Scala analog of Python's
  * mapInPandas — one iterator per partition, amortized setup, no per-row
  * driver involvement).
  *
  * The container has no image/audio codecs, so the decoder is a STUB
  * ([[StubDecoder]]) with deterministic fake features; everything around it
  * — the binary schema, the typed Dataset, the partition-wise batch loop,
  * the frame-sampling slice logic — is real and tested. Swapping in a real
  * codec changes only [[StubDecoder.decode]].
  */
object Multimodal {

  /** A media row: id + raw bytes + declared mime. */
  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features (what a real decode/embed stage would emit). */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, header_byte: Int,
      checksum: Long)

  /** STUB decoder: a real implementation would parse the codec here.
    * The fake is deterministic arithmetic over the payload so tests and
    * oracles can check the plumbing end-to-end. */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      // ??? <- real codec goes here; deterministic fake below
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
        if (r.payload.nonEmpty) r.payload(0) & 0xff else -1, sum % 997L)
    }

    /** Frame sampling: every stride-th byte-window as a "frame" — the
      * slice/batch shape of real video frame extraction. */
    def sampleFrames(payload: Array[Byte], frameSize: Int,
        stride: Int): Seq[Array[Byte]] =
      payload.grouped(frameSize).grouped(stride).map(_.head).toSeq
  }

  /** Fabricate a media table from `documents` (text bytes as payload) —
    * the ingestion adapter a real pipeline would replace with binary file
    * reads (`spark.read.format("binaryFile")`). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Partition-wise feature extraction: the batch-UDF shape. Each task
    * decodes its partition's rows in one iterator pass — codec setup would
    * be hoisted before the map, once per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(StubDecoder.decode)
    }
  }

  /** The feature-extraction pipeline as a registered query; the oracle
    * recomputes the stub's arithmetic (byte length / first byte / byte-sum
    * checksum) in SQL over the same text. */
  val qMultimodalFeatures: Q = Q("q_multimodal_features",
    """SELECT doc_id, 'text/plain' AS mime,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  ascii(substring(text, 1, 1)) AS header_byte,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |         i -> ascii(substring(text, i, 1)))) % 997 AS BIGINT)
      |    AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    extractFeatures(mediaTable(s, d)).toDF().orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(qMultimodalFeatures)
}
