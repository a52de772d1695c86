package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decoder tier is REAL for image headers: [[MediaCodec.decodeDims]]
  * extracts (codec, width, height) from PNG/JPEG/GIF/BMP bytes with no
  * image library. Payloads no header recognizes (plain text, audio)
  * fall back to content fingerprinting (byte sum + head hex) with
  * width/height 0 — swap in a full codec there and nothing else
  * changes.
  *
  * Scale notes: payload bytes never shuffle — features are extracted in
  * the scan stage via mapPartitions; only the (id, features) rows move.
  * Partition sizing for ~1 MB payloads is controlled with
  * `spark.sql.files.maxPartitionBytes`, not row counts.
  */
object Multimodal {

  /** A media row: opaque bytes + metadata travelling alongside. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      format: String, n_bytes: Long)

  /** Extracted features: content fingerprint + decoded header dims
    * (codec "bin", 0×0 when no image header is recognized).
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      byte_sum: Long, head_hex: String, codec: String, width: Int, height: Int)

  /** Wrap a text table as binary payloads (fixture stand-in for
    * image/audio bytes).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("txt").as("format"),
      octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** Deterministic image fixture table: one header-valid PNG/JPEG/GIF
    * payload per doc id, dimensions derived from the id (so an oracle
    * can recompute them without reading bytes).
    */
  def syntheticImageTable(spark: SparkSession, ids: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (16 + (id * 7) % 1000).toInt
      val h = (16 + (id * 13) % 800).toInt
      val payload = (id % 3) match {
        case 0 => MediaCodec.pngBytes(w, h)
        case 1 => MediaCodec.jpegBytes(w, h)
        case _ => MediaCodec.gifBytes(w, h)
      }
      MediaRow(id, payload, Seq("png", "jpeg", "gif")((id % 3).toInt),
        payload.length.toLong)
    }.toDF()
  }

  /** Content fingerprint for payloads without a recognized header. */
  private def byteSum(payload: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    sum
  }

  /** Per-partition feature extraction — the mapPartitions shape a real
    * full decoder needs (amortized per-partition init, streaming
    * iterator, no whole-partition materialization). Header decode is
    * real ([[MediaCodec.decodeDims]]); pixel decode would slot into the
    * same loop.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, buffers)
        rows.map { r =>
          val headHex = r.payload.take(8).map("%02x".format(_)).mkString
          MediaCodec.decodeDims(r.payload) match {
            case Some((codec, w, h)) =>
              MediaFeatures(r.doc_id, r.n_bytes, byteSum(r.payload),
                headHex, codec, w, h)
            case None =>
              MediaFeatures(r.doc_id, r.n_bytes, byteSum(r.payload),
                headHex, "bin", 0, 0)
          }
        }
      }
  }
}
