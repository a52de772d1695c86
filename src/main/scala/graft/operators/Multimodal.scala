package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side structure — schema, batch iteration shape, partition
  * sizing — is real and tested; the *decoder* is a deterministic STUB
  * (this container has no image/audio libraries). A production build
  * swaps [[stubDecode]] for a real codec; nothing else changes.
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

  /** Extracted features (the stub's deterministic fake). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      byte_sum: Long, head_hex: String, width: Int, height: Int)

  /** Wrap a text table as binary payloads (fixture stand-in for
    * image/audio bytes).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("txt").as("format"),
      octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** STUB decoder — deterministic fake standing in for e.g. JPEG decode.
    * Replace with a real codec in production; signature stays the same.
    */
  def stubDecode(payload: Array[Byte]): (Long, Int, Int) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    // fake "dimensions" derived from content so tests can assert on them
    val w = 64 + (sum % 64).toInt
    val h = 64 + ((sum >> 6) % 64).toInt
    (sum, w, h)
  }

  /** Per-partition feature extraction — the mapPartitions shape a real
    * decoder needs (amortized per-partition init, streaming iterator, no
    * whole-partition materialization).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload", "format", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, buffers)
        rows.map { r =>
          val (sum, w, h) = stubDecode(r.payload)
          val headHex = r.payload.take(8).map("%02x".format(_)).mkString
          MediaFeatures(r.doc_id, r.n_bytes, sum, headHex, w, h)
        }
      }
  }
}
