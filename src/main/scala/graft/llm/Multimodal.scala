package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media ride along as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as
  * typed `mapPartitions` batches (the Scala analog of arrow-batched
  * pandas UDFs — per-partition setup amortizes model/codec init, rows
  * stream through without driver involvement).
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment) with deterministic byte-level fakes — `decodeBytes`
  * is the single seam to swap in a real decoder. Everything around the
  * stub (schema, encoders, partitioning, batch iteration) is real and
  * oracle-tested.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, kind: String, n_bytes: Int, payload: Array[Byte])

  /** Extracted features; in a real pipeline `embedding` would come from
    * the decoded media.
    */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      avg_byte: Double,
      stub_width: Int,
      stub_height: Int
  )

  /** STUB decoder: a real implementation would parse the codec here
    * (JPEG/PNG/WAV...). The deterministic fake derives "dimensions" from
    * the payload so the full pipeline is testable end-to-end.
    */
  private def decodeBytes(payload: Array[Byte]): (Double, Int, Int) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val avg = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (avg, payload.length % 640, (payload.length * 7) % 480)
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes. Stands in
    * for reading real image/audio blobs from parquet binary columns.
    * n_bytes is the PAYLOAD byte length (octet_length), so metadata and
    * payload stay consistent for non-ASCII text too. (The oracle-parity
    * queries additionally assume an ASCII corpus, where bytes == chars
    * == code points; that assumption lives in the oracle SQL, not here.)
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text/plain").as("kind"),
      octet_length(col(textCol)).cast("int").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload")
    )

  /** Batched feature extraction over the binary column. Partition-level
    * iteration: codec/model setup would happen once per partition before
    * the row loop — the structure that matters at scale.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (avg, w, h) = decodeBytes(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.n_bytes, avg, w, h)
      }
    }
  }

  /** Frame sampling stub: every media row fans out to `frames` sampled
    * "frames" (deterministic offsets), the shape of video-frame
    * extraction — one input row, n output rows, batch-friendly.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frames: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      (0 until frames).map { f =>
        val off = if (r.n_bytes == 0) 0 else (f * r.n_bytes) / frames
        val b = if (r.payload.isEmpty) 0 else r.payload(off.min(r.payload.length - 1)) & 0xff
        (r.doc_id, f, off, b)
      }
    }.toDF("doc_id", "frame", "offset", "first_byte")
  }
}
