package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (the container
  * has no image/audio codecs); everything around it — schema, batch
  * shape, partitioning, typed Dataset plumbing — is real and is what
  * matters at 100 TB: media bytes never shuffle; decode/feature-extract
  * run map-side via mapPartitions, and only small feature rows flow on.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: Map[String, String])
  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double,
      phash: Long)
  case class Frame(media_id: Long, frame_no: Int, bytes: Array[Byte])

  /** Wrap documents as fake media rows: text bytes stand in for an
    * encoded image payload. Real pipelines land bytes from object
    * storage; the schema and flow are identical.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Samples.table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        col("text").cast("binary").as("bytes"),
        map(lit("source"), col("source")).as("meta"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would call an image codec here.
    * This fake derives deterministic dimensions/stats from the bytes so
    * the downstream plumbing is testable. Runs per-partition (batch
    * shape) — the real codec call sits in exactly this loop.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    if (bytes.isEmpty) (0, 0, 0, 0.0)
    else {
      val w = 64 + (math.abs(bytes.head.toInt) % 64)
      val h = 64 + (math.abs(bytes.last.toInt) % 64)
      val luma = bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      (w, h, 3, luma)
    }
  }

  /** decode + feature-extract, partition-local */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, luma) = decodeImageStub(r.bytes)
        // 64-bit perceptual-hash stand-in: sign bits of byte-block sums
        val block = math.max(1, r.bytes.length / 64)
        var ph = 0L
        var i = 0
        while (i < 64) {
          val from = i * block
          val until = math.min(r.bytes.length, from + block)
          var s = 0L
          var j = from
          while (j < until) { s += (r.bytes(j) & 0xff) - 128; j += 1 }
          if (s > 0) ph |= (1L << i)
          i += 1
        }
        ImageFeatures(r.media_id, w, h, c, luma, ph)
      }
    }
  }

  /** resize stub: keeps the byte payload opaque, rewrites metadata —
    * the Spark-side shape of a real resize (bytes in, bytes out, no
    * shuffle).
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(meta = r.meta ++ Map("resized" -> s"${w}x$h"))))
  }

  /** frame-sample stub for video-kind media: every nth fixed-size chunk
    * of the payload becomes a "frame" row (one-to-many explode done
    * partition-local, never on the driver).
    */
  def sampleFrames(media: Dataset[MediaRow], chunk: Int, everyNth: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.bytes.grouped(chunk).zipWithIndex.collect {
        case (b, i) if i % everyNth == 0 => Frame(r.media_id, i, b)
      }
    }
  }
}
