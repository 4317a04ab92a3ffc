package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in partition-local batches.
  *
  * Image decode is REAL for PNG/JPEG/GIF/BMP via `javax.imageio` (ships in
  * the JDK — no external codec dependency); payloads ImageIO cannot decode
  * fall back to a clearly-marked deterministic stub so text-as-bytes test
  * media still flows. The scale-relevant properties hold either way:
  * media bytes never shuffle; decode/feature-extract run map-side via
  * mapPartitions, and only small feature rows flow on.
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
  case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      frames: Long,
      duration_ms: Double,
      rms: Double, // normalized to [0,1] (full-scale 16-bit = 1.0)
      peak: Double,
      zero_crossing_rate: Double)

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

  /** Synthetic PNG media: one REAL encoded image per document whose
    * dimensions and solid gray level derive arithmetically from doc_id —
    * so a SQL oracle can predict exactly what a correct decoder must
    * report (width = 16 + id%16, height = 16 + (7·id)%16, luma = id%256).
    * Encoded partition-local, like a real ingest would decode.
    */
  def pngFixtureFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Samples.table(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 16 + ((7 * id) % 16).toInt
          val gray = (id % 256).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val rgb = (gray << 16) | (gray << 8) | gray
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          MediaRow(id, "image", out.toByteArray, Map("codec" -> "png"))
        }
      }
  }

  /** Synthetic UNDECODABLE media: deterministic bytes derived from doc_id
    * (length `100 + id%50`, byte j = `(7·id + 13·j) mod 256`) that no
    * ImageIO reader claims — byte 1 never completes any JDK magic that
    * byte 0 starts — so the STUB fallback's features are exact arithmetic
    * a SQL oracle can state (the pngFixture trick for the stub path).
    */
  def stubFixtureFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Samples.table(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (100 + id % 50).toInt
        val bytes = Array.tabulate(n)(j => ((7 * id + 13 * j) % 256).toByte)
        MediaRow(id, "blob", bytes, Map("codec" -> "none"))
      })
  }

  /** real decode: PNG/JPEG/GIF/BMP via the JDK's ImageIO; None when the
    * payload is not a decodable image
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** real multi-frame decode (animated GIF via the JDK's GIF reader):
    * all frames of the payload, None when no ImageIO reader claims it
    */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[BufferedImage]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map(reader.read(_)).toVector)
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Synthetic animated-GIF media: one REAL multi-frame GIF per document
    * — `2 + id%4` solid-gray frames of `(id + 31·f) % 256` at
    * `(16 + id%8) × (16 + 3·id%8)` — so a SQL oracle can predict the
    * frame count and each frame's exact luma (solid gray survives the
    * GIF palette losslessly). Encoded partition-local via the JDK GIF
    * writer's sequence API; no external codecs.
    */
  def gifFixtureFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Samples.table(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 8).toInt
          val h = 16 + ((3 * id) % 8).toInt
          val nFrames = 2 + (id % 4).toInt
          val writer = ImageIO.getImageWritersByFormatName("gif").next()
          val out = new ByteArrayOutputStream()
          val ios = ImageIO.createImageOutputStream(out)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          (0 until nFrames).foreach { f =>
            val gray = ((id + 31 * f) % 256).toInt
            val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val rgb = (gray << 16) | (gray << 8) | gray
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
          ios.close()
          writer.dispose()
          MediaRow(id, "video", out.toByteArray, Map("codec" -> "gif"))
        }
      }
  }

  /** STUB decode fallback for non-image payloads: derives deterministic
    * dimensions/stats from the bytes so text-as-bytes media still flows
    * through the same plumbing.
    */
  // ---- audio -----------------------------------------------------------

  /** Synthetic WAV media: one REAL RIFF/PCM-encoded file per document
    * whose signal is a Nyquist-rate square wave (samples alternate
    * +a, −a) so every feature is an exact arithmetic function of doc_id:
    * frames = 800 + id%800, a = 1000 + (id%7)·3000 (16-bit units),
    * RMS = peak = a/32768, zero-crossing rate = 1 (a crossing at every
    * adjacent pair). Encoded partition-local via `javax.sound.sampled`
    * (ships in the JDK — no native codecs), exactly the image-fixture
    * pattern.
    */
  def wavFixtureFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Samples.table(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val frames = (800 + id % 800).toInt
          val a = (1000 + (id % 7) * 3000).toInt
          val pcm = new Array[Byte](frames * 2)
          var i = 0
          while (i < frames) {
            val v = if (i % 2 == 0) a else -a
            pcm(2 * i) = (v & 0xff).toByte // little-endian 16-bit
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, frames.toLong)
          val out = new ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          MediaRow(id, "audio", out.toByteArray, Map("codec" -> "wav"))
        }
      }
  }

  /** real decode: WAV/AU/AIFF via the JDK's sampled-audio SPI, converted
    * to 16-bit signed PCM; None when the payload is not decodable audio
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
    try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val f0 = src.getFormat
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
        f0.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, src)
      val raw = pcm.readAllBytes()
      val samples = new Array[Short](raw.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some((f0.getSampleRate.toInt, f0.getChannels, samples))
    } catch { case _: Exception => None }

  /** decode + feature-extract, partition-local: real JDK decode with a
    * deterministic byte-derived stub for undecodable payloads (same
    * policy as [[imageFeatures]]); audio bytes never shuffle
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeAudio(r.bytes) match {
        case Some((rate, channels, samples)) =>
          val frames = samples.length / math.max(channels, 1)
          var sumSq = 0.0
          var peak = 0.0
          var crossings = 0L
          var i = 0
          while (i < samples.length) {
            val v = samples(i) / 32768.0
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i >= channels &&
              (samples(i) < 0) != (samples(i - channels) < 0)) crossings += 1
            i += 1
          }
          val n = math.max(samples.length, 1)
          AudioFeatures(r.media_id, rate, channels, frames,
            frames * 1000.0 / math.max(rate, 1), math.sqrt(sumSq / n), peak,
            if (samples.length > channels)
              crossings.toDouble / (samples.length - channels)
            else 0.0)
        case None =>
          // STUB (clearly marked): byte-derived deterministic features so
          // opaque payloads still flow through the same schema
          val n = math.max(r.bytes.length, 1)
          val mean = r.bytes.map(b => (b & 0xff).toDouble).sum / n
          AudioFeatures(r.media_id, 0, 0, r.bytes.length, 0.0,
            mean / 255.0, mean / 255.0, 0.0)
      }
    })
  }

  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    if (bytes.isEmpty) (0, 0, 0, 0.0)
    else {
      val w = 64 + (math.abs(bytes.head.toInt) % 64)
      val h = 64 + (math.abs(bytes.last.toInt) % 64)
      val luma = bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      (w, h, 3, luma)
    }
  }

  private def lumaOf(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** 64-bit average hash over an 8×8 downscale of the decoded image —
    * the standard aHash perceptual fingerprint
    */
  private def averageHash(img: BufferedImage): Long = {
    val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val lumas = Array.tabulate(64)(i => lumaOf(small.getRGB(i % 8, i / 8)))
    val mean = lumas.sum / 64
    lumas.zipWithIndex.foldLeft(0L) { case (acc, (l, i)) =>
      if (l > mean) acc | (1L << i) else acc
    }
  }

  /** stub fingerprint for undecodable payloads: sign bits of byte-block sums */
  private def byteHash(bytes: Array[Byte]): Long = {
    val block = math.max(1, bytes.length / 64)
    var ph = 0L
    var i = 0
    while (i < 64) {
      val from = i * block
      val until = math.min(bytes.length, from + block)
      var s = 0L
      var j = from
      while (j < until) { s += (bytes(j) & 0xff) - 128; j += 1 }
      if (s > 0) ph |= (1L << i)
      i += 1
    }
    ph
  }

  /** decode + feature-extract, partition-local: real ImageIO decode with
    * the stub as fallback for undecodable payloads
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.bytes) match {
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            val channels = img.getRaster.getNumBands
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
              y += 1
            }
            ImageFeatures(r.media_id, w, h, channels,
              sum / (w.toLong * h), averageHash(img))
          case None =>
            val (w, h, c, luma) = decodeImageStub(r.bytes)
            ImageFeatures(r.media_id, w, h, c, luma, byteHash(r.bytes))
        }
      }
    }
  }

  /** resize: real scale + PNG re-encode for decodable images (bytes in,
    * bytes out, no shuffle); opaque payloads keep the metadata-only stub.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeImage(r.bytes) match {
        case Some(img) =>
          val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val out = new ByteArrayOutputStream()
          ImageIO.write(scaled, "png", out)
          r.copy(bytes = out.toByteArray, meta = r.meta + ("resized" -> s"${w}x$h"))
        case None =>
          r.copy(meta = r.meta + ("resized" -> s"${w}x$h"))
      }
    })
  }

  /** Frame sampling for video-kind media, partition-local one-to-many
    * (never on the driver). Payloads ImageIO can decode multi-frame
    * (animated GIF — the JDK reader needs no native codecs) get REAL
    * frames, each re-encoded as PNG; opaque payloads (actual video
    * codecs aren't in the JDK) keep the byte-chunk STUB: every nth
    * fixed-size chunk becomes a "frame" row so the plumbing — schema,
    * partitioning, explode shape — still runs end-to-end.
    */
  def sampleFrames(media: Dataset[MediaRow], chunk: Int, everyNth: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeFrames(r.bytes) match {
        case Some(frames) if frames.nonEmpty =>
          frames.zipWithIndex.collect {
            case (img, i) if i % everyNth == 0 => Frame(r.media_id, i, encodePng(img))
          }
        case _ =>
          r.bytes.grouped(chunk).zipWithIndex.collect {
            case (b, i) if i % everyNth == 0 => Frame(r.media_id, i, b)
          }.toSeq
      }
    }
  }

  /** per-frame stats for sampled frames: frame count + each frame's mean
    * luma, decoded map-side from the PNG-encoded frame bytes
    */
  def frameStats(frames: Dataset[Frame]): DataFrame = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map { f =>
      val luma = decodeImage(f.bytes) match {
        case Some(img) =>
          var sum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += lumaOf(img.getRGB(x, y)); x += 1 }
            y += 1
          }
          sum / (img.getWidth.toLong * img.getHeight)
        case None => -1.0
      }
      (f.media_id, f.frame_no, luma)
    }).toDF("media_id", "frame_no", "luma")
  }
}
