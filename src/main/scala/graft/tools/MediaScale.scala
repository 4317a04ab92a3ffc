package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal throughput rung (round 10): the pipeline's decode /
  * feature-extract / resize / frame-sample paths are gated for
  * correctness (arithmetic PNG/GIF/WAV fixtures) but had no rows/s or
  * MB/s number. This generates N REAL PNGs partition-local — 128×(96+id%64)
  * with a per-pixel arithmetic pattern so the encoded bytes are
  * non-trivial (~solid-gray PNGs compress to nothing and flatter the
  * decoder) — plus N opaque 64 KB blobs for the chunk path, and times:
  *
  *   - imageFeatures: full decode + luma + aHash per image
  *   - resize to 32×32 + PNG re-encode
  *   - sampleFrames over opaque blobs (byte-chunk path)
  *
  * Everything is partition-local (bytes never shuffle) — the wall time
  * divides by executors on a cluster; the per-image cost is the number
  * that matters. Env: MEDIASCALE_IMAGES (default 20000).
  */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MEDIASCALE_IMAGES", "20000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("mediascale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.pipeline.Multimodal

    val media = spark.range(n).as[Long].mapPartitions(_.map { id =>
      val w = 128
      val h = 96 + (id % 64).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // splitmix-style per-pixel mix: PNG's delta filters can't
          // squeeze it, so encoded size is realistic (~3 B/px)
          var z = x * 2654435761L ^ (y.toLong << 32) ^ id * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      Multimodal.MediaRow(id, "image", out.toByteArray, Map("codec" -> "png"))
    })

    // materialize inputs once so generation cost is excluded from the
    // decode timings (persist holds the encoded bytes, ~30 KB/image)
    media.persist()
    val totalBytes = media.map(_.bytes.length.toLong).reduce(_ + _)
    println(f"[mediascale] $n PNGs, ${totalBytes / 1e6}%.1f MB encoded (${totalBytes.toDouble / n / 1024}%.1f KB avg)")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[mediascale] $label%-26s $s%8.2f s  ${n / s}%9.0f img/s  ${totalBytes / s / 1e6}%8.1f MB/s (result $out)")
    }
    timed("imageFeatures (decode+aHash)") {
      Multimodal.imageFeatures(media).filter(_.width == 128).count()
    }
    timed("resize 32x32 + re-encode") {
      Multimodal.resize(media, 32, 32).map(_.bytes.length.toLong).reduce(_ + _)
    }
    val blobs = spark.range(n).as[Long].mapPartitions(_.map { id =>
      Multimodal.MediaRow(id, "blob",
        Array.tabulate(65536)(j => ((id + j * 31) % 256).toByte), Map.empty)
    }).persist()
    blobs.count()
    timed("sampleFrames 4K/8th (opaque)") {
      Multimodal.sampleFrames(blobs, 4096, 8).count()
    }
    spark.stop()
  }
}
