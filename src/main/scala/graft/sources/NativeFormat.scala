package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `/api/v1/export/native` + `/api/v1/import/native`.
  *
  * The reference's native format is its internal storage block encoding
  * (lib/protoparser/native, app/vmselect/prometheus/prometheus.go:263
  * ExportNativeHandler) and is documented as usable only between VM
  * instances of compatible versions. This engine's storage-native format
  * is Parquet (SURVEY §1.2), so the native export IS a Parquet file of
  * the canonical sample schema `(name, tags, ts, value)` — the same
  * deviation class as "VM native binary ↔ Parquet" in SURVEY §2.0:
  * self-describing, column-compressed, and readable by any
  * Spark/DuckDB/Arrow consumer rather than only by a sibling instance.
  *
  * Both directions round-trip through a driver-local temp file because
  * the HTTP facade hands whole bodies; at cluster scale the same frames
  * go straight to `df.write.parquet(objectStorePath)` with no
  * single-file collapse.
  */
object NativeFormat {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })

  /** samples frame → bytes of ONE parquet file (coalesced: an HTTP
    * response body is inherently one stream)
    */
  def exportNative(samples: DataFrame): Array[Byte] = {
    val dir = Files.createTempDirectory("graft-native-export")
    try {
      val out = dir.resolve("out")
      samples.select("name", "tags", "ts", "value")
        .coalesce(1)
        .write.mode("overwrite").parquet(out.toString)
      val part = Files.list(out).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst()
      if (part.isPresent) Files.readAllBytes(part.get())
      else Array.emptyByteArray // zero-row export still yields a part file; belt+braces
    } finally deleteRecursively(dir)
  }

  /** parquet file bytes → samples frame, materialized before the temp
    * file is removed
    */
  def importNative(spark: SparkSession, body: Array[Byte]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-native-import")
    try {
      val f = dir.resolve("in.parquet")
      Files.write(f, body)
      val df = spark.read.parquet(f.toString).select("name", "tags", "ts", "value")
      spark.createDataFrame(df.collect().toList.asJava, df.schema)
    } finally deleteRecursively(dir)
  }
}
