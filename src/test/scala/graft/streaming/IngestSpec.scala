package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** End-to-end write path: landing-zone text files → parse → relabel →
  * date-partitioned parquet, with the file sink's exactly-once manifest
  * proven across a query restart.
  */
class IngestSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"ingest_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def drop(dir: String, name: String, body: String): Unit =
    Files.write(Paths.get(dir, name), body.getBytes(StandardCharsets.UTF_8))

  test("landing zone → relabel → date-partitioned store, exactly-once across restart") {
    val landing = tmp("landing")
    val store = tmp("store")
    val ckpt = tmp("ckpt")
    // relabel: drop the debug series, rename job → service
    val yaml =
      """- action: drop
        |  source_labels: [job]
        |  regex: debug
        |- action: labelmap
        |  regex: "job"
        |  replacement: "service"
        |- action: labeldrop
        |  regex: "job"
        |""".stripMargin
    // two days of samples → two date partitions
    drop(landing, "a.txt",
      """m{job="api"} 1 1704067200000
        |m{job="debug"} 99 1704067200000
        |m{job="api"} 2 1704153600000
        |""".stripMargin)
    Ingest.promTextToStore(spark, landing, store, ckpt, Some(yaml))
      .awaitTermination()
    val first = Ingest.readStore(spark, store)
    assert(first.count() == 2) // debug row relabel-dropped
    assert(first.filter(col("tags").getItem("service") === "api").count() == 2)
    assert(first.filter(col("tags").getItem("job").isNotNull).count() == 0)
    // date partitioning on disk (the retention/pruning unit)
    val parts = new java.io.File(store).listFiles().map(_.getName).filter(_.startsWith("date="))
    assert(parts.toSet == Set("date=2024-01-01", "date=2024-01-02"), parts.mkString(","))

    // restart with the SAME checkpoint: the already-committed file must
    // not be re-ingested; only the new file lands
    drop(landing, "b.txt", """m{job="api"} 3 1704240000000""" + "\n")
    Ingest.promTextToStore(spark, landing, store, ckpt, Some(yaml))
      .awaitTermination()
    val second = Ingest.readStore(spark, store)
    assert(second.count() == 3, s"exactly-once violated: ${second.count()} rows")
    assert(second.agg(sum("value")).head().getDouble(0) == 6.0)

    // the streamed store is query-ready through the engine
    val grid = graft.core.GridSpec(1704067200000L, 1704240000000L, 86400000L)
    val res = graft.Engine.query(second, "m", grid, 90000000L)
      .filter(!isnan(col("value")))
    assert(res.count() == 3)
  }
}
