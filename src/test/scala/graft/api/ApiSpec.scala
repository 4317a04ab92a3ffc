package graft.api

import graft.SparkSpec
import graft.core.SampleStore
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ApiSpec extends SparkSpec {

  private lazy val samples: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("up", Map("job" -> "api", "inst" -> "a"), 1000L, 1.0),
      ("up", Map("job" -> "api", "inst" -> "b"), 1000L, 0.0),
      ("up", Map("job" -> "web", "inst" -> "c"), 2000L, 1.0),
      ("errs", Map("job" -> "api"), 86400000L * 40, 3.0))
      .toDF("name", "tags", "ts", "value")
  }

  test("series / labels / labelValues / seriesCount / tsdbStatus") {
    val ser = Api.series(samples, """up{job="api"}""", 0L, 10000L)
    assert(ser.count() == 2)
    assert(Api.labels(samples).collect().map(_.getString(0)).toSet ==
      Set("__name__", "job", "inst"))
    assert(Api.labelValues(samples, "job").collect().map(_.getString(0)).toSet ==
      Set("api", "web"))
    assert(Api.labelValues(samples, "__name__").collect().map(_.getString(0)).toSet ==
      Set("up", "errs"))
    assert(Api.seriesCount(samples).collect().head.getLong(0) == 4L)
    val top = Api.tsdbStatus(samples).collect()
    assert(top.head.getString(0) == "up" && top.head.getLong(1) == 3L)
  }

  test("negated positive-name selector keeps null-name rows (tombstone filter)") {
    val s = spark
    import s.implicits._
    // null-name rows are legal in the canonical frame (graphite delete
    // predicates coalesce for the same reason); a delete_series tombstone
    // for {__name__="up"} is applied NEGATED, and a bare `name = 'up'`
    // yields SQL NULL there — `!NULL` is NULL and the filter would
    // silently drop the row. The isNotNull conjunction keeps it.
    val withNull = Seq(
      (Option("up"), Map("job" -> "api"), 1000L, 1.0),
      (Option.empty[String], Map("job" -> "api"), 1000L, 2.0))
      .toDF("name", "tags", "ts", "value")
    val kept = withNull.filter(!Api.selectorPredicate("""{__name__="up"}""")).collect()
    assert(kept.length == 1 && kept.head.isNullAt(0),
      "null-name row must survive a positive-name delete tombstone")
    // and the positive form still matches only the named row
    assert(withNull.filter(Api.selectorPredicate("""{__name__="up"}""")).count() == 1)
  }

  test("instant query and raw range export") {
    val inst = Api.query(samples, """up{job="api"}""", 1000L)
    assert(inst.count() == 2)
    val raw = Api.rawRange(samples, "up", 2000L, 1500L)
    assert(raw.count() == 3)
    val exported = Api.export(samples, "up", 0L, 10000L)
    assert(exported.count() == 3) // one JSON line per series
  }

  test("sample store: date partitioning, pruning, retention, compaction, delete") {
    val dir = Files.createTempDirectory("store").toString
    SampleStore.write(samples, dir, SaveMode.Overwrite)
    // partition layout on disk
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("date="))
    assert(parts.length == 2) // 1970-01-01 and the +40d partition
    // range read prunes to one partition and filters rows
    val ranged = SampleStore.readRange(spark, dir, 0L, 10000L)
    assert(ranged.count() == 3)
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("date"))
    // retention drops the old partition
    val kept = Files.createTempDirectory("kept").toString
    SampleStore.applyRetention(spark, dir, kept, 86400000L * 30)
    assert(SampleStore.read(spark, kept).count() == 1)
    // compaction dedups per interval (two 'up' api samples at 1000 in one bucket)
    val compacted = Files.createTempDirectory("compact").toString
    SampleStore.compact(spark, dir, compacted, 0L, 10000L)
    val c = SampleStore.read(spark, compacted)
    assert(c.count() == 4) // distinct series keep one sample each here
    // delete_series = anti-filter rewrite
    val deleted = Files.createTempDirectory("deleted").toString
    SampleStore.deleteSeries(spark, dir, deleted, col("name") === "errs")
    assert(SampleStore.read(spark, deleted).filter(col("name") === "errs").count() == 0)
  }

  test("query deadline cancels the request's Spark jobs") {
    import org.apache.spark.sql.functions.udf
    val done = spark.sparkContext.longAccumulator("deadline-rows-done")
    val slow = udf { (i: Long) => Thread.sleep(5000L); done.add(1L); i }
    val failed =
      try {
        QueryDeadline.run(spark, 300L) {
          spark.range(64).repartition(32)
            .select(slow(col("id")).as("v")).agg(sum("v")).collect()
        }
        false
      } catch { case _: Exception => true }
    assert(failed, "deadline did not cancel the job")
    // Load-robust cancellation proof: an uncancelled run completes all 64
    // five-second rows; the 300 ms deadline interrupts every in-flight
    // task at its first sleep (killed tasks never merge accumulator
    // updates), so only a handful of rows can finish even on a heavily
    // contended machine. The previous wall-clock bound (<4 s) tripped
    // when the suite runs as concurrent forked groups.
    assert(done.value < 32, s"cancellation ineffective: ${done.value}/64 rows ran")
    // the session still works afterwards (group cleared, executors freed)
    assert(spark.range(10).count() == 10)
    // clamping: absent/oversized/non-positive fall back to the 30s max
    assert(QueryDeadline.clamp(None) == 30000L)
    assert(QueryDeadline.clamp(Some(60000L)) == 30000L)
    assert(QueryDeadline.clamp(Some(0L)) == 30000L)
    assert(QueryDeadline.clamp(Some(5000L)) == 5000L)
  }

  test("sample store snapshots: hard-linked, immutable, listable, deletable") {
    val dir = Files.createTempDirectory("snapstore").toString
    SampleStore.write(samples, dir, SaveMode.Overwrite)
    val before = SampleStore.read(spark, dir).count()
    val name = SampleStore.createSnapshot(dir)
    assert(name.matches("""\d{14}-[0-9A-F]{8}"""))
    assert(SampleStore.listSnapshots(dir) == Seq(name))
    // the snapshot reads back as a full copy of the store (_snapshots:
    // an unprefixed dir inside the root breaks partition discovery, r9)
    val snap = SampleStore.read(spark, s"$dir/_snapshots/$name")
    assert(snap.count() == before)
    // appending to the live store does NOT change the snapshot (immutability)
    SampleStore.write(samples.limit(1), dir)
    assert(SampleStore.read(spark, s"$dir/_snapshots/$name").count() == before)
    // a second snapshot sees the append; both list sorted
    val name2 = SampleStore.createSnapshot(dir)
    assert(SampleStore.read(spark, s"$dir/_snapshots/$name2").count() == before + 1)
    assert(SampleStore.listSnapshots(dir) == Seq(name, name2).sorted)
    // delete is safe against traversal and removes exactly one snapshot
    assert(!SampleStore.deleteSnapshot(dir, "../" + name))
    assert(SampleStore.deleteSnapshot(dir, name))
    assert(!SampleStore.deleteSnapshot(dir, name))
    assert(SampleStore.listSnapshots(dir) == Seq(name2))
  }
}
