package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Background maintenance rounds (core.Maintenance + the retention
  * partition-drop primitive): retention drops whole expired date
  * partitions (the reference's retentionWatcher, table.go:446), tiers
  * trail the store incrementally, a dropped date propagates OUT of its
  * tiers in the same round, job failures land in the report instead of
  * killing the round, and the thread lifecycle is bounded.
  */
class MaintenanceSpec extends SparkSpec {

  private val D = 86400000L
  private val H = 3600000L
  private val D1 = 1704067200000L // 2024-01-01
  private val D2 = D1 + D
  private val D3 = D2 + D

  private def mkRows(rows: Seq[(String, Map[String, String], Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("name", "tags", "ts", "value")
  }

  private def dates(path: String): Seq[String] =
    new java.io.File(path).listFiles() match {
      case null => Nil
      case fs => fs.filter(_.getName.startsWith("date="))
        .map(_.getName.stripPrefix("date=")).toSeq.sorted
    }

  test("dropExpiredDates: whole days before the deadline only; missing root is a no-op") {
    val store = "target/maint_drop/store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/maint_drop"))
    assert(SampleStore.dropExpiredDates(spark, store, D3) == Nil)
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + H, 1.0),
      ("m", Map("job" -> "a"), D2 + H, 2.0),
      ("m", Map("job" -> "a"), D3 + H, 3.0))), store)
    // deadline mid day-2: day 1 is wholly expired, day 2 only partially —
    // the partial day stays and its expired head keeps serving until the
    // partition ages out whole (the reference's EVENTUAL retention: data
    // older than -retentionPeriod shows in queries until the background
    // deletion catches up)
    assert(SampleStore.dropExpiredDates(spark, store, D2 + 12 * H) ==
      Seq("2024-01-01"))
    assert(dates(store) == Seq("2024-01-02", "2024-01-03"))
    // idempotent: nothing left to drop at the same deadline
    assert(SampleStore.dropExpiredDates(spark, store, D2 + 12 * H) == Nil)
    val kept = SampleStore.read(spark, store)
      .select(col("value")).collect().map(_.getDouble(0)).toSet
    assert(kept == Set(2.0, 3.0))
  }

  test("step: retention drop propagates out of the tiers in the same round") {
    val root = "target/maint_step"
    val store = s"$root/store"
    val tier = s"$root/tier"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + 10 * 60000L, 1.0),
      ("m", Map("job" -> "a"), D1 + 20 * 60000L, 2.0),
      ("m", Map("job" -> "a"), D2 + 10 * 60000L, 3.0))), store)
    // clock parked at start of day 3, 2-day retention: nothing expired
    var now = D3
    val m = new Maintenance(spark, store, periodMs = 60000L,
      downsampleTiers = Map(H -> tier), retentionPeriodMs = 2 * D,
      nowMs = () => now)
    val r1 = m.step()
    assert(r1.errors.isEmpty && r1.droppedDates.isEmpty)
    assert(r1.downsampled(H) == Seq("2024-01-01", "2024-01-02"))
    assert(dates(tier) == Seq("2024-01-01", "2024-01-02"))
    // nothing changed: the next round is a fingerprint walk, no rebuilds
    val r2 = m.step()
    assert(r2.downsampled(H).isEmpty && r2.droppedDates.isEmpty)
    // a late arrival re-does just its date
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D2 + 30 * 60000L, 4.0))), store)
    assert(m.step().downsampled(H) == Seq("2024-01-02"))
    // the clock advances past day 1's retention: the SAME round drops the
    // store partition and the tier partition (vanished source date)
    now = D1 + 3 * D
    val r4 = m.step()
    assert(r4.droppedDates == Seq("2024-01-01"), r4.toString)
    assert(dates(store) == Seq("2024-01-02"))
    assert(dates(tier) == Seq("2024-01-02"), "tier must shed the dropped date")
    assert(r4.errors.isEmpty)
  }

  test("indexNewDates: incremental per-date index maintenance on a flat store") {
    val root = "target/maint_idx"
    val store = s"$root/store"
    val idx = s"$root/index"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    SampleStore.write(mkRows(Seq(
      ("a_metric", Map("job" -> "x"), D1 + H, 1.0),
      ("b_metric", Map("job" -> "y"), D2 + H, 2.0))), store)
    assert(SampleStore.indexNewDates(spark, store, idx) ==
      Seq("2024-01-01", "2024-01-02"))
    assert(SampleStore.indexNewDates(spark, store, idx).isEmpty, "idempotent")
    def names(): Set[String] = SampleStore.readTagIndex(spark, idx)
      .select(col("name")).collect().map(_.getString(0)).toSet
    assert(names() == Set("a_metric", "b_metric"))
    // a late arrival re-indexes just its date; the new name appears
    SampleStore.write(mkRows(Seq(
      ("c_metric", Map("job" -> "x"), D1 + 2 * H, 3.0))), store)
    assert(SampleStore.indexNewDates(spark, store, idx) == Seq("2024-01-01"))
    assert(names() == Set("a_metric", "b_metric", "c_metric"))
    // a retention drop propagates: day 1's names leave the index
    assert(SampleStore.dropExpiredDates(spark, store, D2) == Seq("2024-01-01"))
    assert(SampleStore.indexNewDates(spark, store, idx).isEmpty)
    assert(dates(idx) == Seq("2024-01-02"))
    assert(names() == Set("b_metric"))
    // a stray non-ISO partition dir (a null-ts row's
    // date=__HIVE_DEFAULT_PARTITION__) must be IGNORED, not kill every
    // future round at Date.valueOf
    new java.io.File(store, "date=__HIVE_DEFAULT_PARTITION__").mkdirs()
    assert(SampleStore.indexNewDates(spark, store, idx).isEmpty)
    // a missing flat root with an existing index aborts, not wipes
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    intercept[IllegalStateException] {
      SampleStore.indexNewDates(spark, store, idx)
    }
  }

  test("step: the tag index and the bucketized layout trail the store too") {
    val root = "target/maint_full"
    val store = s"$root/store"
    val tbl = "maint_full_table"
    val tpath = s"$root/table"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + H, 1.0),
      ("m", Map("job" -> "a"), D2 + H, 2.0))), store)
    var now = D3
    var rounds = 0
    val m = new Maintenance(spark, store, periodMs = 60000L,
      retentionPeriodMs = 2 * D,
      tagIndexPath = Some(s"$root/index"),
      bucketize = Some(Maintenance.BucketizeTarget(tbl, tpath, buckets = 2)),
      nowMs = () => now,
      afterRound = _ => rounds += 1)
    val r1 = m.step()
    assert(r1.errors.isEmpty, r1.toString)
    assert(r1.indexed == Seq("2024-01-01", "2024-01-02"))
    assert(r1.bucketized == Seq("2024-01-01", "2024-01-02"))
    assert(rounds == 1, "afterRound must fire")
    assert(SampleStore.readBucketed(spark, tbl).count() == 2)
    // clock past day 1's retention: store, index and bucketed layout all
    // shed the date in one round
    now = D1 + 3 * D
    val r2 = m.step()
    assert(r2.droppedDates == Seq("2024-01-01") && r2.errors.isEmpty, r2.toString)
    assert(dates(s"$root/index") == Seq("2024-01-02"))
    assert(SampleStore.readBucketed(spark, tbl).count() == 1)
  }

  test("step: a failing job lands in the report, the round survives") {
    val root = "target/maint_err"
    val store = s"$root/store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + H, 1.0))), store)
    // 7h does not divide a day: downsampleNewDates rejects it
    val m = new Maintenance(spark, store, periodMs = 60000L,
      downsampleTiers = Map(7 * H -> s"$root/bad", H -> s"$root/good"))
    val r = m.step()
    assert(r.errors.map(_._1) == Seq(s"downsample:${7 * H}"), r.toString)
    // the good tier still built in the same round
    assert(r.downsampled(H) == Seq("2024-01-01"))
    assert(dates(s"$root/good") == Seq("2024-01-01"))
  }

  test("start/stop: rounds run on the daemon thread and stop joins") {
    val root = "target/maint_thread"
    val store = s"$root/store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + H, 1.0))), store)
    val m = new Maintenance(spark, store, periodMs = 50L,
      downsampleTiers = Map(H -> s"$root/tier"))
    m.start()
    m.start() // idempotent
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (m.lastReport.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(m.lastReport.nonEmpty, "a round must have run")
    assert(m.lastReport.get.downsampled(H).nonEmpty ||
      dates(s"$root/tier") == Seq("2024-01-01"))
    m.stop()
    m.stop() // idempotent
  }
}
