package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental tier maintenance (SampleStore.downsampleNewDates) — the
  * downsampling sibling of bucketizeNewDates: changed dates rebuild, late
  * arrivals re-do just their date, vanished dates drop, re-runs are
  * idempotent, and a missing flat root aborts instead of wiping the tier.
  */
class DownsampleTierSpec extends SparkSpec {

  private val D1 = 1704067200000L // 2024-01-01
  private val D2 = D1 + 86400000L
  private val H = 3600000L

  private def mkRows(rows: Seq[(String, Map[String, String], Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("name", "tags", "ts", "value")
  }

  private def tierRows(path: String): Set[(String, Long, Double)] =
    SampleStore.read(spark, path)
      .select(col("name"), col("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("downsampleNewDates: changed dates only, late arrivals, removals, idempotence") {
    val store = "target/dstier/store"
    val tier = "target/dstier/tier"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/dstier"))
    // day 1: two samples inside one 1h bucket + one in another
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + 10 * 60000L, 1.0),
      ("m", Map("job" -> "a"), D1 + 20 * 60000L, 2.0),
      ("m", Map("job" -> "a"), D1 + 90 * 60000L, 3.0))), store)
    val first = SampleStore.downsampleNewDates(spark, store, tier, H)
    assert(first == Seq("2024-01-01"))
    // keep-last per end-aligned 1h bucket: (0,1h] keeps ts=20min, value 2
    assert(tierRows(tier) == Set(
      ("m", D1 + 20 * 60000L, 2.0), ("m", D1 + 90 * 60000L, 3.0)))
    // idempotent: unchanged store → no dates rebuild
    assert(SampleStore.downsampleNewDates(spark, store, tier, H).isEmpty)
    // day 2 lands (append): only day 2 rebuilds
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D2 + 5 * 60000L, 7.0))), store)
    assert(SampleStore.downsampleNewDates(spark, store, tier, H) == Seq("2024-01-02"))
    assert(tierRows(tier).contains(("m", D2 + 5 * 60000L, 7.0)))
    // LATE ARRIVAL into day 1: a newer sample in the first bucket wins;
    // only day 1 rebuilds and day 2's tier rows survive untouched
    SampleStore.write(mkRows(Seq(
      ("m", Map("job" -> "a"), D1 + 25 * 60000L, 9.0))), store)
    assert(SampleStore.downsampleNewDates(spark, store, tier, H) == Seq("2024-01-01"))
    assert(tierRows(tier) == Set(
      ("m", D1 + 25 * 60000L, 9.0), ("m", D1 + 90 * 60000L, 3.0),
      ("m", D2 + 5 * 60000L, 7.0)))
    // a date dropped from the flat store (retention) leaves the tier too
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(store, "date=2024-01-01"))
    assert(SampleStore.downsampleNewDates(spark, store, tier, H).isEmpty)
    assert(tierRows(tier) == Set(("m", D2 + 5 * 60000L, 7.0)))
  }

  test("downsampleNewDates: missing flat root aborts; bad interval rejected") {
    val store = "target/dstier2/store"
    val tier = "target/dstier2/tier"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/dstier2"))
    SampleStore.write(mkRows(Seq(("m", Map("job" -> "a"), D1 + 60000L, 1.0))), store)
    SampleStore.downsampleNewDates(spark, store, tier, H)
    // a non-day-dividing interval would make buckets span dates
    intercept[IllegalArgumentException] {
      SampleStore.downsampleNewDates(spark, store, tier, 7 * H)
    }
    // a missing flat root with an existing tier must abort, not wipe
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    intercept[IllegalStateException] {
      SampleStore.downsampleNewDates(spark, store, tier, H)
    }
    assert(tierRows(tier).nonEmpty, "tier must survive the abort")
  }
}
