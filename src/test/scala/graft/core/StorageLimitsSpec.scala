package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** -search.maxSamplesPerQuery / -search.maxUniqueTimeseries enforcement
  * (netstorage.go:1114, index_db.go:2211): opt-in per-query caps rejected
  * with the reference's messages BEFORE evaluation work is scheduled.
  */
class StorageLimitsSpec extends SparkSpec {

  private val grid = GridSpec(1704067200000L, 1704067200000L + 86400000L, 3600000L)
  private lazy val samples = Samples.fromEvents(spark, sfDir)

  private def reset(): Unit = {
    StorageLimits.maxSamplesPerQuery = 0L
    StorageLimits.maxUniqueTimeseries = 0L
  }

  test("maxSamplesPerQuery rejects a query selecting too many samples") {
    try {
      StorageLimits.maxSamplesPerQuery = 1L
      val wide = GridSpec(1704067200000L, 1704067200000L + 30L * 86400000L, 3600000L)
      val e = intercept[IllegalArgumentException](
        graft.Engine.query(samples, "rate(click[1h])", wide, 7200000L).count())
      assert(e.getMessage.contains("-search.maxSamplesPerQuery=1"))
      // generous limit passes
      StorageLimits.maxSamplesPerQuery = 100000000L
      assert(graft.Engine.query(samples, "rate(click[1h])", grid, 7200000L).count() > 0)
    } finally reset()
  }

  test("maxUniqueTimeseries rejects a query scanning too many series") {
    try {
      StorageLimits.maxUniqueTimeseries = 1L
      val e = intercept[IllegalArgumentException](
        graft.Engine.query(samples, "sum(rate(click[1h]))", grid, 7200000L).count())
      assert(e.getMessage.contains("the number of matching timeseries exceeds 1"))
      StorageLimits.maxUniqueTimeseries = 1000000L
      assert(graft.Engine.query(samples, "sum(rate(click[1h]))", grid, 7200000L)
        .filter(!isnan(col("value"))).count() > 0)
    } finally reset()
  }

  test("limits disabled by default: no pre-count work, queries unaffected") {
    assert(!StorageLimits.enabled)
    assert(graft.Engine.query(samples, "count(click)", grid, 7200000L).count() > 0)
  }
}
