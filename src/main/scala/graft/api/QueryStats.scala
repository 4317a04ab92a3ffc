package graft.api

import java.util.concurrent.atomic.AtomicLong

/** In-flight and historical query statistics backing
  * `/api/v1/status/active_queries` and `/api/v1/status/top_queries`
  * (app/vmselect/promql/active_queries.go; app/vmselect/querystats/
  * querystats.go). Active queries live in a concurrent map keyed by a
  * monotonically increasing qid; completed queries land in a fixed-size
  * ring buffer (the reference's `-search.queryStats.lastQueriesCount`
  * circular array), aggregated on demand by (query, timeRangeSecs) into
  * topByCount / topByAvgDuration / topBySumDuration.
  */
object QueryStats {

  final case class Active(
      qid: Long,
      query: String,
      startMs: Long,
      endMs: Long,
      stepMs: Long,
      remoteAddr: String,
      startedAtMs: Long)

  private final case class Record(
      query: String,
      timeRangeSecs: Long,
      registeredAtMs: Long,
      durationMs: Long)

  /** -search.queryStats.lastQueriesCount default (querystats.go:20) */
  private val LastQueriesCount = 20000

  private val nextQid = new AtomicLong(0L)
  private val active =
    new java.util.concurrent.ConcurrentHashMap[Long, Active]()
  private val ring = new Array[Record](LastQueriesCount)
  private var ringIdx = 0

  /** run `f` tracked as an active query, then register its duration */
  def track[A](query: String, startMs: Long, endMs: Long, stepMs: Long,
      remoteAddr: String = "")(f: => A): A = {
    val qid = add(query, startMs, endMs, stepMs, remoteAddr)
    val t0 = System.currentTimeMillis()
    try f
    finally {
      remove(qid)
      register(query, endMs - startMs, t0)
    }
  }

  def add(query: String, startMs: Long, endMs: Long, stepMs: Long,
      remoteAddr: String = ""): Long = {
    val qid = nextQid.incrementAndGet()
    active.put(qid, Active(qid, query, startMs, endMs, stepMs, remoteAddr,
      System.currentTimeMillis()))
    qid
  }

  def remove(qid: Long): Unit = active.remove(qid)

  /** ring-buffer insert (querystats.go:122 registerQuery) */
  def register(query: String, timeRangeMs: Long, startedAtMs: Long,
      nowMs: Long = 0L): Unit = {
    val now = if (nowMs != 0L) nowMs else System.currentTimeMillis()
    val rec = Record(query, timeRangeMs / 1000, now, now - startedAtMs)
    ring.synchronized {
      if (ringIdx >= ring.length) ringIdx = 0
      ring(ringIdx) = rec
      ringIdx += 1
    }
  }

  /** test/ops hook: forget everything */
  def reset(): Unit = {
    active.clear()
    ring.synchronized {
      java.util.Arrays.fill(ring.asInstanceOf[Array[AnyRef]], null)
      ringIdx = 0
    }
  }

  private def jsonStr(s: String): String = Json.str(s)

  /** /api/v1/status/active_queries body (active_queries.go:17):
    * entries sorted by start time ascending.
    */
  def activeQueriesJson(nowMs: Long = System.currentTimeMillis()): String = {
    val entries = {
      val it = active.values().iterator()
      val b = Seq.newBuilder[Active]
      while (it.hasNext) b += it.next()
      b.result()
    }.sortBy(_.startedAtMs)
    val rows = entries.map { a =>
      val durSec = (nowMs - a.startedAtMs) / 1000.0
      s"""{"duration":"${Json.num3(durSec)}s","id":"${"%016X".format(a.qid)}","remote_addr":${jsonStr(a.remoteAddr)},""" +
        s""""query":${jsonStr(a.query)},"start":${a.startMs},"end":${a.endMs},"step":${a.stepMs}}"""
    }
    s"""{"status":"ok","data":[${rows.mkString(",")}]}"""
  }

  /** /api/v1/status/top_queries body (querystats.go:80): ranked
    * aggregations over ring records younger than maxLifetime.
    */
  def topQueriesJson(topN: Int = 20,
      maxLifetimeMs: Long = 10 * 60 * 1000L,
      nowMs: Long = System.currentTimeMillis()): String = {
    val recs = ring.synchronized {
      ring.iterator.filter(r =>
        r != null && r.query.nonEmpty && nowMs - r.registeredAtMs <= maxLifetimeMs).toSeq
    }
    val grouped = recs.groupBy(r => (r.query, r.timeRangeSecs))
    def entry(q: String, tr: Long, rest: String): String =
      s"""{"query":${jsonStr(q)},"timeRangeSeconds":$tr,$rest}"""
    val byCount = grouped.toSeq
      .map { case ((q, tr), rs) => (q, tr, rs.size) }
      .sortBy(-_._3).take(topN)
      .map { case (q, tr, n) => entry(q, tr, s""""count":$n""") }
    val byAvg = grouped.toSeq
      // float average — integer ms division would truncate sub-ms
      // precision before the %.3f render (the reference averages
      // time.Durations and formats duration.Seconds())
      .map { case ((q, tr), rs) =>
        (q, tr, rs.map(_.durationMs).sum.toDouble / rs.size, rs.size) }
      .sortBy(-_._3).take(topN)
      .map { case (q, tr, d, n) =>
        entry(q, tr, s""""avgDurationSeconds":${Json.num3(d / 1000.0)},"count":$n""") }
    val bySum = grouped.toSeq
      .map { case ((q, tr), rs) => (q, tr, rs.map(_.durationMs).sum, rs.size) }
      .sortBy(-_._3).take(topN)
      .map { case (q, tr, d, n) =>
        entry(q, tr, s""""sumDurationSeconds":${Json.num3(d / 1000.0)},"count":$n""") }
    // memory usage per query is a storage-side tracker this facade
    // doesn't have; the shape (querystats.go:111) is kept with zero
    // bytes, ranked like topByCount
    val byMem = grouped.toSeq
      .map { case ((q, tr), rs) => (q, tr, rs.size) }
      .sortBy(-_._3).take(topN)
      .map { case (q, tr, n) =>
        entry(q, tr, s""""avgMemoryBytes":0,"count":$n""") }
    val lifetimeSec =
      if (maxLifetimeMs % 1000 == 0) s"${maxLifetimeMs / 1000}s" else s"${maxLifetimeMs}ms"
    s"""{"topN":"$topN","maxLifetime":"$lifetimeSec",""" +
      s""""search.queryStats.lastQueriesCount":$LastQueriesCount,""" +
      s""""search.queryStats.minQueryDuration":"0s",""" +
      s""""search.queryStats.minQueryMemoryUsage":"0",""" +
      s""""topByCount":[${byCount.mkString(",")}],""" +
      s""""topByAvgDuration":[${byAvg.mkString(",")}],""" +
      s""""topBySumDuration":[${bySum.mkString(",")}],""" +
      s""""topByAvgMemoryUsage":[${byMem.mkString(",")}]}"""
  }
}
