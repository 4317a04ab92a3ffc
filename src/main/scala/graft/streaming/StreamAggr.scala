package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Stream aggregation (SURVEY §2.7, lib/streamaggr/streamaggr.go):
  * aggregate raw samples into coarser series per fixed interval BEFORE
  * storage. Two forms with identical semantics (both assign a sample at
  * ts to the end-exclusive window [k*i, (k+1)*i) flushing at (k+1)*i, and
  * both apply the dedup stage when configured):
  *
  *  - [[aggregateBatch]]: the batch/compaction form — tumbling
  *    interval-aligned windows via one hash aggregation (used for
  *    backfill and for the oracle-checked correctness gate).
  *  - [[aggregate]]: the Structured Streaming form — event-time windows
  *    with a watermark (the Spark-idiomatic equivalent of the reference's
  *    wall-clock flush + ignore_old_samples, streamaggr.go:124-167).
  *  - [[statefulTotal]]: the counter-carrying `total`/`increase` outputs,
  *    which need per-series state across windows
  *    (lib/streamaggr/total.go) — flatMapGroupsWithState keeping
  *    (lastValue, runningTotal) per series.
  *
  * Output series naming follows the reference synthesis
  * `name:interval[_by_labels]_output` (streamaggr.go:115-122).
  */
object StreamAggr {

  /** grouping: Left(by-labels) keeps only those, Right(without) drops
    * those; None aggregates everything into one output series per name.
    */
  final case class Config(
      intervalMs: Long,
      by: Seq[String] = Nil,
      without: Seq[String] = Nil,
      outputs: Seq[String] = Seq("sum_samples"),
      dedupIntervalMs: Option[Long] = None,
      // full -streamAggr.config surface (lib/streamaggr/streamaggr.go
      // Config yaml fields)
      name: String = "",
      matchSelectors: Seq[String] = Nil,
      keepMetricNames: Boolean = false,
      dropInputLabels: Seq[String] = Nil,
      inputRelabel: Seq[graft.sources.Relabel.Rule] = Nil,
      outputRelabel: Seq[graft.sources.Relabel.Rule] = Nil) {
    // streamaggr.go:258: keep_metric_names is only allowed for a single
    // output (several outputs would collide on the input name)
    require(!keepMetricNames || outputs.size == 1,
      "`keep_metric_names` can't be used with multiple outputs")
  }

  private def intervalText(ms: Long): String =
    if (ms % 3600000 == 0) s"${ms / 3600000}h"
    else if (ms % 60000 == 0) s"${ms / 60000}m"
    else if (ms % 1000 == 0) s"${ms / 1000}s"
    else s"${ms}ms"

  private def outName(cfg: Config, output: String): Column =
    if (cfg.keepMetricNames) coalesce(col("name"), lit(""))
    else {
      val suffix = ":" + intervalText(cfg.intervalMs) +
        (if (cfg.by.nonEmpty) "_by_" + cfg.by.sorted.mkString("_") else "") +
        "_" + output
      concat(coalesce(col("name"), lit("")), lit(suffix))
    }

  private def groupTags(cfg: Config): Column =
    if (cfg.by.nonEmpty)
      map_filter(col("tags"), (k, _) => k.isInCollection(cfg.by))
    else if (cfg.without.nonEmpty)
      map_filter(col("tags"), (k, _) => !k.isInCollection(cfg.without))
    else map().cast("map<string,string>")

  /** the 12 stateless outputs (per-file impls lib/streamaggr/{avg,count_
    * samples,count_series,last,max,min,quantiles,std,sum_samples,
    * unique_samples}.go) as one aggregation pass.
    */
  private def outputExpr(output: String): Column = {
    val v = col("value")
    output match {
      case "avg" => avg(v)
      case "count_samples" => count(v).cast(DoubleType)
      case "count_series" => size(collect_set(col("_sk"))).cast(DoubleType)
      case "last" => max_by(v, struct(col("ts"), v))
      case "max" => max(v)
      case "min" => min(v)
      case "sum_samples" => sum(v)
      case "stddev" => stddev_pop(v)
      case "stdvar" => var_pop(v)
      case "unique_samples" => size(collect_set(v)).cast(DoubleType)
      case q if q.startsWith("quantile:") => percentile(v, lit(q.stripPrefix("quantile:").toDouble))
      case other => throw new IllegalArgumentException(s"unsupported output '$other'")
    }
  }

  /** batch dedup stage (lib/streamaggr/dedup.go): at most one sample per
    * series per dedup interval, keeping the latest (ts, then value) —
    * the batch equivalent of the streaming path's
    * dropDuplicatesWithinWatermark over the same floor-bucketed key.
    * Requires a `_sk` series-key column.
    */
  private def dedupBatch(keyed: DataFrame, cfg: Config): DataFrame =
    cfg.dedupIntervalMs match {
      case Some(d) =>
        val w = Window.partitionBy(col("_sk"), expr(s"(ts div ${d}L) * ${d}L"))
          .orderBy(col("ts").desc, col("value").desc)
        keyed.withColumn("_ddrn", row_number().over(w))
          .filter(col("_ddrn") === 1).drop("_ddrn")
      case None => keyed
    }

  /** Batch form: (name, tags, ts, value) → (name, tags, t, value) where t
    * is the interval-aligned flush timestamp (window end) and `name`
    * carries the output suffix.
    */
  def aggregateBatch(samples: DataFrame, cfg: Config): DataFrame = {
    val i = cfg.intervalMs
    // floor assignment with end-exclusive windows: sample ts lands in
    // [k*i, (k+1)*i) and flushes at t=(k+1)*i — the same placement
    // Spark's window() gives the streaming form, so boundary-aligned
    // timestamps (scrape-aligned data) agree between the two paths.
    val keyed = dedupBatch(samples
      .withColumn("_sk", concat(coalesce(col("name"), lit("")),
        to_json(array_sort(map_entries(col("tags")))))), cfg)
      .withColumn("_gt", to_json(array_sort(map_entries(groupTags(cfg)))))
      .withColumn("t", expr(s"(ts div ${i}L) * ${i}L + ${i}L"))
    val aggs = cfg.outputs.zipWithIndex.map { case (o, ix) => outputExpr(o).as(s"_o$ix") }
    val wide = keyed
      .groupBy(col("name"), col("_gt"), col("t"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = cfg.outputs.zipWithIndex
      .map { case (o, ix) => s"'$o', _o$ix" }.mkString(", ")
    wide
      .select(col("name"), col("_gt"), col("t"),
        expr(s"stack(${cfg.outputs.size}, $stackArgs) as (_out, value)"))
      .select(
        (if (cfg.keepMetricNames) outName(cfg, "")
         else concat(outName(cfg, ""), col("_out"))).as("name"),
        map_from_entries(from_json(col("_gt"),
          lit("array<struct<key:string,value:string>>"))).as("tags"),
        col("t"), col("value"))
      .filter(col("value").isNotNull)
  }

  /** Streaming form: event-time tumbling windows + watermark. Input needs
    * an event-time column `eventTime` (TimestampType); late data beyond
    * `watermarkDelay` is dropped (the reference's ignore_old_samples,
    * streamaggr.go:124-136).
    */
  def aggregate(
      stream: DataFrame,
      cfg: Config,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val keyed0 = stream
      .withColumn("_sk", concat(coalesce(col("name"), lit("")),
        to_json(array_sort(map_entries(col("tags"))))))
      .withColumn("_gt", to_json(array_sort(map_entries(groupTags(cfg)))))
      .withWatermark("eventTime", watermarkDelay)
    // dedup stage (lib/streamaggr/dedup.go): at most one sample per
    // series per dedup interval, state bounded by the watermark
    val keyed = cfg.dedupIntervalMs match {
      case Some(d) =>
        keyed0
          .withColumn("_db", expr(s"(unix_millis(eventTime) div ${d}L) * ${d}L"))
          .dropDuplicatesWithinWatermark("_sk", "_db")
          .drop("_db")
      case None => keyed0
    }
    val aggs = cfg.outputs.zipWithIndex.map { case (o, ix) => outputExpr(o).as(s"_o$ix") }
    val wide = keyed
      .withColumn("ts", unix_millis(col("eventTime")))
      .groupBy(
        window(col("eventTime"), s"${cfg.intervalMs} milliseconds").as("w"),
        col("name"), col("_gt"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = cfg.outputs.zipWithIndex
      .map { case (o, ix) => s"'$o', _o$ix" }.mkString(", ")
    wide
      .select(col("name"), col("_gt"), col("w"),
        expr(s"stack(${cfg.outputs.size}, $stackArgs) as (_out, value)"))
      .select(
        (if (cfg.keepMetricNames) outName(cfg, "")
         else concat(outName(cfg, ""), col("_out"))).as("name"),
        map_from_entries(from_json(col("_gt"),
          lit("array<struct<key:string,value:string>>"))).as("tags"),
        unix_millis(col("w.end")).as("t"),
        col("value"))
      .filter(col("value").isNotNull)
  }

  // ------------------------------------------------------------------
  // stateful counter outputs — lib/streamaggr/{total,rate}.go
  // ------------------------------------------------------------------

  final case class SeriesSample(sk: String, ts: Long, value: Double)
  final case class TotalState(lastValue: Double, total: Double, lastTs: Long)
  final case class TotalOut(sk: String, total: Double)
  final case class RateState(lastValue: Double, prevTs: Long, lastTs: Long)
  final case class RateOut(sk: String, rate: Double)

  /** per-series running `total`: counter increases accumulated across all
    * samples ever seen, reset-aware (total.go keeps per-series last value).
    * Staleness: a series silent longer than `stalenessMs` (event time)
    * restarts from its next sample (total.go deleteDeadline), and idle
    * state is evicted via processing-time timeout.
    */
  /** timeout conf: idle-state eviction is OPT-IN — ProcessingTimeTimeout
    * makes the engine schedule wall-clock timeout batches (fine for a
    * long-running server, hostile to deterministic tests); the staleness
    * RESET semantics below are purely event-time and work either way.
    */
  private def timeoutConf(evict: Boolean): GroupStateTimeout =
    if (evict) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  def statefulTotal(
      stream: Dataset[SeriesSample],
      stalenessMs: Long = 0L,
      evictIdleState: Boolean = false,
      keepFirstSample: Boolean = true): Dataset[TotalOut] = {
    import stream.sparkSession.implicits._
    val evict = evictIdleState && stalenessMs > 0
    stream
      .groupByKey(_.sk)
      .flatMapGroupsWithState[TotalState, TotalOut](
        OutputMode.Update(), timeoutConf(evict)) {
        case (sk, rows, state: GroupState[TotalState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts, r.value))
            var st = state.getOption.getOrElse(TotalState(Double.NaN, 0.0, 0L))
            sorted.foreach { r =>
              val stale = stalenessMs > 0 && st.lastTs > 0 && r.ts - st.lastTs > stalenessMs
              val inc =
                if (st.lastValue.isNaN || stale) // new/restarted series
                  (if (keepFirstSample) r.value else 0.0) // total.go:50
                else if (r.value >= st.lastValue) r.value - st.lastValue
                else r.value // counter reset: new raw value is the increase
              st = TotalState(r.value, st.total + inc, r.ts)
            }
            state.update(st)
            if (evict) state.setTimeoutDuration(stalenessMs)
            Iterator.single(TotalOut(sk, st.total))
          }
      }
  }

  /** per-series streaming `rate`: per-trigger increase divided by the time
    * since the previous trigger's last sample (rate.go pushSample/flush:
    * prevTimestamp carries across intervals; series silent beyond the
    * staleness interval restart). Aggregate the outputs with sum/avg per
    * output group for rate_sum / rate_avg.
    */
  def statefulRate(
      stream: Dataset[SeriesSample],
      stalenessMs: Long = 0L,
      evictIdleState: Boolean = false): Dataset[RateOut] = {
    import stream.sparkSession.implicits._
    val evict = evictIdleState && stalenessMs > 0
    stream
      .groupByKey(_.sk)
      .flatMapGroupsWithState[RateState, RateOut](
        OutputMode.Update(), timeoutConf(evict)) {
        case (sk, rows, state: GroupState[RateState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts, r.value))
            if (sorted.isEmpty) Iterator.empty
            else {
              var st = state.getOption.getOrElse(
                RateState(Double.NaN, sorted.head.ts, 0L))
              var increase = 0.0
              sorted.foreach { r =>
                val stale = stalenessMs > 0 && st.lastTs > 0 && r.ts - st.lastTs > stalenessMs
                if (st.lastValue.isNaN || stale) // (re)start from this sample
                  st = RateState(r.value, r.ts, r.ts)
                else {
                  increase +=
                    (if (r.value >= st.lastValue) r.value - st.lastValue else r.value)
                  st = RateState(r.value, st.prevTs, r.ts)
                }
              }
              val dSec = (st.lastTs - st.prevTs) / 1000.0
              state.update(RateState(st.lastValue, st.lastTs, st.lastTs))
              if (evict) state.setTimeoutDuration(stalenessMs)
              if (dSec > 0) Iterator.single(RateOut(sk, increase / dSec))
              else Iterator.empty
            }
          }
      }
  }

  /** batch `increase` / `increase_prometheus`: per-interval group
    * increase — `total` without the running accumulation
    * (streamaggr.go:184-206 resetTotalOnFlush); the flag picks the
    * first-sample rule and the output suffix.
    */
  def increaseBatch(samples: DataFrame, cfg: Config,
      keepFirstSample: Boolean = true): DataFrame =
    counterWindows(samples, cfg, keepFirstSample)
      .groupBy(col("name"), col("_gt"), col("t"))
      .agg(sum(col("_winc")).as("value"))
      .select(
        outName(cfg, if (keepFirstSample) "increase" else "increase_prometheus").as("name"),
        map_from_entries(from_json(col("_gt"),
          lit("array<struct<key:string,value:string>>"))).as("tags"),
        col("t"), col("value"))

  /** batch `rate_sum` / `rate_avg` (lib/streamaggr/rate.go): per series and
    * interval, increase (cross-boundary, reset-aware) divided by the time
    * since the previous non-empty interval's last sample; summed (or
    * averaged over contributing series) per output group.
    */
  def rateBatch(samples: DataFrame, cfg: Config, isAvg: Boolean = false): DataFrame = {
    val perSeries = counterWindows(samples, cfg)
      .groupBy(col("name"), col("_gt"), col("_sk"), col("t"))
      .agg(sum(col("_winc")).as("_inc"), max(col("ts")).as("_lastts"),
        org.apache.spark.sql.functions.min(col("ts")).as("_firstts"))
    val wPrev = Window.partitionBy(col("name"), col("_gt"), col("_sk")).orderBy(col("t"))
    val withRate = perSeries
      .withColumn("_pts", coalesce(lag(col("_lastts"), 1).over(wPrev), col("_firstts")))
      .withColumn("_sr",
        when(col("_pts") < col("_lastts"),
          col("_inc") / ((col("_lastts") - col("_pts")) / 1000.0)))
    val suffix = if (isAvg) "rate_avg" else "rate_sum"
    val agg = if (isAvg) avg(col("_sr")) else sum(col("_sr"))
    withRate
      .groupBy(col("name"), col("_gt"), col("t"))
      .agg(agg.as("value"))
      .filter(col("value").isNotNull)
      .select(
        outName(cfg, suffix).as("name"),
        map_from_entries(from_json(col("_gt"),
          lit("array<struct<key:string,value:string>>"))).as("tags"),
        col("t"), col("value"))
  }

  /** batch `histogram_bucket` (lib/streamaggr/histogram_bucket.go): VM
    * log-bucketed counts per vmrange, CUMULATIVE across intervals (the
    * reference merges each interval's histogram into a shared one and
    * emits the shared totals).
    */
  def histogramBucketBatch(samples: DataFrame, cfg: Config): DataFrame = {
    val i = cfg.intervalMs
    val keyed = dedupBatch(samples
      .withColumn("_sk", concat(coalesce(col("name"), lit("")),
        to_json(array_sort(map_entries(col("tags")))))), cfg)
      .withColumn("_gt", to_json(array_sort(map_entries(groupTags(cfg)))))
      .withColumn("t", expr(s"(ts div ${i}L) * ${i}L + ${i}L"))
      .withColumn("vmrange", graft.operators.HistogramQ.floorBucketIdx(col("value")))
      .filter(col("vmrange").isNotNull)
    val perInterval = keyed
      .groupBy(col("name"), col("_gt"), col("vmrange"), col("t"))
      .agg(count(lit(1)).cast(DoubleType).as("_c"))
    val cum = Window.partitionBy(col("name"), col("_gt"), col("vmrange"))
      .orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perInterval
      .withColumn("value", sum(col("_c")).over(cum))
      .select(
        outName(cfg, "histogram_bucket").as("name"),
        map_from_entries(from_json(col("_gt"),
          lit("array<struct<key:string,value:string>>"))).as("tags"),
        col("vmrange"), col("t"), col("value"))
  }

  /** shared prefix of the batch counter outputs: per-series adjacent
    * increases over the FULL sample stream (cross-boundary, reset-aware),
    * bucketed into the end-exclusive window of the later sample.
    * `keepFirstSample` decides what a series' FIRST sample contributes:
    * its value (`total`/`increase`, total.go:50 keepFirstSample) or
    * nothing (`total_prometheus`/`increase_prometheus`, the strict
    * Prometheus flavor — total.go:118 getSuffix).
    */
  private def counterWindows(samples: DataFrame, cfg: Config,
      keepFirstSample: Boolean = false): DataFrame = {
    val i = cfg.intervalMs
    val keyed = dedupBatch(samples
      .withColumn("_sk", concat(coalesce(col("name"), lit("")),
        to_json(array_sort(map_entries(col("tags")))))), cfg)
      .withColumn("_gt", to_json(array_sort(map_entries(groupTags(cfg)))))
    val w = Window.partitionBy(col("_sk")).orderBy(col("ts"), col("value"))
    keyed
      .withColumn("_pv", lag(col("value"), 1).over(w))
      .withColumn("_winc",
        when(col("_pv").isNull, if (keepFirstSample) col("value") else lit(0.0))
          .when(col("value") >= col("_pv"), col("value") - col("_pv"))
          .otherwise(col("value")))
      .withColumn("t", expr(s"(ts div ${i}L) * ${i}L + ${i}L"))
  }

  /** batch equivalent of `total` / `total_prometheus`: per-series
    * per-window increase (reset-aware, carrying the previous window's
    * last sample), summed across the group's series, then accumulated
    * over windows; the flag picks the first-sample rule and suffix.
    */
  def totalBatch(samples: DataFrame, cfg: Config,
      keepFirstSample: Boolean = true): DataFrame = {
    val perWindow = counterWindows(samples, cfg, keepFirstSample)
      .groupBy(col("name"), col("_gt"), col("t"))
      .agg(sum(col("_winc")).as("_winc"))
    val cum = Window.partitionBy(col("name"), col("_gt")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perWindow
      .withColumn("value", sum(col("_winc")).over(cum))
      .select(
        outName(cfg, if (keepFirstSample) "total" else "total_prometheus").as("name"),
        map_from_entries(from_json(col("_gt"),
          lit("array<struct<key:string,value:string>>"))).as("tags"),
        col("t"), col("value"))
  }

  // ---- full-config pipeline -------------------------------------------

  /** One config's whole batch pipeline, in the aggregator's construction
    * order (streamaggr.go newAggregator → aggregator.Push):
    * `match` filter → `drop_input_labels` → `input_relabel_configs` →
    * aggregate/dedup → `output_relabel_configs`. The stateful outputs
    * (`total*`, `increase*`, `rate_*`, `histogram_bucket`) route to their
    * dedicated batch kernels; everything else goes through the one-pass
    * stacked aggregation.
    */
  def aggregateBatchConfigured(samples: DataFrame, cfg: Config): DataFrame = {
    val matched =
      if (cfg.matchSelectors.isEmpty) samples
      else samples.filter(
        cfg.matchSelectors.map(graft.api.Api.selectorPredicate).reduce(_ || _))
    val dropped =
      if (cfg.dropInputLabels.isEmpty) matched
      else matched.withColumn("tags",
        map_filter(col("tags"), (k, _) => !k.isInCollection(cfg.dropInputLabels)))
    val relabeled =
      if (cfg.inputRelabel.isEmpty) dropped
      else graft.sources.Relabel.apply(dropped, cfg.inputRelabel)
    val (stateful, stateless) = cfg.outputs.partition(o =>
      o == "total" || o == "total_prometheus" || o == "increase" ||
        o == "increase_prometheus" || o == "rate_sum" || o == "rate_avg" ||
        o == "histogram_bucket")
    val parts =
      (if (stateless.nonEmpty)
        Seq(aggregateBatch(relabeled, cfg.copy(outputs = stateless))) else Nil) ++
      stateful.map {
        case "total" => totalBatch(relabeled, cfg, keepFirstSample = true)
        case "total_prometheus" => totalBatch(relabeled, cfg, keepFirstSample = false)
        case "increase" => increaseBatch(relabeled, cfg, keepFirstSample = true)
        case "increase_prometheus" => increaseBatch(relabeled, cfg, keepFirstSample = false)
        case "rate_sum" => rateBatch(relabeled, cfg, isAvg = false)
        case "rate_avg" => rateBatch(relabeled, cfg, isAvg = true)
        case "histogram_bucket" => histogramBucketBatch(relabeled, cfg)
      }
    val out = parts.reduce(_ unionByName _)
    if (cfg.outputRelabel.isEmpty) out
    else graft.sources.Relabel.apply(
      out.withColumnRenamed("t", "ts"), cfg.outputRelabel)
      .withColumnRenamed("ts", "t")
  }

  /** every config over the same input, unioned — the multi-entry
    * -streamAggr.config file semantics
    */
  def applyAll(samples: DataFrame, cfgs: Seq[Config]): DataFrame =
    cfgs.map(aggregateBatchConfigured(samples, _)).reduce(_ unionByName _)

  /** Parse the -streamAggr.config YAML list (streamaggr.go Config):
    * `interval` (required), `outputs`, `by`, `without`, `match` (scalar
    * or list), `name`, `dedup_interval`, `keep_metric_names`,
    * `drop_input_labels`, `input_relabel_configs` /
    * `output_relabel_configs` (delegated to the relabel parser). The
    * pragmatic line parser follows the alerting/relabel loaders: scalars
    * bare or quoted, lists inline `[a, b]` or block `- x`.
    */
  def parseConfigs(yaml: String): Seq[Config] = {
    def unq(s0: String): String = {
      val s = s0.trim
      if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
        (s.head == '\'' && s.last == '\'')))
        s.substring(1, s.length - 1)
      else s
    }
    def inlineList(s: String): Seq[String] = {
      val t = s.trim
      if (t.startsWith("[") && t.endsWith("]"))
        t.substring(1, t.length - 1).split(',').map(unq).filter(_.nonEmpty).toSeq
      else Seq(unq(t))
    }
    val lines = yaml.split('\n')
      .filterNot(l => l.trim.isEmpty || l.trim.startsWith("#")).toVector
    val starts = lines.zipWithIndex.collect {
      case (l, i) if l.startsWith("- ") || l.trim == "-" => i
    }
    require(starts.nonEmpty, "stream aggregation config must be a YAML list")
    starts.zipAll(starts.drop(1), 0, lines.length).map { case (s0, e0) =>
      val entry = lines.slice(s0, e0).zipWithIndex.map {
        case (l, 0) => "  " + l.stripPrefix("-")
        case (l, _) => l
      }
      val scalars = scala.collection.mutable.Map.empty[String, String]
      val blocks = scala.collection.mutable.Map.empty[String, Vector[String]]
      var i = 0
      def indentOf(l: String): Int = l.takeWhile(_ == ' ').length
      while (i < entry.length) {
        val l = entry(i)
        val ind = indentOf(l)
        val t = l.trim
        val ci = t.indexOf(':')
        require(ci > 0, s"cannot parse stream-aggr config line: $t")
        val key = t.take(ci).trim
        val rest = t.drop(ci + 1).trim
        if (rest.nonEmpty) { scalars(key) = rest; i += 1 }
        else {
          val b = Vector.newBuilder[String]
          i += 1
          // a block list's `- item` lines may sit at the SAME indent as
          // their key (valid YAML), deeper lines belong to nested items
          while (i < entry.length && (indentOf(entry(i)) > ind ||
            (indentOf(entry(i)) == ind && entry(i).trim.startsWith("-")))) {
            b += entry(i); i += 1
          }
          blocks(key) = b.result()
        }
      }
      def listField(key: String): Seq[String] =
        scalars.get(key).map(inlineList).getOrElse(
          blocks.getOrElse(key, Vector.empty)
            .map(_.trim.stripPrefix("-").trim).map(unq).filter(_.nonEmpty))
      def relabelField(key: String): Seq[graft.sources.Relabel.Rule] =
        blocks.get(key).map(b => graft.sources.Relabel.parseConfig(b.mkString("\n")))
          .getOrElse(Nil)
      val interval = scalars.getOrElse("interval",
        throw new IllegalArgumentException("missing `interval` in stream aggregation config"))
      Config(
        intervalMs = graft.lang.Lexer.durationMs(unq(interval), 0L),
        by = listField("by"),
        without = listField("without"),
        outputs = {
          val o = listField("outputs"); if (o.isEmpty) Seq("sum_samples") else o
        },
        dedupIntervalMs = scalars.get("dedup_interval")
          .map(d => graft.lang.Lexer.durationMs(unq(d), 0L)),
        name = scalars.get("name").map(unq).getOrElse(""),
        matchSelectors = listField("match"),
        keepMetricNames = scalars.get("keep_metric_names").map(unq).contains("true"),
        dropInputLabels = listField("drop_input_labels"),
        inputRelabel = relabelField("input_relabel_configs"),
        outputRelabel = relabelField("output_relabel_configs"))
    }
  }
}
