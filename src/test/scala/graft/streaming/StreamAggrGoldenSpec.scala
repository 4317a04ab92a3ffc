package graft.streaming

import graft.SparkSpec
import graft.tools.StreamAggrGolden
import graft.tools.StreamAggrGolden.V
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replays the reference's TestAggregatorsSuccess corpus
  * (lib/streamaggr/streamaggr_synctest_test.go) through the batch
  * pipeline and TestAggregatorsFailure (streamaggr_test.go) through the
  * config loader. The wall-clock → event-time mapping and the reference
  * defaults applied here are documented on StreamAggrGolden.
  */
class StreamAggrGoldenSpec extends SparkSpec {

  private val T0 = 1704067200000L

  /** newAggregator defaults (streamaggr.go:505-524): staleness defaults
    * to the interval, ignore_first_sample_interval to the staleness
    * interval. The library Config leaves both None (= an always-up batch
    * replay, SURVEY §8.4); the reference harness pins them explicitly.
    */
  private def refDefaults(c: StreamAggr.Config): StreamAggr.Config = {
    val stale = c.stalenessIntervalMs.getOrElse(c.intervalMs)
    c.copy(
      stalenessIntervalMs = Some(stale),
      ignoreFirstSampleIntervalMs =
        Some(c.ignoreFirstSampleIntervalMs.getOrElse(stale)))
  }

  /** promrelabel.LabelsToString: `name` bare when no other labels, else
    * `name{k="v",…}` with labels sorted alphabetically.
    */
  private def labelsToString(name: String, tags: Map[String, String]): String = {
    def q(v: String): String =
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    if (tags.isEmpty) name
    else name + tags.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${q(v)}" }.mkString("{", ",", "}")
  }

  /** batch i's samples: ts = T0 + i×pushInterval + explicit prom ts
    * (MustParsePromMetrics adds offsetMsecs to every timestamp; absent
    * timestamps parse as 0).
    */
  /** one frame per input LINE so each sample carries its arrival index
    * `_arr` (the reference's Push order, which the counter kernels honor)
    * plus the batch's wall offset added to its explicit timestamp.
    */
  private def inputFrame(v: V): DataFrame = {
    val s = spark
    import s.implicits._
    val lines = v.inputs.zipWithIndex.flatMap { case (txt, i) =>
      txt.split('\n').map(l => (l, T0 + i * v.pushIntervalMs))
    }.zipWithIndex.collect {
      case ((l, off), arr) if l.trim.nonEmpty && !l.trim.startsWith("#") =>
        (l, off, arr)
    }
    val frames = lines.map { case (l, off, arr) =>
      graft.sources.LineFormats.prometheusText(Seq(l).toDF("line"), 0L)
        .withColumn("ts", col("ts") + lit(off))
        .withColumn("_arr", lit(arr))
    }
    frames.reduceOption(_ unionByName _).getOrElse(
      Seq.empty[(String, Map[String, String], Long, Double)]
        .toDF("name", "tags", "ts", "value"))
  }

  private def render(out: DataFrame): String =
    out.collect()
      .map(r => (labelsToString(r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)),
        r.getLong(2), r.get(3).asInstanceOf[Number].doubleValue()))
      .sortBy { case (ls, t, _) => (ls, t) }
      .map { case (ls, _, v) =>
        s"$ls ${graft.graphite.GraphiteModel.goFmt(v)}\n" }
      .mkString

  private def matchIdxsOf(v: V, cfgs: Seq[StreamAggr.Config]): String = {
    val s = spark
    import s.implicits._
    val lines = v.inputs.flatMap(_.split('\n'))
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
    if (lines.isEmpty) return ""
    val matched =
      if (cfgs.isEmpty) lit(false)
      else cfgs.map(c =>
        if (c.matchSelectors.isEmpty) lit(true)
        else c.matchSelectors.map(graft.api.Api.selectorPredicate).reduce(_ || _))
        .reduce(_ || _)
    val parsed = lines.map { case (l, i) =>
      graft.sources.LineFormats.prometheusText(Seq(l).toDF("line"), 0L)
        .withColumn("idx", lit(i))
    }.reduce(_ unionByName _)
    val flags = parsed.withColumn("_m", matched)
      .select("idx", "_m").collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    lines.map { case (_, i) => if (flags.getOrElse(i, false)) "1" else "0" }
      .mkString
  }

  for (v <- StreamAggrGolden.vectors) {
    test(s"success vector: ${v.id}") {
      if (v.skip.nonEmpty) cancel(v.skip)
      val cfgs = StreamAggr.parseConfigs(v.config).map(refDefaults)
      val input = inputFrame(v)
      // replay horizon: the test pushes N batches and sleeps N intervals,
      // so flush ticks run through T0 + N×pushInterval
      val horizon = Some(T0 + v.inputs.length * v.pushIntervalMs)
      val got =
        if (cfgs.isEmpty) ""
        else render(StreamAggr.applyAll(input, cfgs, horizon))
      assert(got === v.expected, s"output mismatch for ${v.id}")
      assert(matchIdxsOf(v, cfgs) === v.matchIdxs, s"matchIdxs for ${v.id}")
    }
  }

  for ((id, cfg) <- StreamAggrGolden.failures) {
    test(s"failure config rejected: $id") {
      val e = intercept[Exception](StreamAggr.parseConfigs(cfg))
      assert(e.isInstanceOf[IllegalArgumentException] ||
        e.getMessage != null, s"rejected with: ${e.getMessage}")
    }
  }
}
