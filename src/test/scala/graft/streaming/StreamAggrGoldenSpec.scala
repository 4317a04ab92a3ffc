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

  /** dedup_test.go TestDeduplicateSamples: the keep rule over a single
    * old/new pair — newer ts wins, ties keep the bigger value, StaleNaN
    * never wins a tie.
    */
  test("dedup keep rule (TestDeduplicateSamples vectors)") {
    val s = spark
    import s.implicits._
    val vectors = Seq(
      // (oldT, newT, oldV, newV, expT, expV)
      (1000L, 2000L, 1.0, 2.0, 2000L, 2.0),
      (2000L, 1000L, 2.0, 1.0, 2000L, 2.0),
      (1000L, 1000L, 1.0, 2.0, 1000L, 2.0),
      (1000L, 1000L, 2.0, 1.0, 1000L, 2.0),
      (1000L, 1000L, 1.0, 1.0, 1000L, 1.0),
      (1000L, 1000L, 1.0, Double.NaN, 1000L, 1.0),
      (1000L, 1000L, Double.NaN, 2.0, 1000L, 2.0))
    for ((ot, nt, ov, nv, et, ev) <- vectors) {
      val in = Seq(("m", Map.empty[String, String], ot, ov),
        ("m", Map.empty[String, String], nt, nv)).toDF("name", "tags", "ts", "value")
      val out = StreamAggr.deduplicatorBatch(in, 3600000L).collect()
      assert(out.length == 1)
      assert(out.head.getLong(2) == et && out.head.getDouble(3) == ev,
        s"vector ($ot,$nt,$ov,$nv): got ${out.head}")
    }
  }

  /** deduplicator_test.go TestDeduplicator: drop-labels + one-hour dedup
    * over a 10×-repeated pushed batch, rendered like the reference.
    */
  test("standalone deduplicator (TestDeduplicator vector)") {
    val labels = """instance="x",job="aaa",pod="sdfd-dfdfdfs",node="aosijjewrerfd",namespace="asdff",container="ohohffd""""
    val text = s"""
foo{$labels} 123
bar{$labels} 34.54
x 8943 1
baz_aaa_aaa_fdd{$labels} -34.34
x 90984
x 433 1
asfjkldsf{$labels} 12322
foo{$labels} 894
baz_aaa_aaa_fdd{$labels} -2.3
"""
    val s = spark
    import s.implicits._
    val off = 1704067260000L // now + 1m analogue; any fixed offset works
    val one = graft.sources.LineFormats.prometheusText(
      text.split('\n').toSeq.toDF("line"), 0L)
      .withColumn("ts", col("ts") + lit(off))
    // Push(tss) ten times — duplicates collapse under the same keep rule
    val pushed = (1 to 10).map(_ => one).reduce(_ unionByName _)
    val out = StreamAggr.deduplicatorBatch(pushed, 3600000L,
      dropLabels = Seq("node", "instance"))
    val rendered = out.collect()
      .map(r => (labelsToString(r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)),
        graft.graphite.GraphiteModel.goFmt(r.getDouble(3))))
      .sortBy(_._1).map { case (ls, v) => s"$ls $v\n" }.mkString
    val expected =
      """asfjkldsf{container="ohohffd",job="aaa",namespace="asdff",pod="sdfd-dfdfdfs"} 12322
bar{container="ohohffd",job="aaa",namespace="asdff",pod="sdfd-dfdfdfs"} 34.54
baz_aaa_aaa_fdd{container="ohohffd",job="aaa",namespace="asdff",pod="sdfd-dfdfdfs"} -2.3
foo{container="ohohffd",job="aaa",namespace="asdff",pod="sdfd-dfdfdfs"} 894
x 8943
"""
    assert(rendered == expected)
  }
}
