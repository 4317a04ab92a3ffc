package graft.graphite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import GraphiteQL._
import GraphiteModel._
import GraphiteEval._
import GraphiteFuncs.TFunc

/** Synthetic-series generators (constantLine, time, sin, randomWalk,
  * identity, events, threshold, verticalLine) — literal frames built on
  * the render grid, no store access.
  */
object GraphiteSynth {

  /** one synthetic series from explicit (t, value-expr) rows */
  private def synthSeries(
      ctx: GraphiteCtx,
      name: String,
      pathExpr: String,
      step: Long,
      ts: Seq[Long],
      valueOf: Column => Column,
      aligned: Boolean = false): SeriesSet = {
    val tags = GraphiteTime.unmarshalTags(name)
    val tagsCol =
      if (tags.isEmpty) typedLit(Map.empty[String, String])
      else map(tags.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val df = ctx.spark
      .createDataFrame(
        ctx.spark.sparkContext.parallelize(ts.map(java.lang.Long.valueOf), 1)
          .map(org.apache.spark.sql.Row(_)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.LongType, nullable = false))))
      .select(
        lit(name).as("sid"),
        lit(1L).as("ord"),
        lit(name).as("name"),
        tagsCol.as("tags"),
        lit(pathExpr).as("pathExpr"),
        lit(null).cast("string").as("consol"),
        lit(null).cast("double").as("xff"),
        lit(step).as("step"),
        col("t"),
        valueOf(col("t")).cast("double").as("value"))
    SeriesSet(df, Set(step),
      gridRange = if (aligned) Some((ctx.startMs, ctx.endMs)) else None)
  }

  private def gridTs(start: Long, end: Long, step: Long, inclusive: Boolean): Seq[Long] = {
    val b = Seq.newBuilder[Long]
    var ts = start
    while (if (inclusive) ts <= end else ts < end) { b += ts; ts += step }
    b.result()
  }

  /** constantLine(value): 3 points at start/mid/end
    * (transform.go:1073 constantLine)
    */
  def constantLine(ctx: GraphiteCtx, pathExpr: String, n: Double): SeriesSet = {
    val name = goFmt(n)
    val half = (ctx.endMs - ctx.startMs) / 2
    synthSeries(ctx, name, pathExpr, half,
      Seq(ctx.startMs, ctx.startMs + half, ctx.startMs + 2 * half), _ => lit(n))
  }

  def constantLineFn: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 1)
    constantLine(ctx, fe.render, num(fe, "value", 0))
  }

  def threshold: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 3)
    val value = num(fe, "value", 0)
    val label = optStr(fe, "label", 1, "")
    optStr(fe, "color", 2, "")
    val base = constantLine(ctx, fe.render, value)
    if (label.isEmpty) base
    else mapSet(base, name = lit(label), setPathExpr = false)
  }

  def identity: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 1)
    val name = str(fe, "name", 0)
    val step = 60000L
    synthSeries(ctx, name, name, step,
      gridTs(ctx.startMs, ctx.endMs, step, inclusive = false),
      t => (t / 1000).cast("double"), aligned = true)
  }

  def timeFunction: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 2)
    val name = str(fe, "name", 0)
    val step = (optNum(fe, "step", 1, 60) * 1000).toLong
    // note: timeFunction's loop is end-inclusive (transform.go:3480)
    synthSeries(ctx, name, name, step,
      gridTs(ctx.startMs, ctx.endMs, step, inclusive = true),
      t => (t / 1000).cast("double"))
  }

  def sinFunction: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 3)
    val name = str(fe, "name", 0)
    val amplitude = optNum(fe, "amplitude", 1, 1)
    val step = (optNum(fe, "step", 2, 60) * 1000).toLong
    if (step <= 0) throw GraphiteError(s"step must be positive")
    synthSeries(ctx, name, name, step,
      gridTs(ctx.startMs, ctx.endMs, step, inclusive = false),
      t => lit(amplitude) * sin(t.cast("double") / 1000.0), aligned = true)
  }

  /** randomWalk: cumulative sum of uniform(-0.5, 0.5) steps. The
    * reference draws from Go math/rand (not reproducible offline —
    * SURVEY §8.1); ours is deterministic per (name, index) via xxhash64.
    */
  def randomWalk: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 2)
    val name = str(fe, "name", 0)
    val step = optNum(fe, "step", 1, 60)
    if (step <= 0) throw GraphiteError(s"step must be positive; got ${goFmt(step)}")
    val stepMs = (step * 1000).toLong
    val ts = gridTs(ctx.startMs, ctx.endMs, stepMs, inclusive = false)
    val start = ctx.startMs
    synthSeries(ctx, name, name, stepMs, ts, { t =>
      val i = ((t - start) / stepMs).cast("long")
      // v_i = sum_{k<i} (u_k - 0.5); closed form via aggregate over [0, i)
      val ks = sequence(lit(0L), i - 1, lit(1L))
      when(i <= 0, 0.0).otherwise(
        aggregate(ks, lit(0.0),
          (acc, k) =>
            acc + (pmod(xxhash64(lit(name), k), lit(1L << 52)).cast("double") /
              (1L << 52).toDouble - 0.5)))
    })
  }

  def events: TFunc = (ctx, fe) => {
    val tags = fe.args.zipWithIndex.map { case (_, i) => str(fe, "tags", i) }
    val name = s"events(${tags.map(t => StringExpr(t).render).mkString(",")})"
    // tags map is exactly {name: …} (transform.go transformEvents)
    synthSeries(ctx, name, name, ctx.storageStepMs,
      gridTs(ctx.startMs, ctx.endMs, ctx.storageStepMs, inclusive = false),
      _ => lit(Double.NaN), aligned = true)
  }

  def verticalLine: TFunc = (ctx, fe) => {
    expectArgs(fe, 1, 3)
    val tsArg = str(fe, "ts", 0)
    val ts = GraphiteTime.parseTime(ctx.nowMs, tsArg)
    val label = optStr(fe, "label", 1, "")
    if (ts < ctx.startMs)
      throw GraphiteError(
        s"verticalLine(): timestamp $ts exists before start of range: ${ctx.startMs}")
    if (ts > ctx.endMs)
      throw GraphiteError(
        s"verticalLine(): timestamp $ts exists after end of range: ${ctx.endMs}")
    synthSeries(ctx, label, label, ctx.endMs - ctx.startMs, Seq(ts, ts), _ => lit(1.0))
  }
}
