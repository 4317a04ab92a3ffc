package graft.api

import java.io.Writer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graphite._

/** Graphite HTTP API bodies: /render, /metrics/find, /metrics/expand and
  * the /tags family (app/vmselect/graphite/{render,metrics,tags}_api.go
  * + their qtpl response writers). HttpApi wires these under the same
  * routes the reference serves.
  */
object GraphiteHttp {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def q(s: String): String = "\"" + esc(s) + "\""

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  // ------------------------------------------------------------------
  // /render?format=json
  // ------------------------------------------------------------------

  /** Evaluate every target and stream the render JSON: series sorted by
    * name (render_response.qtpl RenderJSONResponse), tags sorted by key,
    * datapoints as [value|null, unix-seconds]. Rows stream through
    * `toLocalIterator` over a Spark-side sort, so driver memory stays
    * bounded by a partition (the reference's qtpl streaming, same idea).
    */
  def render(
      spark: SparkSession,
      store: DataFrame,
      targets: Seq[String],
      fromMs: Long,
      untilMs: Long,
      storageStepMs: Long,
      xff: Double,
      maxDataPoints: Int,
      nowMs: Long,
      w: Writer): Unit = {
    val ctx = GraphiteCtx(spark, store, fromMs, untilMs, storageStepMs,
      xff = xff, nowMs = nowMs)
    val sets = targets.zipWithIndex.map { case (t, i) =>
      var ss = GraphiteEval.exec(ctx, t)
      if (maxDataPoints > 0 && ctx.pointsLen(ss.step) > maxDataPoints) {
        val step = (untilMs - fromMs) / maxDataPoints
        ss = GraphiteModel.summarizeSet(ctx, ss, fromMs, untilMs, step, None,
          coalesce(col("xff"), lit(xff)))
      }
      ss.copy(df =
        ss.df.withColumn("sid", concat(lit(s"$i|"), col("sid"))))
    }
    if (sets.isEmpty) { w.write("[]"); return }
    val all = sets.map(_.df).reduce(_ unionByName _)
    val it = all
      .select(col("name"), col("sid"), col("tags"), col("t"), col("value"))
      .orderBy(col("name"), col("sid"), col("t"))
      .toLocalIterator()
    w.write("[")
    var curSid: String = null
    var first = true
    var firstPt = true
    while (it.hasNext) {
      val r = it.next()
      val sid = r.getString(1)
      if (sid != curSid) {
        if (curSid != null) w.write("]}")
        if (!first) w.write(",")
        first = false
        curSid = sid
        val tags = Option(r.getMap[String, String](2)).map(_.toMap)
          .getOrElse(Map.empty)
        val tagsJson = tags.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
        w.write(s"""{"target":${q(r.getString(0))},"tags":$tagsJson,"datapoints":[""")
        firstPt = true
      }
      if (!firstPt) w.write(",")
      firstPt = false
      val v = r.getDouble(4)
      val vs = if (v.isNaN || v.isInfinite) "null" else fmt(v)
      w.write(s"[$vs,${r.getLong(3) / 1000}]")
    }
    if (curSid != null) w.write("]}")
    w.write("]")
  }

  // ------------------------------------------------------------------
  // /metrics/find + /metrics/expand
  // ------------------------------------------------------------------

  /** Node-wise find over the store's metric names: a name matches when
    * its first k segments glob-match the query's k segments; the result
    * is the distinct matched prefixes, a trailing delimiter marking
    * non-leaf paths (metrics_api.go metricsFind semantics over
    * TagValueSuffixes).
    */
  def findPaths(store: DataFrame, query: String, delimiter: Char): Seq[String] = {
    val d = delimiter.toString
    val segs = query.split(java.util.regex.Pattern.quote(d), -1)
    val segRes = segs.map(s => GraphiteQL.globToRegex(s).stripPrefix("^").stripSuffix("$"))
    val prefixRe = segRes.mkString("(", java.util.regex.Pattern.quote(d), ")")
    val full = s"^$prefixRe(${java.util.regex.Pattern.quote(d)}.*)?$$"
    val names = store.select(col("name")).distinct()
      .filter(col("name").rlike(full))
      .select(
        regexp_extract(col("name"), full, 1).as("p"),
        (regexp_extract(col("name"), full, 2) =!= "").as("deeper"))
      .distinct()
      .collect()
    names.map { r =>
      val p = r.getString(0)
      if (r.getBoolean(1)) p + d else p
    }.distinct.sorted
  }

  /** treejson format (metrics_find_response.qtpl), including the
    * double-delimiter merge for paths that are both leaf and branch
    */
  def findTreeJson(paths0: Seq[String], delimiter: String, wildcards: Boolean): String = {
    var paths = paths0.sorted.toList
    if (paths.size > 1) {
      val dst = scala.collection.mutable.ListBuffer(paths.head)
      for (path <- paths.tail) {
        val prev = dst.last
        if (path.length == prev.length + 1 && path.endsWith(delimiter) &&
          path.startsWith(prev))
          dst(dst.size - 1) = path + delimiter
        else dst += path
      }
      paths = dst.toList
    }
    def pathName(path: String): String = {
      var n = path
      while (n.endsWith(delimiter)) n = n.dropRight(1)
      val i = n.lastIndexOf(delimiter)
      if (i >= 0) n.substring(i + 1) else n
    }
    val entries = paths.map { path =>
      var id = path
      var allow = "0"
      var leaf = "1"
      if (id.endsWith(delimiter)) {
        if (id.dropRight(1).endsWith(delimiter)) id = id.dropRight(2)
        allow = "1"; leaf = "0"
      }
      s"""{"id":${q(id)},"text":${q(pathName(path))},"allowChildren":$allow,"expandable":$allow,"leaf":$leaf}"""
    }
    val wild =
      if (wildcards && paths.size > 1) {
        var p = paths.head
        while (p.endsWith(delimiter)) p = p.dropRight(1)
        val i = p.lastIndexOf(delimiter)
        val id = (if (i >= 0) p.substring(0, i + 1) else "") + "*"
        val branch = paths.exists(_.endsWith(delimiter))
        val (a, l) = if (branch) ("1", "0") else ("0", "1")
        Seq(s"""{"id":${q(id)},"text":"*","allowChildren":$a,"expandable":$a,"leaf":$l}""")
      } else Nil
    (entries ++ wild).mkString("[", ",", "]")
  }

  /** completer format */
  def findCompleterJson(paths: Seq[String], delimiter: String, wildcards: Boolean): String = {
    def pathName(path: String): String = {
      var n = path
      while (n.endsWith(delimiter)) n = n.dropRight(1)
      val i = n.lastIndexOf(delimiter)
      if (i >= 0) n.substring(i + 1) else n
    }
    val entries = paths.map { path =>
      val leaf = if (path.endsWith(delimiter)) "0" else "1"
      s"""{"path":${q(path)},"name":${q(pathName(path))},"is_leaf":$leaf}"""
    }
    val wild = if (wildcards && paths.size > 1) Seq("""{"name":"*"}""") else Nil
    s"""{"metrics":${(entries ++ wild).mkString("[", ",", "]")}}"""
  }

  def expandFlatJson(paths: Seq[String]): String =
    paths.sorted.map(q).mkString("[", ",", "]")

  def expandByQueryJson(m: Seq[(String, Seq[String])]): String = {
    val body = m.map { case (query, paths) =>
      s"${q(query)}:${paths.sorted.map(q).mkString("[", ",", "]")}"
    }.mkString(",")
    s"""{"results":{$body}}"""
  }

  // ------------------------------------------------------------------
  // /tags family
  // ------------------------------------------------------------------

  private def canonCol = GraphiteModel.canonicalPath(col("name"), col("tags"))

  /** distinct graphite tag names incl. the `name` pseudo-tag */
  def tagsJson(store: DataFrame, filter: String, limit: Int): String = {
    val keys = store.select(explode(map_keys(col("tags"))).as("k"))
      .union(store.select(lit("name").as("k")))
      .distinct().collect().map(_.getString(0)).sorted
    val filtered =
      if (filter.isEmpty) keys.toSeq else keys.toSeq.filter(_.matches(".*" + filter + ".*"))
    val limited = if (limit > 0) filtered.take(limit) else filtered
    limited.map(t => s"""{"tag":${q(t)}}""").mkString("[", ",", "]")
  }

  def tagValuesJson(store: DataFrame, tag: String, filter: String, limit: Int): String = {
    val valueCol = if (tag == "name") col("name") else col("tags").getItem(tag)
    val values = store.select(valueCol.as("v")).filter(col("v").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted
    val filtered =
      if (filter.isEmpty) values.toSeq
      else values.toSeq.filter(_.matches(".*" + filter + ".*"))
    val limited = if (limit > 0) filtered.take(limit) else filtered
    val body = limited.map(v => s"""{"count":1,"value":${q(v)}}""").mkString(",")
    s"""{"tag":${q(tag)},"values":[$body]}"""
  }

  /** canonical paths of series matching the tag expressions
    * (tags_api.go TagsFindSeriesHandler, sorted — getCanonicalPaths);
    * identity-only: no grid materialization
    */
  def findSeriesJson(spark: SparkSession, store: DataFrame, exprs: Seq[String]): String = {
    val paths = store.filter(GraphiteModel.tagExprPredicate(exprs))
      .select(canonCol.as("sid")).distinct()
      .collect().map(_.getString(0)).sorted
    paths.map(q).mkString("[", ",", "]")
  }

  def autoCompleteTagsJson(
      store: DataFrame, exprs: Seq[String], tagPrefix: String, limit: Int,
      spark: SparkSession): String = {
    val base =
      if (exprs.isEmpty) store
      else matchByExprs(spark, store, exprs)
    val keys = base.select(explode(map_keys(col("tags"))).as("k"))
      .union(base.select(lit("name").as("k")))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val filtered = if (tagPrefix.isEmpty) keys else keys.filter(_.startsWith(tagPrefix))
    val limited = if (limit > 0) filtered.take(limit) else filtered
    limited.map(q).mkString("[", ",", "]")
  }

  def autoCompleteValuesJson(
      store: DataFrame, exprs: Seq[String], tag: String, valuePrefix: String,
      limit: Int, spark: SparkSession): String = {
    val base =
      if (exprs.isEmpty) store
      else matchByExprs(spark, store, exprs)
    val valueCol = if (tag == "name") col("name") else col("tags").getItem(tag)
    val values = base.select(valueCol.as("v")).filter(col("v").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val filtered =
      if (valuePrefix.isEmpty) values else values.filter(_.startsWith(valuePrefix))
    val limited = if (limit > 0) filtered.take(limit) else filtered
    limited.map(q).mkString("[", ",", "]")
  }

  private def matchByExprs(
      spark: SparkSession, store: DataFrame, exprs: Seq[String]): DataFrame =
    store.filter(GraphiteModel.tagExprPredicate(exprs))
}
