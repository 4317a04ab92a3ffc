package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus-style relabeling pipeline (SURVEY §2.8,
  * lib/promrelabel/config.go:261-391): a rule list compiled to a
  * deterministic per-row column pipeline over the samples frame
  * (name, tags, ts, value). The metric name participates as the
  * `__name__` pseudo-label, exactly like the reference.
  *
  * Supported actions: replace, replace_all, keep, drop, keep_metrics,
  * drop_metrics, keep_if_equal, drop_if_equal, keep_if_contains,
  * drop_if_contains, keepequal, dropequal, graphite, hashmod, uppercase,
  * lowercase, labelmap, labelmap_all, labeldrop, labelkeep.
  * (hashmod uses xxhash64 instead of the reference's md5 — documented
  * deviation; bucket distribution properties are equivalent.)
  */
object Relabel {

  final case class Rule(
      action: String,
      sourceLabels: Seq[String] = Nil,
      separator: String = ";",
      targetLabel: String = "",
      regex: String = "(.*)",
      replacement: String = "$1",
      modulus: Long = 0,
      matchTemplate: String = "", // graphite: e.g. "foo.*.bar"
      labels: Map[String, String] = Map.empty) // graphite: label -> "$1" template

  private def anchored(re: String): String = "^(?:" + re + ")$"

  /** graphite match template → regex: literals escaped, `*` → a lazily
    * matched dot-free capture (the reference's Match takes the FIRST
    * position where the next literal part fits, graphite.go:80-128).
    */
  private def graphiteTemplateRegex(template: String): String =
    template.map {
      case '*' => "([^.]*?)"
      case c if "\\^$()+?[]|{}.".contains(c) => "\\" + c
      case c => c.toString
    }.mkString

  /** apply a rule list; rows filtered by keep/drop rules are removed */
  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // fold name into the label map as __name__ for uniform rule handling
    val merged = df.withColumn("_m", map_concat(
      when(col("name").isNotNull, map(lit("__name__"), col("name")))
        .otherwise(map().cast("map<string,string>")),
      col("tags")))
    val out = rules.foldLeft(merged)(applyRule)
    out.select(
      out.col("_m").getItem("__name__").as("name"),
      map_filter(out.col("_m"), (k, _) => k =!= "__name__").as("tags"),
      col("ts"), col("value"))
  }

  private def applyRule(df: DataFrame, r: Rule): DataFrame = {
    val m = col("_m")
    def get(l: String): Column = coalesce(m.getItem(l), lit(""))
    val src = concat_ws(r.separator, r.sourceLabels.map(get): _*)
    def setLabel(target: String, v: Column): Column =
      map_concat(map_filter(m, (k, _) => k =!= target), map(lit(target), v))

    r.action match {
      case "replace" =>
        // only on regex match; replacement expands $1… capture groups
        val matches = src.rlike(anchored(r.regex))
        val v = regexp_replace(src, anchored(r.regex), r.replacement)
        df.withColumn("_m", when(matches, setLabel(r.targetLabel, v)).otherwise(m))
      case "replace_all" =>
        df.withColumn("_m",
          setLabel(r.targetLabel, regexp_replace(src, r.regex, r.replacement)))
      case "keep" => df.filter(src.rlike(anchored(r.regex)))
      case "drop" => df.filter(!src.rlike(anchored(r.regex)))
      case "keep_metrics" => df.filter(get("__name__").rlike(anchored(r.regex)))
      case "drop_metrics" => df.filter(!get("__name__").rlike(anchored(r.regex)))
      case "keep_if_equal" =>
        val eq = r.sourceLabels.tail
          .map(l => get(l) === get(r.sourceLabels.head))
          .reduceOption(_ && _).getOrElse(lit(true))
        df.filter(eq)
      case "drop_if_equal" =>
        val eq = r.sourceLabels.tail
          .map(l => get(l) === get(r.sourceLabels.head))
          .reduceOption(_ && _).getOrElse(lit(true))
        df.filter(!eq)
      case "keep_if_contains" =>
        // keep if target_label's value CONTAINS every source label's value
        // (relabel.go:518 containsAllLabelValues)
        val ok = r.sourceLabels.map(l => get(r.targetLabel).contains(get(l)))
          .reduceOption(_ && _).getOrElse(lit(true))
        df.filter(ok)
      case "drop_if_contains" =>
        val ok = r.sourceLabels.map(l => get(r.targetLabel).contains(get(l)))
          .reduceOption(_ && _).getOrElse(lit(true))
        df.filter(!ok)
      case "keepequal" =>
        // keep if source_labels joined with separator EQUALS target_label
        // (relabel.go:309)
        df.filter(src === get(r.targetLabel))
      case "dropequal" =>
        df.filter(!(src === get(r.targetLabel)))
      case "graphite" =>
        // graphite template match on the metric name: `*` captures one
        // dot-free segment; each labels entry is a "$N" replace template
        // (lib/promrelabel/graphite.go Match/replace). Non-matching rows
        // pass through unchanged.
        val re = anchored(graphiteTemplateRegex(r.matchTemplate))
        val nm = get("__name__")
        val matches = nm.rlike(re)
        val keys = r.labels.keys.toSeq
        val newMaps = r.labels.toSeq.map { case (lbl, tmpl) =>
          map(lit(lbl), regexp_replace(nm, re, tmpl))
        }
        val merged = (map_filter(m, (k, _) => !k.isInCollection(keys)) +: newMaps)
          .reduce(map_concat(_, _))
        df.withColumn("_m", when(matches, merged).otherwise(m))
      case "hashmod" =>
        df.withColumn("_m",
          setLabel(r.targetLabel, (pmod(xxhash64(src), lit(r.modulus))).cast("string")))
      case "uppercase" => df.withColumn("_m", setLabel(r.targetLabel, upper(src)))
      case "lowercase" => df.withColumn("_m", setLabel(r.targetLabel, lower(src)))
      case "labelmap" =>
        // labels matching regex spawn renamed copies; the copy wins on a
        // name collision (config.go labelmap)
        val matchedEntries =
          filter(map_entries(m), e => e.getField("key").rlike(anchored(r.regex)))
        val newKeys = transform(matchedEntries,
          e => regexp_replace(e.getField("key"), anchored(r.regex), r.replacement))
        val mapped = map_from_entries(
          transform(matchedEntries, e => struct(
            regexp_replace(e.getField("key"), anchored(r.regex), r.replacement).as("key"),
            e.getField("value").as("value"))))
        df.withColumn("_m", map_concat(
          map_filter(m, (k, _) => !array_contains(newKeys, k)), mapped))
      case "labelmap_all" =>
        df.withColumn("_m", map_from_entries(
          transform(map_entries(m), e => struct(
            regexp_replace(e.getField("key"), r.regex, r.replacement).as("key"),
            e.getField("value").as("value")))))
      case "labeldrop" =>
        df.withColumn("_m", map_filter(m, (k, _) => !k.rlike(anchored(r.regex))))
      case "labelkeep" =>
        df.withColumn("_m", map_filter(m,
          (k, _) => k.rlike(anchored(r.regex)) || k === "__name__"))
      case other => throw new IllegalArgumentException(s"unsupported relabel action '$other'")
    }
  }
}
