package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-manipulation transforms on the schemaless `tags`
  * MAP<STRING,STRING> column (app/vmselect/promql/transform.go:1806-2174)
  * plus the relabeling actions (lib/promrelabel/config.go:261-391). All are
  * pure per-row map expressions — codegen'd, no shuffle.
  */
object Labels {

  private def tags: Column = col("tags")

  /** label_set(q, "k1","v1", …) — transform.go:1919 */
  def labelSet(df: DataFrame, kvs: (String, String)*): DataFrame =
    df.withColumn("tags",
      map_concat(
        map_filter(tags, (k, _) => !k.isin(kvs.map(_._1): _*)),
        map(kvs.flatMap(kv => Seq(lit(kv._1), lit(kv._2))): _*)))

  /** label_del(q, "k", …) — transform.go:1846 (labeldrop relabel action) */
  def labelDel(df: DataFrame, ks: String*): DataFrame =
    df.withColumn("tags", map_filter(tags, (k, _) => !k.isin(ks: _*)))

  /** label_keep(q, "k", …) — transform.go:1835 (labelkeep) */
  def labelKeep(df: DataFrame, ks: String*): DataFrame =
    df.withColumn("tags", map_filter(tags, (k, _) => k.isin(ks: _*)))

  /** label_copy / label_move — transform.go:1952,1957 */
  def labelCopy(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn("tags",
      when(tags.getItem(src).isNotNull,
        map_concat(map_filter(tags, (k, _) => k =!= dst), map(lit(dst), tags.getItem(src))))
        .otherwise(tags))
  def labelMove(df: DataFrame, src: String, dst: String): DataFrame =
    labelDel(labelCopy(df, src, dst), src)

  /** label_join(q, dst, sep, srcs…) — transform.go:2034 */
  def labelJoin(df: DataFrame, dst: String, sep: String, srcs: String*): DataFrame =
    df.withColumn("tags",
      map_concat(
        map_filter(tags, (k, _) => k =!= dst),
        map(lit(dst), concat_ws(sep, srcs.map(s => coalesce(tags.getItem(s), lit(""))): _*))))

  /** label_replace(q, dst, repl, src, regex) — transform.go:2073; the
    * regex is fully anchored like the reference
    * (lib/storage/tag_filters.go:160).
    */
  def labelReplace(df: DataFrame, dst: String, repl: String, src: String, regex: String): DataFrame = {
    val srcV = coalesce(tags.getItem(src), lit(""))
    val replaced = regexp_replace(srcV, s"^(?:$regex)$$", repl)
    df.withColumn("tags",
      when(srcV.rlike(s"^(?:$regex)$$"),
        map_concat(map_filter(tags, (k, _) => k =!= dst), map(lit(dst), replaced)))
        .otherwise(tags))
  }

  /** label_lowercase / label_uppercase — transform.go:1913,1916 */
  def labelLowercase(df: DataFrame, ks: String*): DataFrame =
    df.withColumn("tags",
      transform_values(tags, (k, v) => when(k.isin(ks: _*), lower(v)).otherwise(v)))
  def labelUppercase(df: DataFrame, ks: String*): DataFrame =
    df.withColumn("tags",
      transform_values(tags, (k, v) => when(k.isin(ks: _*), upper(v)).otherwise(v)))

  /** label_map(q, label, v1, r1, …) — value lookup table (transform.go:1978) */
  def labelMap(df: DataFrame, key: String, mapping: Map[String, String]): DataFrame = {
    val m = map(mapping.flatMap(kv => Seq(lit(kv._1), lit(kv._2))).toSeq: _*)
    df.withColumn("tags",
      transform_values(tags, (k, v) =>
        when(k === key, coalesce(element_at(m, v), v)).otherwise(v)))
  }

  /** label_value(q, "k") — numeric value of a label (transform.go:2103) */
  def labelValue(df: DataFrame, k: String): DataFrame =
    df.withColumn("value", tags.getItem(k).cast("double"))

  /** label_match / label_mismatch — series filters on a label regex
    * (transform.go:2118,2131); anchored like all reference regexes.
    */
  def labelMatch(df: DataFrame, k: String, regex: String): DataFrame =
    df.filter(coalesce(tags.getItem(k), lit("")).rlike(s"^(?:$regex)$$"))
  def labelMismatch(df: DataFrame, k: String, regex: String): DataFrame =
    df.filter(!coalesce(tags.getItem(k), lit("")).rlike(s"^(?:$regex)$$"))

  /** labels_equal(q, "k1", "k2") — transform.go:2145 */
  def labelsEqual(df: DataFrame, k1: String, k2: String): DataFrame =
    df.filter(tags.getItem(k1).isNotNull && tags.getItem(k1) === tags.getItem(k2))

  // drop_common_labels lives in lang/Eval.scala (single-aggregation
  // sentinel form, Eval.scala:1441) — no operator-level helper: the old
  // two-action (count + collect) version was a driver-funnel anti-pattern.

  /** hashmod relabel action (lib/promrelabel/config.go:330): dst = hash(src) % m */
  def hashmod(df: DataFrame, src: String, dst: String, m: Int): DataFrame =
    df.withColumn("tags",
      map_concat(
        map_filter(tags, (k, _) => k =!= dst),
        map(lit(dst), (abs(xxhash64(tags.getItem(src))) % m).cast("string"))))
}
