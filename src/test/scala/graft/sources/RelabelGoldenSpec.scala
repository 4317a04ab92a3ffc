package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** TestParsedRelabelConfigsApply port (lib/promrelabel/relabel_test.go:164):
  * every (yaml config, metric, finalize) vector verbatim, applied through
  * the real [[Relabel]] DataFrame pipeline on a one-row frame. A dropped
  * row renders as `{}` like the reference's empty label set; finalize
  * removes `__`-prefixed labels except `__name__` (FinalizeLabels).
  */
class RelabelGoldenSpec extends SparkSpec {

  /** `foo{bar="baz"}` / `{}` / bare-name metric string → (name, tags) */
  private def parseMetric(s: String): (String, Map[String, String]) = {
    val i = s.indexOf('{')
    if (i < 0) (if (s.isEmpty) null else s, Map.empty)
    else {
      val name = if (i == 0) null else s.substring(0, i)
      val inner = s.substring(i + 1, s.length - 1).trim
      val tags =
        if (inner.isEmpty) Map.empty[String, String]
        else inner.split(",(?=[^,=]+=)").map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
        }.toMap
      (name, tags)
    }
  }

  private def render(name: String, tags: Map[String, String]): String = {
    val body = tags.toSeq.sortBy(_._1).map { case (k, v) => s"""$k="$v"""" }.mkString(",")
    if (name == null || name.isEmpty) s"{$body}"
    else if (body.isEmpty) name
    else s"$name{$body}"
  }

  private def one(name: String, tags: Map[String, String]): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(name, tags, 1000L, 1.0))
    spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType),
      StructField("value", DoubleType))))
  }

  private def check(config: String, metric: String, finalize: Boolean,
      expected: String): Unit = {
    val (nm, tags) = parseMetric(metric)
    val rules = Relabel.parseConfig(config)
    val got = Relabel.apply(one(nm, tags), rules).collect()
    val rendered =
      if (got.isEmpty) "{}"
      else {
        val r = got.head
        var t = Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)
        if (finalize) t = t.filterNot(_._1.startsWith("__"))
        render(r.getString(0), t)
      }
    assert(rendered == expected,
      s"config=<$config> metric=<$metric> finalize=$finalize: got $rendered, want $expected")
  }

  private val vectors: Seq[(String, String, Boolean, String)] = Seq(
    ("""""",
      """{}""", false, """{}"""),
    ("""""",
      """{}""", true, """{}"""),
    ("""""",
      """{foo="bar"}""", false, """{foo="bar"}"""),
    ("""""",
      """xxx{foo="bar",__aaa="yyy"}""", false, """xxx{__aaa="yyy",foo="bar"}"""),
    ("""""",
      """xxx{foo="bar",__aaa="yyy"}""", true, """xxx{foo="bar"}"""),
    ("""
- action: replace
  target_label: bar
""",
      """{}""", false, """{}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: bar
""",
      """{}""", false, """{}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "bar"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "bar"
  regex: ".+"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "xxx"
  regex: ".+"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace
  if: '{foo="bar"}'
  source_labels: ["xxx", "foo"]
  target_label: "bar"
  replacement: "a-$1-b"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace
  source_labels: ["xxx", "foo"]
  target_label: "bar"
  replacement: "a-$1-b"
""",
      """{xxx="yyy"}""", false, """{bar="a-yyy;-b",xxx="yyy"}"""),
    ("""
- action: replace
  source_labels: ["xxx", "foo"]
  target_label: "xxx"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy;"}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "xxx"
""",
      """{xxx="yyy"}""", false, """{}"""),
    ("""
- action: replace
  if: '{xxx=~".y."}'
  source_labels: ["xxx", "foo"]
  target_label: "bar"
  replacement: "a-$1-b"
""",
      """{xxx="yyy"}""", false, """{bar="a-yyy;-b",xxx="yyy"}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "foo"
  regex: "xxx"
  replacement: ""
""",
      """{foo="xxx",bar="baz"}""", false, """{bar="baz"}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "foo"
  regex: "xxx"
  replacement: ""
""",
      """{foo="yyy",bar="baz"}""", false, """{bar="baz",foo="yyy"}"""),
    ("""
- action: replace
  source_labels: ["xxx", "foo"]
  regex: "yyy;.+"
  target_label: "foo"
  replacement: ""
""",
      """{xxx="yyy",foo="bar"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace
  source_labels: ["xxx", "foo"]
  regex: "yyy;.+"
  target_label: "foo"
  replacement: ""
""",
      """{xxx="yyyz",foo="bar"}""", false, """{foo="bar",xxx="yyyz"}"""),
    ("""
- action: replace
  source_labels: ["xxx", "foo"]
  target_label: "bar-$1"
  replacement: "a-$1-b"
""",
      """{xxx="yyy"}""", false, """{bar-yyy;="a-yyy;-b",xxx="yyy"}"""),
    ("""
- action: replace_all
  source_labels: [foo]
  target_label: "bar"
""",
      """{}""", false, """{}"""),
    ("""
- action: replace_all
  source_labels: ["foo"]
  target_label: "bar"
""",
      """{}""", false, """{}"""),
    ("""
- action: replace_all
  source_labels: ["foo"]
  target_label: "bar"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace_all
  source_labels: ["foo"]
  target_label: "bar"
  regex: ".+"
""",
      """{xxx="yyy"}""", false, """{xxx="yyy"}"""),
    ("""
- action: replace_all
  if: 'foo'
  source_labels: ["xxx"]
  target_label: "xxx"
  regex: "-"
  replacement: "."
""",
      """{xxx="a-b-c"}""", false, """{xxx="a-b-c"}"""),
    ("""
- action: replace_all
  source_labels: ["xxx"]
  target_label: "xxx"
  regex: "-"
  replacement: "."
""",
      """{xxx="a-b-c"}""", false, """{xxx="a.b.c"}"""),
    ("""
- action: replace_all
  if: '{non_existing_label=~".*"}'
  source_labels: ["xxx"]
  target_label: "xxx"
  regex: "-"
  replacement: "."
""",
      """{xxx="a-b-c"}""", false, """{xxx="a.b.c"}"""),
    ("""
- action: replace_all
  source_labels: ["xxx", "foo"]
  target_label: "xxx"
  regex: "(;)"
  replacement: "-$1-"
""",
      """{xxx="y;y"}""", false, """{xxx="y-;-y-;-"}"""),
    ("""
- action: replace
  source_labels: ["xxx"]
  target_label: "bar"
  replacement: "a-$1"
- action: replace
  source_labels: ["bar"]
  target_label: "zar"
  replacement: "b-$1"
""",
      """{xxx="yyy",instance="a.bc"}""", true, """{bar="a-yyy",instance="a.bc",xxx="yyy",zar="b-a-yyy"}"""),
    ("""
- action: replace
  source_labels: ["foo"]
  target_label: "foo"
  replacement: "a-$1"
""",
      """{foo="aaxx"}""", true, """{foo="a-aaxx"}"""),
    ("""
- action: replace
  target_label: foo
  replacement: "foobar"
""",
      """{}""", true, """{foo="foobar"}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{x="y"}""", true, """{x="y"}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{bar="aaa"}""", true, """{}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{foo="aaa"}""", true, """{foo="aaa"}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{bar="aaa",foo="aaa"}""", true, """{bar="aaa",foo="aaa"}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar, baz]
""",
      """{bar="aaa",foo="aaa",baz="aaa"}""", true, """{bar="aaa",baz="aaa",foo="aaa"}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{bar="aaa",foo="bbb"}""", true, """{}"""),
    ("""
- action: keep_if_contains
  target_label: foo
  source_labels: [bar, baz]
""",
      """{bar="aaa",foo="aaa",baz="bbb"}""", true, """{}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{x="y"}""", true, """{}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{bar="aaa"}""", true, """{bar="aaa"}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{foo="aaa"}""", true, """{}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{bar="aaa",foo="aaa"}""", true, """{}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar, baz]
""",
      """{bar="aaa",foo="aaa",baz="aaa"}""", true, """{}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar]
""",
      """{bar="aaa",foo="bbb"}""", true, """{bar="aaa",foo="bbb"}"""),
    ("""
- action: drop_if_contains
  target_label: foo
  source_labels: [bar, baz]
""",
      """{bar="aaa",foo="aaa",baz="bbb"}""", true, """{bar="aaa",baz="bbb",foo="aaa"}"""),
    ("""
- action: keep_if_equal
  source_labels: ["foo", "bar"]
""",
      """{}""", true, """{}"""),
    ("""
- action: keep_if_equal
  source_labels: ["xxx", "bar"]
""",
      """{xxx="yyy"}""", true, """{}"""),
    ("""
- action: keep_if_equal
  source_labels: ["xxx", "bar"]
""",
      """{xxx="yyy",bar="yyy"}""", true, """{bar="yyy",xxx="yyy"}"""),
    ("""
- action: drop_if_equal
  source_labels: ["foo", "bar"]
""",
      """{}""", true, """{}"""),
    ("""
- action: drop_if_equal
  source_labels: ["xxx", "bar"]
""",
      """{xxx="yyy"}""", true, """{xxx="yyy"}"""),
    ("""
- action: drop_if_equal
  source_labels: [xxx, bar]
""",
      """{xxx="yyy",bar="yyy"}""", true, """{}"""),
    ("""
- action: keepequal
  source_labels: [foo]
  target_label: bar
""",
      """{foo="a",bar="a"}""", true, """{bar="a",foo="a"}"""),
    ("""
- action: keepequal
  source_labels: [foo]
  target_label: bar
""",
      """{foo="a",bar="x"}""", true, """{}"""),
    ("""
- action: dropequal
  source_labels: [foo]
  target_label: bar
""",
      """{foo="a",bar="a"}""", true, """{}"""),
    ("""
- action: dropequal
  source_labels: [foo]
  target_label: bar
""",
      """{foo="a",bar="x"}""", true, """{bar="x",foo="a"}"""),
    ("""
- action: keep
  source_labels: [foo]
  regex: ".+"
""",
      """{}""", true, """{}"""),
    ("""
- action: keep
  source_labels: [foo]
  regex: ".+"
""",
      """{xxx="yyy"}""", true, """{}"""),
    ("""
- action: keep
  if: '{foo="bar"}'
""",
      """{foo="yyy"}""", false, """{}"""),
    ("""
- action: keep
  if: ['foobar', '{foo="yyy"}', '{a="b"}']
""",
      """{foo="yyy"}""", false, """{foo="yyy"}"""),
    ("""
- action: keep
  source_labels: [foo]
  regex: "yyy"
""",
      """{foo="yyy"}""", false, """{foo="yyy"}"""),
    ("""
- action: keep
  source_labels: ["foo"]
  regex: ".+"
""",
      """{foo="yyy"}""", false, """{foo="yyy"}"""),
    ("""
- action: keep_metrics
  regex:
  - foo
  - bar
""",
      """xxx""", true, """{}"""),
    ("""
- action: keep_metrics
  if: 'bar'
""",
      """foo""", true, """{}"""),
    ("""
- action: keep_metrics
  if: 'foo'
""",
      """foo""", true, """foo"""),
    ("""
- action: keep_metrics
  regex:
  - foo
  - bar
""",
      """foo""", true, """foo"""),
    ("""
- action: drop
  source_labels: [foo]
  regex: ".+"
""",
      """{}""", false, """{}"""),
    ("""
- action: drop
  source_labels: [foo]
  regex: ".+"
""",
      """{xxx="yyy"}""", true, """{xxx="yyy"}"""),
    ("""
- action: drop
  if: '{foo="bar"}'
""",
      """{foo="yyy"}""", true, """{foo="yyy"}"""),
    ("""
- action: drop
  if: '{foo="yyy"}'
""",
      """{foo="yyy"}""", true, """{}"""),
    ("""
- action: drop
  source_labels: [foo]
  regex: yyy
""",
      """{foo="yyy"}""", true, """{}"""),
    ("""
- action: drop
  source_labels: [foo]
  regex: ".+"
""",
      """{foo="yyy"}""", true, """{}"""),
    ("""
- action: drop_metrics
  regex:
  - foo
  - bar
""",
      """xxx""", true, """xxx"""),
    ("""
- action: drop_metrics
  if: bar
""",
      """foo""", true, """foo"""),
    ("""
- action: drop_metrics
  if: foo
""",
      """foo""", true, """{}"""),
    ("""
- action: drop_metrics
  regex:
  - foo
  - bar
""",
      """foo""", true, """{}"""),
    ("""
- action: hashmod
  source_labels: [foo]
  target_label: aaa
  modulus: 123
""",
      """{xxx="yyy"}""", false, """{aaa="81",xxx="yyy"}"""),
    ("""
- action: hashmod
  if: '{foo="bar"}'
  source_labels: [foo]
  target_label: aaa
  modulus: 123
""",
      """{foo="yyy"}""", true, """{foo="yyy"}"""),
    ("""
- action: hashmod
  if: '{foo="yyy"}'
  source_labels: [foo]
  target_label: aaa
  modulus: 123
""",
      """{foo="yyy"}""", true, """{aaa="73",foo="yyy"}"""),
    ("""
- action: hashmod
  source_labels: [foo]
  target_label: aaa
  modulus: 123
""",
      """{foo="yyy"}""", true, """{aaa="73",foo="yyy"}"""),
    ("""
- action: labelmap
  if: '{foo="yyy",foobar="aab"}'
  regex: "foo"
  replacement: "bar"
""",
      """{foo="yyy",foobar="aaa"}""", true, """{foo="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap
  if: '{foo="yyy",foobar="aaa"}'
  regex: "foo"
  replacement: "bar"
""",
      """{foo="yyy",foobar="aaa"}""", true, """{bar="yyy",foo="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap
  regex: "foo"
  replacement: "bar"
""",
      """{foo="yyy",foobar="aaa"}""", true, """{bar="yyy",foo="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap
  regex: "foo(.*)"
""",
      """{xoo="yyy",foobar="aaa"}""", true, """{bar="aaa",foobar="aaa",xoo="yyy"}"""),
    ("""
- action: labelmap
  regex: "foo(.+)"
""",
      """{foo="yyy",foobar="aaa"}""", true, """{bar="aaa",foo="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap
  regex: "foo(.+)"
  replacement: "$1-x"
""",
      """{foo="yyy",foobar="aaa"}""", true, """{bar-x="aaa",foo="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap_all
  if: foobar
  regex: "\\."
  replacement: "-"
""",
      """{foo.bar.baz="yyy",foobar="aaa"}""", true, """{foo.bar.baz="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap_all
  if: '{foo.bar.baz="yyy"}'
  regex: "\\."
  replacement: "-"
""",
      """{foo.bar.baz="yyy",foobar="aaa"}""", true, """{foo-bar-baz="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap_all
  regex: "\\."
  replacement: "-"
""",
      """{foo.bar.baz="yyy",foobar="aaa"}""", true, """{foo-bar-baz="yyy",foobar="aaa"}"""),
    ("""
- action: labelmap_all
  regex: "ba(.)"
  replacement: "${1}ss"
""",
      """{foo.bar.baz="yyy",foozar="aaa"}""", true, """{foo.rss.zss="yyy",foozar="aaa"}"""),
    ("""
- action: labeldrop
  regex: dropme
""",
      """{aaa="bbb"}""", true, """{aaa="bbb"}"""),
    ("""
- action: labeldrop
  if: foo
  regex: dropme
""",
      """{xxx="yyy",dropme="aaa",foo="bar"}""", false, """{dropme="aaa",foo="bar",xxx="yyy"}"""),
    ("""
- action: labeldrop
  if: '{xxx="yyy"}'
  regex: dropme
""",
      """{xxx="yyy",dropme="aaa",foo="bar"}""", false, """{foo="bar",xxx="yyy"}"""),
    ("""
- action: labeldrop
  regex: dropme
""",
      """{xxx="yyy",dropme="aaa",foo="bar"}""", false, """{foo="bar",xxx="yyy"}"""),
    ("""
- action: labeldrop
  regex: 'dropme'
""",
      """{xxx="yyy",dropme="aaa"}""", false, """{xxx="yyy"}"""),
    ("""
- action: labeldrop
  regex: "dropme"
""",
      """{xxx="yyy",dropme="aaa"}""", false, """{xxx="yyy"}"""),
    ("""
- action: labeldrop
  regex: "dropme.*"
""",
      """{aaa="bbb"}""", true, """{aaa="bbb"}"""),
    ("""
- action: labeldrop
  regex: "dropme(.+)"
""",
      """{xxx="yyy",dropme-please="aaa",foo="bar"}""", false, """{foo="bar",xxx="yyy"}"""),
    ("""
- action: labeldrop
  regex: ".*dropme.*"
""",
      """{aaa="bbb"}""", true, """{aaa="bbb"}"""),
    ("""
- action: labeldrop
  regex: ".*dropme.*"
""",
      """{xxx="yyy",dropme-please="aaa",foo="bar"}""", false, """{foo="bar",xxx="yyy"}"""),
    ("""
- action: labelkeep
  regex: "keepme"
""",
      """{keepme="aaa"}""", true, """{keepme="aaa"}"""),
    ("""
- action: labelkeep
  if: '{aaaa="awefx"}'
  regex: keepme
""",
      """{keepme="aaa",aaaa="awef",keepme-aaa="234"}""", false, """{aaaa="awef",keepme="aaa",keepme-aaa="234"}"""),
    ("""
- action: labelkeep
  if: '{aaaa="awef"}'
  regex: keepme
""",
      """{keepme="aaa",aaaa="awef",keepme-aaa="234"}""", false, """{keepme="aaa"}"""),
    ("""
- action: labelkeep
  regex: keepme
""",
      """{keepme="aaa",aaaa="awef",keepme-aaa="234"}""", false, """{keepme="aaa"}"""),
    ("""
- action: labelkeep
  regex: "keepme.*"
""",
      """{keepme="aaa"}""", true, """{keepme="aaa"}"""),
    ("""
- action: labelkeep
  regex: "keepme.*"
""",
      """{keepme="aaa",aaaa="awef",keepme-aaa="234"}""", false, """{keepme="aaa",keepme-aaa="234"}"""),
    ("""
- action: uppercase
  source_labels: ["foo"]
  target_label: foo
""",
      """{foo="bar"}""", true, """{foo="BAR"}"""),
    ("""
- action: lowercase
  source_labels: ["foo", "bar"]
  target_label: baz
- action: labeldrop
  regex: foo|bar
""",
      """{foo="BaR",bar="fOO"}""", true, """{baz="bar;foo"}"""),
    ("""
- action: lowercase
  source_labels: ["foo"]
  target_label: baz
- action: uppercase
  source_labels: ["bar"]
  target_label: baz
""",
      """{qux="quux"}""", true, """{qux="quux"}"""),
    ("""
- action: graphite
  match: foo.*.baz
  labels:
    __name__: aaa
    job: ${1}-zz
""",
      """foo.bar.baz""", true, """aaa{job="bar-zz"}"""),
    ("""
- action: graphite
  match: foo.*.baz
  labels:
    __name__: aaa
    job: ${1}-zz
""",
      """foo.bar.bazz""", true, """foo.bar.bazz"""),
    ("""
- target_label: abc
  replacement: "{{__name__}}.{{foo}}"
""",
      """qwe{foo="bar",baz="aaa"}""", true, """qwe{abc="qwe.bar",baz="aaa",foo="bar"}"""),
    ("""
- target_label: abc
  replacement: "{{__name__}}.{{foo}}.$1"
  source_labels: [baz]
  regex: "a(.+)"
""",
      """qwe{foo="bar",baz="aaa"}""", true, """qwe{abc="qwe.bar.aa",baz="aaa",foo="bar"}"""),
    ("""
- target_label: xyz
  regex: "foo\\$$"
  replacement: bar
  source_labels: [xyz]
""",
      """metric{xyz="foo$",a="b"}""", true, """metric{a="b",xyz="bar"}"""))

  test("TestParsedRelabelConfigsApply vectors") {
    val failures = vectors.zipWithIndex.flatMap { case ((c, m, f, e), i) =>
      try { check(c, m, f, e); None }
      catch { case ex: Throwable => Some(s"#$i: ${ex.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, s"${failures.size} vectors failed:\n${failures.take(15).mkString("\n")}")
  }
}
