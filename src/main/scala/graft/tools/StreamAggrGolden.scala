package graft.tools

/** Ported golden corpus: lib/streamaggr/streamaggr_synctest_test.go
  * TestAggregatorsSuccess (49 vectors) and streamaggr_test.go
  * TestAggregatorsFailure (the config-rejection list). Each success
  * vector pushes `inputs(i)` at wall offset i x pushIntervalMs and
  * compares the concatenation of every flush, rendered exactly like the
  * reference's timeSeriessToString (LabelsToString + Go %v values,
  * stably sorted by label string), plus the per-input-row match
  * indexes. The batch replay maps the reference's wall-clock flush to
  * event time: batch i's samples get ts = T0 + i x pushInterval
  * (+ the sample's own explicit timestamp, exactly like
  * MustParsePromMetrics adds offsetMsecs), so "flush per interval tick"
  * becomes "one output row per event-time interval bucket".
  *
  * Vectors whose `skip` is non-empty are inapplicable by design in the
  * batch mapping; the reason is recorded and asserted non-silently.
  */
object StreamAggrGolden {

  final case class V(
      id: String,
      inputs: Seq[String],
      pushIntervalMs: Long,
      expected: String,
      config: String,
      matchIdxs: String,
      skip: String = "")

  private val M = 60000L
  private val S30 = 30000L

  // the 4-line input block shared by many vectors
  private val IN4 = """
foo{abc="123"} 4
bar 5
foo{abc="123"} 8.5
foo{abc="456",de="fg"} 8
"""

  val vectors: Seq[V] = Seq(
    V("empty_config_no_input", Seq.empty, 1000L, "", "", ""),
    V("empty_config_one_metric", Seq("foo{bar=\"baz\"} 1"), 1000L, "", "", "0"),
    V("empty_config_two_metrics", Seq("foo 1\nbaz 2"), 1000L, "", "", "00"),

    V("empty_by_aggregate_by_time",
      Seq("""
foo{abc="123"} 4
bar 5 11
bar 34 10
foo{abc="123"} 8.5
foo{abc="456",de="fg"} 8
"""), M,
      """bar:1m_count_samples 2
bar:1m_count_series 1
bar:1m_last 5
bar:1m_sum_samples 39
foo:1m_count_samples{abc="123"} 2
foo:1m_count_samples{abc="456",de="fg"} 1
foo:1m_count_series{abc="123"} 1
foo:1m_count_series{abc="456",de="fg"} 1
foo:1m_last{abc="123"} 8.5
foo:1m_last{abc="456",de="fg"} 8
foo:1m_sum_samples{abc="123"} 12.5
foo:1m_sum_samples{abc="456",de="fg"} 8
""",
      """
- interval: 1m
  outputs: [count_samples, sum_samples, count_series, last]
""", "11111"),

    V("by_name_same_as_empty_by",
      Seq(IN4), M,
      """bar:1m_count_samples 1
bar:1m_count_series 1
bar:1m_sum_samples 5
foo:1m_count_samples 3
foo:1m_count_series 2
foo:1m_sum_samples 20.5
""",
      """
- interval: 1m
  by: [__name__]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("by_nonexisting_labels",
      Seq(IN4), M,
      """bar:1m_by_bar_foo_count_samples 1
bar:1m_by_bar_foo_count_series 1
bar:1m_by_bar_foo_sum_samples 5
foo:1m_by_bar_foo_count_samples 3
foo:1m_by_bar_foo_count_series 2
foo:1m_by_bar_foo_sum_samples 20.5
""",
      """
- interval: 1m
  by: [foo, bar]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("by_existing_label",
      Seq(IN4), M,
      """bar:1m_by_abc_count_samples 1
bar:1m_by_abc_count_series 1
bar:1m_by_abc_sum_samples 5
foo:1m_by_abc_count_samples{abc="123"} 2
foo:1m_by_abc_count_samples{abc="456"} 1
foo:1m_by_abc_count_series{abc="123"} 1
foo:1m_by_abc_count_series{abc="456"} 1
foo:1m_by_abc_sum_samples{abc="123"} 12.5
foo:1m_by_abc_sum_samples{abc="456"} 8
""",
      """
- interval: 1m
  by: [abc]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("by_duplicate_existing_label",
      Seq(IN4), M,
      """bar:1m_by_abc_count_samples 1
bar:1m_by_abc_count_series 1
bar:1m_by_abc_sum_samples 5
foo:1m_by_abc_count_samples{abc="123"} 2
foo:1m_by_abc_count_samples{abc="456"} 1
foo:1m_by_abc_count_series{abc="123"} 1
foo:1m_by_abc_count_series{abc="456"} 1
foo:1m_by_abc_sum_samples{abc="123"} 12.5
foo:1m_by_abc_sum_samples{abc="456"} 8
""",
      """
- interval: 1m
  by: [abc, abc]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("without_nonexisting_labels",
      Seq(IN4), M,
      """bar:1m_without_foo_count_samples 1
bar:1m_without_foo_count_series 1
bar:1m_without_foo_sum_samples 5
foo:1m_without_foo_count_samples{abc="123"} 2
foo:1m_without_foo_count_samples{abc="456",de="fg"} 1
foo:1m_without_foo_count_series{abc="123"} 1
foo:1m_without_foo_count_series{abc="456",de="fg"} 1
foo:1m_without_foo_sum_samples{abc="123"} 12.5
foo:1m_without_foo_sum_samples{abc="456",de="fg"} 8
""",
      """
- interval: 1m
  without: [foo]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("without_existing_labels",
      Seq(IN4), M,
      """bar:1m_without_abc_count_samples 1
bar:1m_without_abc_count_series 1
bar:1m_without_abc_sum_samples 5
foo:1m_without_abc_count_samples 2
foo:1m_without_abc_count_samples{de="fg"} 1
foo:1m_without_abc_count_series 1
foo:1m_without_abc_count_series{de="fg"} 1
foo:1m_without_abc_sum_samples 12.5
foo:1m_without_abc_sum_samples{de="fg"} 8
""",
      """
- interval: 1m
  without: [abc]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("without_name",
      Seq(IN4), M,
      """:1m_count_samples 1
:1m_count_samples{abc="123"} 2
:1m_count_samples{abc="456",de="fg"} 1
:1m_count_series 1
:1m_count_series{abc="123"} 1
:1m_count_series{abc="456",de="fg"} 1
:1m_sum_samples 5
:1m_sum_samples{abc="123"} 12.5
:1m_sum_samples{abc="456",de="fg"} 8
""",
      """
- interval: 1m
  without: [__name__]
  outputs: [count_samples, sum_samples, count_series]
""", "1111"),

    V("drop_input_metrics",
      Seq(IN4), M,
      """bar:1m_without_abc_count_samples 1
bar:1m_without_abc_count_series 1
bar:1m_without_abc_sum_samples 5
""",
      """
- interval: 1m
  without: [abc]
  outputs: [count_samples, sum_samples, count_series]
  input_relabel_configs:
  - if: 'foo'
    action: drop
""", "1111"),

    V("rename_output_metrics",
      Seq(IN4), M,
      """bar-1m-without-abc-count-samples 1
bar-1m-without-abc-count-series 1
bar-1m-without-abc-sum-samples 5
foo-1m-without-abc-count-samples 2
foo-1m-without-abc-count-series 1
foo-1m-without-abc-sum-samples 12.5
""",
      """
- interval: 1m
  without: [abc]
  outputs: [count_samples, sum_samples, count_series]
  output_relabel_configs:
  - action: replace_all
    source_labels: [__name__]
    regex: ":|_"
    replacement: "-"
    target_label: __name__
  - action: drop
    source_labels: [de]
    regex: fg
""", "1111"),

    V("match_nothing",
      Seq(IN4), M, "",
      """
- interval: 1m
  without: [abc]
  outputs: [count_samples, sum_samples, count_series]
  match: '{non_existing_label!=""}'
  name: foobar
""", "0000"),

    V("match_foo_nonempty_abc",
      Seq(IN4), M,
      """foo:1m_by_abc_count_samples{abc="123"} 2
foo:1m_by_abc_count_samples{abc="456"} 1
foo:1m_by_abc_count_series{abc="123"} 1
foo:1m_by_abc_count_series{abc="456"} 1
foo:1m_by_abc_sum_samples{abc="123"} 12.5
foo:1m_by_abc_sum_samples{abc="456"} 8
""",
      """
- interval: 1m
  by: [abc]
  outputs: [count_samples, sum_samples, count_series]
  name: abcdef
  match:
  - foo{abc=~".+"}
  - '{non_existing_label!=""}'
""", "1011"),

    V("total_nonrepeated",
      Seq("""
foo 123
bar{baz="qwe"} 4.34
"""), M,
      """bar:1m_total{baz="qwe"} 0
foo:1m_total 0
""",
      """
- interval: 1m
  outputs: [total]
""", "11"),

    V("total_nonrepeated_ignore_first_0s",
      Seq("""
foo 123
bar{baz="qwe"} 4.34
"""), M,
      """bar:1m_total{baz="qwe"} 4.34
foo:1m_total 123
""",
      """
- interval: 1m
  outputs: [total]
  ignore_first_sample_interval: 0s
""", "11"),

    V("total_prometheus_nonrepeated",
      Seq("""
foo 123
bar{baz="qwe"} 4.34
"""), M,
      """bar:1m_total_prometheus{baz="qwe"} 0
foo:1m_total_prometheus 0
""",
      """
- interval: 1m
  outputs: [total_prometheus]
""", "11"),

    V("total_repeated",
      Seq("""
foo 123
bar{baz="qwe"} 1.31
bar{baz="qwe"} 4.34 1
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
"""), M,
      """bar:1m_total{baz="qwe"} 3.03
bar:1m_total{baz="qwer"} 1
foo:1m_total 0
foo:1m_total{baz="qwe"} 15
""",
      """
- interval: 1m
  outputs: [total]
""", "11111111"),

    V("total_prometheus_repeated",
      Seq("""
foo 123
bar{baz="qwe"} 1.32
bar{baz="qwe"} 4.34
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
"""), M,
      """bar:1m_total_prometheus{baz="qwe"} 5.02
bar:1m_total_prometheus{baz="qwer"} 1
foo:1m_total_prometheus 0
foo:1m_total_prometheus{baz="qwe"} 15
""",
      """
- interval: 1m
  outputs: [total_prometheus]
""", "11111111"),

    V("total_repeated_by_name",
      Seq("""
foo 123
bar{baz="qwe"} 1.32
bar{baz="qwe"} 4.34
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
"""), M,
      """bar:1m_total 6.02
foo:1m_total 15
""",
      """
- interval: 1m
  by: [__name__]
  outputs: [total]
""", "11111111"),

    V("total_prometheus_repeated_by_name",
      Seq("""
foo 123
bar{baz="qwe"} 1.32
bar{baz="qwe"} 4.34
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
"""), M,
      """bar:1m_total_prometheus 6.02
foo:1m_total_prometheus 15
""",
      """
- interval: 1m
  by: [__name__]
  outputs: [total_prometheus]
""", "11111111"),

    V("increase_nonrepeated",
      Seq("""
foo 123
bar{baz="qwe"} 4.34
"""), M,
      """bar:1m_increase{baz="qwe"} 0
foo:1m_increase 0
""",
      """
- interval: 1m
  outputs: [increase]
""", "11"),

    V("increase_prometheus_nonrepeated",
      Seq("""
foo 123
bar{baz="qwe"} 4.34
"""), M,
      """bar:1m_increase_prometheus{baz="qwe"} 0
foo:1m_increase_prometheus 0
""",
      """
- interval: 1m
  outputs: [increase_prometheus]
""", "11"),

    V("increase_repeated",
      Seq("""
foo 123
bar{baz="qwe"} 1.32
bar{baz="qwe"} 4.34
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
"""), M,
      """bar:1m_increase{baz="qwe"} 5.02
bar:1m_increase{baz="qwer"} 1
foo:1m_increase 0
foo:1m_increase{baz="qwe"} 15
""",
      """
- interval: 1m
  outputs: [increase]
""", "11111111"),

    V("increase_prometheus_repeated",
      Seq("""
foo 123
bar{baz="qwe"} 1.32
bar{baz="qwe"} 4.34
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
"""), M,
      """bar:1m_increase_prometheus{baz="qwe"} 5.02
bar:1m_increase_prometheus{baz="qwer"} 1
foo:1m_increase_prometheus 0
foo:1m_increase_prometheus{baz="qwe"} 15
""",
      """
- interval: 1m
  outputs: [increase_prometheus]
""", "11111111"),

    V("counters_staleness_intervals",
      Seq("""
foo 5
bar 200
""", """
foo 10
bar 201
""", "", """
foo 7
bar 205
"""), M,
      """bar:1m_increase 200
bar:1m_increase 1
bar:1m_increase 205
bar:1m_increase_prometheus 0
bar:1m_increase_prometheus 1
bar:1m_increase_prometheus 0
bar:1m_total 200
bar:1m_total 201
bar:1m_total 205
bar:1m_total_prometheus 0
bar:1m_total_prometheus 1
bar:1m_total_prometheus 0
bar:1m_without_non_existing_label_increase 0
bar:1m_without_non_existing_label_increase 1
bar:1m_without_non_existing_label_increase 4
bar:1m_without_non_existing_label_increase_prometheus 0
bar:1m_without_non_existing_label_increase_prometheus 1
bar:1m_without_non_existing_label_increase_prometheus 4
bar:1m_without_non_existing_label_total 0
bar:1m_without_non_existing_label_total 1
bar:1m_without_non_existing_label_total 1
bar:1m_without_non_existing_label_total 5
bar:1m_without_non_existing_label_total_prometheus 0
bar:1m_without_non_existing_label_total_prometheus 1
bar:1m_without_non_existing_label_total_prometheus 1
bar:1m_without_non_existing_label_total_prometheus 5
foo:1m_increase 5
foo:1m_increase 5
foo:1m_increase 7
foo:1m_increase_prometheus 0
foo:1m_increase_prometheus 5
foo:1m_increase_prometheus 0
foo:1m_total 5
foo:1m_total 10
foo:1m_total 7
foo:1m_total_prometheus 0
foo:1m_total_prometheus 5
foo:1m_total_prometheus 0
foo:1m_without_non_existing_label_increase 0
foo:1m_without_non_existing_label_increase 5
foo:1m_without_non_existing_label_increase 7
foo:1m_without_non_existing_label_increase_prometheus 0
foo:1m_without_non_existing_label_increase_prometheus 5
foo:1m_without_non_existing_label_increase_prometheus 7
foo:1m_without_non_existing_label_total 0
foo:1m_without_non_existing_label_total 5
foo:1m_without_non_existing_label_total 5
foo:1m_without_non_existing_label_total 12
foo:1m_without_non_existing_label_total_prometheus 0
foo:1m_without_non_existing_label_total_prometheus 5
foo:1m_without_non_existing_label_total_prometheus 5
foo:1m_without_non_existing_label_total_prometheus 12
""",
      """
- interval: 1m
  ignore_first_sample_interval: 0s
  outputs: [increase, increase_prometheus, total, total_prometheus]
- interval: 1m
  staleness_interval: 2m
  without: [non_existing_label]
  outputs: [increase, increase_prometheus, total, total_prometheus]
""", "111111"),

    V("sum_samples_staleness_intervals",
      Seq("""
foo 1
foo 2 1
foo{bar="baz"} 2
""", """
foo 4
""", "", "", """
foo 6
""", "", ""), M,
      """foo:1m_sum_samples 3
foo:1m_sum_samples 4
foo:1m_sum_samples 6
foo:1m_sum_samples_total 3
foo:1m_sum_samples_total 7
foo:1m_sum_samples_total 6
foo:1m_sum_samples_total{bar="baz"} 2
foo:1m_sum_samples{bar="baz"} 2
foo:1m_without_non-existing-label_sum_samples 3
foo:1m_without_non-existing-label_sum_samples 4
foo:1m_without_non-existing-label_sum_samples 0
foo:1m_without_non-existing-label_sum_samples 6
foo:1m_without_non-existing-label_sum_samples 0
foo:1m_without_non-existing-label_sum_samples_total 3
foo:1m_without_non-existing-label_sum_samples_total 7
foo:1m_without_non-existing-label_sum_samples_total 7
foo:1m_without_non-existing-label_sum_samples_total 6
foo:1m_without_non-existing-label_sum_samples_total 6
foo:1m_without_non-existing-label_sum_samples_total{bar="baz"} 2
foo:1m_without_non-existing-label_sum_samples_total{bar="baz"} 2
foo:1m_without_non-existing-label_sum_samples{bar="baz"} 2
foo:1m_without_non-existing-label_sum_samples{bar="baz"} 0
foo:5m_by_bar_sum_samples 13
foo:5m_by_bar_sum_samples_total 13
foo:5m_by_bar_sum_samples_total{bar="baz"} 2
foo:5m_by_bar_sum_samples{bar="baz"} 2
""",
      """
- interval: 1m
  staleness_interval: 1m
  outputs: [ sum_samples, sum_samples_total]
- interval: 1m
  staleness_interval: 2m
  without: [non-existing-label]
  outputs: [ sum_samples, sum_samples_total]
- interval: 5m
  by: [bar]
  outputs: [sum_samples, sum_samples_total]
""", "11111"),

    V("min_max",
      Seq(IN4), M,
      """bar:1m_max 5
bar:1m_min 5
foo:1m_max{abc="123"} 8.5
foo:1m_max{abc="456",de="fg"} 8
foo:1m_min{abc="123"} 4
foo:1m_min{abc="456",de="fg"} 8
""",
      """
- interval: 1m
  outputs: [min, max]
""", "1111"),

    V("avg",
      Seq(IN4), M,
      """bar:1m_avg 5
foo:1m_avg{abc="123"} 6.25
foo:1m_avg{abc="456",de="fg"} 8
""",
      """
- interval: 1m
  outputs: [avg]
""", "1111"),

    V("stddev",
      Seq(IN4), M,
      """bar:1m_stddev 0
foo:1m_stddev{abc="123"} 2.25
foo:1m_stddev{abc="456",de="fg"} 0
""",
      """
- interval: 1m
  outputs: [stddev]
""", "1111"),

    V("stdvar",
      Seq(IN4), M,
      """bar:1m_stdvar 0
foo:1m_stdvar{abc="123"} 5.0625
foo:1m_stdvar{abc="456",de="fg"} 0
""",
      """
- interval: 1m
  outputs: [stdvar]
""", "1111"),

    V("histogram_bucket",
      Seq("""
cpu_usage{cpu="1"} 12.5
cpu_usage{cpu="1"} 13.3
cpu_usage{cpu="1"} 13
cpu_usage{cpu="1"} 12
cpu_usage{cpu="1"} 14
cpu_usage{cpu="1"} 25
cpu_usage{cpu="2"} 90
"""), M,
      """cpu_usage:1m_histogram_bucket{cpu="1",vmrange="1.136e+01...1.292e+01"} 2
cpu_usage:1m_histogram_bucket{cpu="1",vmrange="1.292e+01...1.468e+01"} 3
cpu_usage:1m_histogram_bucket{cpu="1",vmrange="2.448e+01...2.783e+01"} 1
cpu_usage:1m_histogram_bucket{cpu="2",vmrange="8.799e+01...1.000e+02"} 1
""",
      """
- interval: 1m
  outputs: [histogram_bucket]
""", "1111111"),

    V("histogram_bucket_without_cpu",
      Seq("""
cpu_usage{cpu="1"} 12.5
cpu_usage{cpu="1"} 13.3
cpu_usage{cpu="1"} 13
cpu_usage{cpu="1"} 12
cpu_usage{cpu="1"} 14
cpu_usage{cpu="1"} 25
cpu_usage{cpu="2"} 90
"""), M,
      """cpu_usage:1m_without_cpu_histogram_bucket{vmrange="1.136e+01...1.292e+01"} 2
cpu_usage:1m_without_cpu_histogram_bucket{vmrange="1.292e+01...1.468e+01"} 3
cpu_usage:1m_without_cpu_histogram_bucket{vmrange="2.448e+01...2.783e+01"} 1
cpu_usage:1m_without_cpu_histogram_bucket{vmrange="8.799e+01...1.000e+02"} 1
""",
      """
- interval: 1m
  without: [cpu]
  outputs: [histogram_bucket]
""", "1111111"),

    V("quantiles",
      Seq("""
cpu_usage{cpu="1"} 12.5
cpu_usage{cpu="1"} 13.3
cpu_usage{cpu="1"} 13
cpu_usage{cpu="1"} 12
cpu_usage{cpu="1"} 14
cpu_usage{cpu="1"} 25
cpu_usage{cpu="2"} 90
"""), M,
      """cpu_usage:1m_quantiles{cpu="1",quantile="0"} 12
cpu_usage:1m_quantiles{cpu="1",quantile="0.5"} 13.3
cpu_usage:1m_quantiles{cpu="1",quantile="1"} 25
cpu_usage:1m_quantiles{cpu="2",quantile="0"} 90
cpu_usage:1m_quantiles{cpu="2",quantile="0.5"} 90
cpu_usage:1m_quantiles{cpu="2",quantile="1"} 90
""",
      """
- interval: 1m
  outputs: ["quantiles(0, 0.5, 1)"]
""", "1111111"),

    V("quantiles_without_cpu",
      Seq("""
cpu_usage{cpu="1"} 12.5
cpu_usage{cpu="1"} 13.3
cpu_usage{cpu="1"} 13
cpu_usage{cpu="1"} 12
cpu_usage{cpu="1"} 14
cpu_usage{cpu="1"} 25
cpu_usage{cpu="2"} 90
"""), M,
      """cpu_usage:1m_without_cpu_quantiles{quantile="0"} 12
cpu_usage:1m_without_cpu_quantiles{quantile="0.5"} 13.3
cpu_usage:1m_without_cpu_quantiles{quantile="1"} 90
""",
      """
- interval: 1m
  without: [cpu]
  outputs: ["quantiles(0, 0.5, 1)"]
""", "1111111"),

    V("no_stale_quantiles",
      Seq("""
cpu_usage{cpu="1"} 3
cpu_usage{cpu="2"} 3""",
        "cpu_usage{cpu=\"2\"} 4"), M,
      """cpu_usage:1m_quantiles{cpu="1",quantile="1"} 3
cpu_usage:1m_quantiles{cpu="2",quantile="1"} 3
cpu_usage:1m_quantiles{cpu="2",quantile="1"} 4
""",
      """
- interval: 1m
  outputs: ["quantiles(1)"]
""", "111"),

    V("append_additional_label",
      Seq("""
foo{abc="123"} 4
bar 5
foo{abc="123"} 8.5 10
foo{abc="456",de="fg"} 8
"""), M,
      """bar-1m-without-abc-count-samples{new_label="must_keep_metric_name"} 1
bar-1m-without-abc-count-series{new_label="must_keep_metric_name"} 1
bar-1m-without-abc-sum-samples{new_label="must_keep_metric_name"} 5
foo-1m-without-abc-count-samples{new_label="must_keep_metric_name"} 2
foo-1m-without-abc-count-series{new_label="must_keep_metric_name"} 1
foo-1m-without-abc-sum-samples{new_label="must_keep_metric_name"} 12.5
""",
      """
- interval: 1m
  without: [abc]
  outputs: [count_samples, sum_samples, count_series]
  output_relabel_configs:
  - action: replace_all
    source_labels: [__name__]
    regex: ":|_"
    replacement: "-"
    target_label: __name__
  - action: drop
    source_labels: [de]
    regex: fg
  - target_label: new_label
    replacement: must_keep_metric_name
""", "1111"),

    V("rate_sum_rate_avg",
      Seq("""
foo{abc="123", cde="1"} 3
foo{abc="456", cde="1"} 8.5
foo 12 34
""", """
foo{abc="123", cde="1"} 8
foo{abc="456", cde="1"} 11
"""), M,
      """foo:1m_by_cde_rate_avg{cde="1"} 0.0625
foo:1m_by_cde_rate_sum{cde="1"} 0.125
""",
      """
- interval: 1m
  by: [cde]
  outputs: [rate_sum, rate_avg]
""", "11111"),

    V("rate_sum_out_of_order",
      Seq("""
foo 1
""", """
foo 61
""", """
foo 31 -70
foo 91
""", """
foo 121
"""), M,
      """foo:1m_rate_sum 1
foo:1m_rate_sum 0.5
foo:1m_rate_sum 0.5
""",
      """
- interval: 1m
  outputs: [rate_sum]
""", "11111"),

    V("rate_staleness_intervals",
      Seq("""
foo{abc="123", cde="1"} 1
foo{abc="123", cde="1"} 2 1
foo{abc="456", cde="1"} 3
foo{abc="456", cde="1"} 4 1
foo{abc="777", cde="1"} 5
foo{abc="777", cde="1"} 6 1
""", "", """
foo{abc="123", cde="1"} 121
foo{abc="123", cde="1"} 122 1
foo{abc="456", cde="1"} 123
foo{abc="456", cde="1"} 124 1
foo{abc="777", cde="1"} 125
foo{abc="777", cde="1"} 126 1
"""), M,
      """foo:1m_by_cde_rate_avg{cde="1"} 1
foo:1m_by_cde_rate_avg{cde="1"} 1
foo:1m_by_cde_rate_sum{cde="1"} 3
foo:1m_by_cde_rate_sum{cde="1"} 3
foo:1m_without_abc_rate_avg{cde="1"} 1
foo:1m_without_abc_rate_avg{cde="1"} 1
foo:1m_without_abc_rate_sum{cde="1"} 3
foo:1m_without_abc_rate_sum{cde="1"} 3
""",
      """
- interval: 1m
  by: [cde]
  outputs: [rate_sum, rate_avg]
  enable_windows: true
- interval: 1m
  staleness_interval: 2m
  without: [abc]
  outputs: [rate_sum, rate_avg]
  enable_windows: true
""", "111111111111"),

    V("rate_duplicated_events",
      Seq("""
foo{abc="123", cde="1"} 4  10
foo{abc="123", cde="1"} 4  10
"""), M, "",
      """
- interval: 1m
  outputs: [rate_sum, rate_avg]
""", "11"),

    V("rate_single_sample",
      Seq("""
foo 4  10
bar 5  10
"""), M, "",
      """
- interval: 1m
  outputs: [rate_sum, rate_avg]
""", "11"),

    V("unique_samples",
      Seq("""
foo 1  10
foo 2  20
foo 1  10
foo 2  20
foo 3  20
"""), M,
      """foo:1m_unique_samples 3
""",
      """
- interval: 1m
  outputs: [unique_samples]
""", "11111"),

    V("keep_metric_names",
      Seq("""
foo{abc="123"} 4
bar 5
foo{abc="123"} 8.5
bar -34.3
foo{abc="456",de="fg"} 8
"""), M,
      """bar 2
foo{abc="123"} 2
foo{abc="456",de="fg"} 1
""",
      """
- interval: 1m
  keep_metric_names: true
  outputs: [count_samples]
""", "11111"),

    V("drop_input_labels",
      Seq("""
foo{abc="123"} 4
bar 5
foo{abc="123"} 8.5
bar -34.3
foo{abc="456",de="fg"} 8
"""), M,
      """bar 2
foo 2
foo{de="fg"} 1
""",
      """
- interval: 1m
  drop_input_labels: [abc]
  keep_metric_names: true
  outputs: [count_samples]
""", "11111"),

    V("dedup_interval_simple",
      Seq("""
foo 123
bar 567
""", "", ""), S30,
      """bar:1m_sum_samples 567
foo:1m_sum_samples 123
""",
      """
- interval: 1m
  outputs: [sum_samples]
  dedup_interval: 30s
""", "11"),

    V("dedup_interval_repeated",
      Seq("""
foo 123
bar{baz="qwe"} 1.32
bar{baz="qwe"} 4.34
bar{baz="qwe"} 2
foo{baz="qwe"} -5
bar{baz="qwer"} 343
bar{baz="qwer"} 344
foo{baz="qwe"} 10
""", "", ""), S30,
      """bar:1m_sum_samples{baz="qwe"} 4.34
bar:1m_sum_samples{baz="qwer"} 344
foo:1m_sum_samples 123
foo:1m_sum_samples{baz="qwe"} 10
""",
      """
- interval: 1m
  dedup_interval: 30s
  outputs: [sum_samples]
""", "11111111"),

    V("sum_samples_total_monotonic_windows",
      Seq("""
test_delta 1
""", """
test_delta 1
""", """
test_delta 1
""", """
test_delta 1
"""), M,
      """test_delta 1
test_delta 2
test_delta 3
test_delta 4
""",
      """
- interval: 1m
  keep_metric_names: true
  outputs: [sum_samples_total]
  enable_windows: true
""", "1111"))

  /** TestAggregatorsFailure configs (streamaggr_test.go:13-190): every
    * one must be rejected by parseConfigs/Config validation.
    */
  val failures: Seq[(String, String)] = Seq(
    "not_yaml" -> "foobar",
    "unknown_option" -> """
- interval: 1m
  outputs: [total]
  foobar: baz
""",
    "missing_interval" -> """
- outputs: [total]
""",
    "missing_outputs" -> """
- interval: 1m
""",
    "bad_interval" -> """
- interval: 1foo
  outputs: [total]
""",
    "invalid_output" -> """
- interval: 1m
  outputs: [foobar]
""",
    "negative_interval" -> """
- outputs: [total]
  interval: -5m
""",
    "too_small_interval" -> """
- outputs: [total]
  interval: 10ms
""",
    "bad_dedup_interval" -> """
- interval: 1m
  dedup_interval: 1foo
  outputs: ["quantiles"]
""",
    "interval_not_multiple_of_dedup" -> """
- interval: 1m
  dedup_interval: 35s
  outputs: ["quantiles"]
""",
    "dedup_bigger_than_interval" -> """
- interval: 1m
  dedup_interval: 1h
  outputs: ["quantiles"]
""",
    "bad_staleness_interval" -> """
- interval: 1m
  staleness_interval: 1foo
  outputs: ["quantiles"]
""",
    "staleness_smaller_than_interval" -> """
- interval: 1m
  staleness_interval: 30s
  outputs: ["quantiles"]
""",
    "keep_metric_names_multiple_outputs" -> """
- interval: 1m
  keep_metric_names: true
  outputs: ["total", "increase"]
""",
    "keep_metric_names_unsupported_output" -> """
- interval: 1m
  keep_metric_names: true
  outputs: ["histogram_bucket"]
""",
    "invalid_input_relabel_unknown_field" -> """
- interval: 1m
  outputs: [total]
  input_relabel_configs:
  - foo: bar
""",
    "invalid_input_relabel_missing_fields" -> """
- interval: 1m
  outputs: [total]
  input_relabel_configs:
  - action: replace
""",
    "invalid_output_relabel_unknown_field" -> """
- interval: 1m
  outputs: [total]
  output_relabel_configs:
  - foo: bar
""",
    "invalid_output_relabel_missing_fields" -> """
- interval: 1m
  outputs: [total]
  output_relabel_configs:
  - action: replace
""",
    "both_by_and_without" -> """
- interval: 1m
  outputs: [total]
  by: [foo]
  without: [bar]
""",
    "quantiles_open_paren" -> """
- interval: 1m
  outputs: ["quantiles("]
""",
    "quantiles_empty" -> """
- interval: 1m
  outputs: ["quantiles()"]
""",
    "quantiles_non_numeric" -> """
- interval: 1m
  outputs: ["quantiles(foo)"]
""",
    "quantiles_negative" -> """
- interval: 1m
  outputs: ["quantiles(-0.5)"]
""",
    "quantiles_above_one" -> """
- interval: 1m
  outputs: ["quantiles(1.5)"]
""",
    "duplicate_outputs" -> """
- interval: 1m
  outputs: [total, total]
""",
    "split_quantiles_outputs" -> """
- interval: 1m
  outputs: ["quantiles(0.5)", "quantiles(0.9)"]
""")
}
