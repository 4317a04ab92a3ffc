package graft.lang

import graft.SparkSpec
import graft.tools.GoldenTriage

/** Golden-corpus gate: the ported exec_test.go subtests
  * (tools/GoldenTriage.entries — app/vmselect/promql/exec_test.go
  * TestExecSuccess, expected vectors verbatim) must all pass, minus a
  * pinned exclusion list of known gaps. Run
  * `runMain graft.tools.GoldenTriage` to see per-subtest PASS/FAIL when
  * curating the exclusions; shrink the list as gaps close — tests may
  * move OUT of it, never silently in (the floor assertion below).
  */
class GoldenCorpusSpec extends SparkSpec {

  /** subtests that do not pass yet — each represents reference surface
    * still to build (fill/fill_left/fill_right binop modifiers, scalar
    * args from per-point series in the clamp family, keep_metric_names
    * fine points, buckets_limit edge trimming, …)
    */
  private val knownGaps: Set[String] = Set(
    "absent(NaN)",
    "absent_over_time(nan[200s:10s])",
    "absent(scalar(multi-timeseries))",
    "clamp_min(time(), -time()+3000)",
    "clamp_min(1500, time())",
    "no drop_empty_series()",
    "drop_common_labels(multi_args)",
    "label_join(label_join)",
    "label_replace(match)",
    "label_replace(label_replace)",
    "label_graphite_group()",
    "limit_offset NaN",
    "sum(label_graphite_group)",
    "scalar(multi-timeseries)",
    "histogram_quantile(scalar-phi)",
    "histogram_share(scalar-phi)",
    "histogram_fraction(scalar-phi)",
    "histogram_quantile(nan-bucket-count-some)",
    "buckets_limit(trim_zero_preserve_empty_when_limit_not_reached)",
    "buckets_limit(trim_zero)",
    "buckets_limit(unused)",
    "buckets_limit(used)",
    "sum(multi-args)",
    "sum(union-scalars)",
    "share()",
    "sum(multi-vector) by (known-tag) limit 1",
    "sum(multi-vector) by (__name__)",
    "limitk(-1)",
    "any()",
    "topk_max(1, remaining_sum)",
    "topk_max(2, remaining_sum)",
    "topk_max(3, remaining_sum)",
    "interpolate(tail)",
    "interpolate(head)",
    "interpolate(tail_head_and_middle)",
    "quantile(-2)",
    "quantile(3)",
    "quantile(NaN)",
    "mad()",
    "range_trim_spikes()",
    "range_trim_spikes(time() > 1200 <= 1800)",
    "range_quantile(0.5, time() > 1200 < 2000)",
    "range_stddev(time() > 1200 < 1800)",
    "range_stdvar(time() > 1200 < 1800)",
    "ttf(2000-time())",
    "ttf(1000-time())",
    "ttf(1500-time())",
    "integrate(1)",
    "integrate(time())",
    "rate(2000-time())",
    "increase_prometheus(time())",
    "running_min(abs(1500-time()) < 400 > 100)",
    "running_max(abs(1300-time()) > 300 < 700)",
    "running_sum(time() > 1.2 < 1.8)",
    "running_avg(time() > 1200 < 1800)",
    "remove_resets(sum)",
    "range_min(time() > 1200 < 1800)",
    "range_normalize(time(),alias(-time(),\"negative\"))",
    "range_normalize(time() > 1200 < 1800,alias(-(time() > 1400 < 2000),\"negative\"))",
    "range_first(time() > 1200 < 1800)",
    "range_mad(time() > 1200 < 1800)",
    "range_max(time() > 1200 < 1800)",
    "range_sum(time() > 1200 < 1800)",
    "range_last(time() > 1200 < 1800)",
    "range_linear_regression(time() > 1200 < 1800)",
    "range_linear_regression(100/time())",
    "deriv(N)",
    "deriv(time())",
    "deriv(-time())",
    "delta_prometheus(time())",
    "median_over_time(\"foo\")",
    "rollup_increase()",
    "rollup_rate()",
    "rollup_rate(q, \"max\")",
    "rollup_rate(q, \"avg\")",
    "rollup_deriv(q, \"max\")",
    "()",
    "union()",
    "count_values_big_numbers",
    "count_values",
    "count_values by (xxx)",
    "count_values without (baz)",
    "sort_by_label_numeric(multiple_labels_only_string)",
    "sort_by_label_numeric(multiple_labels_numbers_special_chars)",
    "sort_by_label_numeric_desc(multiple_labels_numbers_special_chars)",
    "limit_offset(5, 0, sort_by_label_numeric_desc(multiple_labels_numbers_special_chars, \"foo\"))",
    "sort_by_label_numeric(alias_numbers_with_special_chars)")

  test("ported exec_test.go corpus passes (minus pinned known gaps)") {
    val active = GoldenTriage.entries.filterNot(e => knownGaps(e.nm))
    assert(active.size >= 465, s"golden corpus shrank to ${active.size}")
    val failures = active.flatMap(e => GoldenTriage.check(spark, e).map(m => s"${e.nm}: $m"))
    assert(failures.isEmpty,
      s"${failures.size} golden subtests failed:\n${failures.take(10).mkString("\n")}")
  }

  test("known-gap list only contains real entries") {
    val names = GoldenTriage.entries.map(_.nm).toSet
    val stale = knownGaps.filterNot(names)
    assert(stale.isEmpty, s"stale exclusions: $stale")
  }
}
