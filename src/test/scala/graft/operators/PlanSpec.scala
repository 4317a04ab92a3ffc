package graft.operators

import graft.SparkSpec
import graft.core.{GridSpec, Samples}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the scale properties README claims are
  * checked against `.explain` output, not taken on faith — filter
  * pushdown to the Parquet scan, broadcast joins for dims, and the
  * no-range-join guarantee of the rollup bucketizer.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("selector filters are pushed down to the parquet scan") {
    val df = Samples.table(spark, sfDir, "events")
      .filter(col("event_type") === "click")
      .select("event_type", "value")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"expected pushed filters in:\n$p")
  }

  test("column pruning reaches the scan (2-column projection)") {
    val df = Samples.table(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected pruned ReadSchema in:\n$p")
  }

  test("rollup plan: map-side explode + hash aggregate, no nested-loop join") {
    val grid = GridSpec(1704067200000L, 1704153600000L, 3600000L)
    val df = Rollup.rollup(
      Samples.eventsFlat(spark, sfDir), Seq("name"), grid, 3600000L, Kernels.avg)
    val p = plan(df)
    assert(p.contains("HashAggregate"), s"expected HashAggregate in:\n$p")
    assert(p.contains("Generate explode"), s"expected map-side explode in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rollup must not plan a nested-loop/cartesian join:\n$p")
  }

  test("snowflake dim join broadcasts the small side") {
    val li = Samples.table(spark, sfDir, "lineitem")
    val sup = Samples.table(spark, sfDir, "supplier")
    val nat = Samples.table(spark, sfDir, "nation")
    val dims = sup.join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val q = li.join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name").agg(sum("l_quantity"))
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join must not sort-merge:\n$p")
  }

  test("rollup aggregation is partial+final (map-side combine)") {
    val grid = GridSpec(1704067200000L, 1704153600000L, 3600000L)
    val df = Rollup.rollup(
      Samples.eventsFlat(spark, sfDir), Seq("name"), grid, 3600000L, Kernels.sum)
    val p = plan(df)
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate pair in:\n$p")
  }
}
