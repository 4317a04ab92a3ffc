package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the round-9 select-time dedup rework (VERDICT r8
  * "What's wrong #1"): the r8 shape aggregated `max(struct(ts, value))`
  * (struct buffer → SortAggregate) over a derived `_sk` string and then
  * restored name/tags with a SECOND full scan + data-scale string join;
  * the r9 shape (`Dedup.dedupNamedSamples`) is one scan and two
  * codegen'd HashAggregates with name/tags riding the grouping keys.
  *
  * Generates a DEDUP-SHAPED store (every sample written twice — the HA
  * scraper-pair case the knob exists for) at target/dedupprof/ and times
  * both shapes, interleaved, min-of-N.
  *
  *   DEDUPPROF_ROWS=10000000 sbt "runMain graft.tools.DedupProf"
  */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("DEDUPPROF_ROWS", "10000000").toLong
    val passes = sys.env.getOrElse("DEDUPPROF_PASSES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = "target/dedupprof/store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/dedupprof"))
    val t0ms = 1704067200000L
    val base = spark.range(rows / 2)
      .select(
        concat(lit("m"), pmod(col("id"), lit(5)).cast("string")).as("name"),
        map(lit("user_id"), pmod(xxhash64(col("id")), lit(20000)).cast("string")).as("tags"),
        (lit(t0ms) + pmod(xxhash64(col("id"), lit(2)), lit(30L * 86400000L))).as("ts"),
        (pmod(xxhash64(col("id"), lit(1)), lit(1000000)) / 1000.0).as("value"))
    // HA pair: the same samples land twice (value jitter on the replica)
    graft.core.SampleStore.write(
      base.unionByName(base.withColumn("value", col("value") + 0.25)),
      path, SaveMode.Overwrite)
    val store = graft.core.SampleStore.read(spark, path)
    val interval = 60000L

    // the r8 shape, reconstructed: max(struct) + restore join
    def r8Shape(): DataFrame = {
      val keyed = store.withColumn("_sk", concat(coalesce(col("name"), lit("")),
        to_json(array_sort(map_entries(col("tags"))))))
      val bucket = expr(s"((ts + ${interval - 1}L) div ${interval}L) * ${interval}L")
      keyed
        .withColumn("_bkt", bucket)
        .groupBy(col("_sk"), col("_bkt"))
        .agg(max(struct(col("ts"), col("value"))).as("_w"))
        .select(col("_sk"), col("_w.ts").as("ts"), col("_w.value").as("value"))
        .join(keyed.select("_sk", "name", "tags").dropDuplicates("_sk"), Seq("_sk"))
        .select("name", "tags", "ts", "value")
    }
    def r9Shape(): DataFrame =
      graft.pipeline.Dedup.dedupNamedSamples(store, interval)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.select(count(lit(1)), sum("value")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // equality once (modulo float identity — same keep rule)
    val a = r8Shape().agg(count(lit(1)), round(sum("value"), 3)).collect()(0)
    val b = r9Shape().agg(count(lit(1)), round(sum("value"), 3)).collect()(0)
    println(s"[dedupprof] rows=$rows r8=(${a.mkString(",")}) r9=(${b.mkString(",")}) " +
      s"equal=${a.toString == b.toString}")
    var bestOld = Double.MaxValue
    var bestNew = Double.MaxValue
    for (p <- 1 to passes) { // interleaved
      val o = time(r8Shape()); val n = time(r9Shape())
      bestOld = math.min(bestOld, o); bestNew = math.min(bestNew, n)
      println(f"[dedupprof] pass=$p r8_shape=$o%.2fs r9_shape=$n%.2fs")
      System.gc()
    }
    println(f"[dedupprof] BEST r8_shape=$bestOld%.2fs r9_shape=$bestNew%.2fs " +
      f"speedup=${bestOld / bestNew}%.2fx")
    spark.stop()
  }
}
