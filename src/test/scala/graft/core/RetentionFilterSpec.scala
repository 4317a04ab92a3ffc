package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Enterprise `-retentionFilter` semantics (README.md:1594-1626): series
  * matching several filters get the SMALLEST retention; unmatched series
  * get `-retentionPeriod`; filter durations must not exceed the period.
  */
class RetentionFilterSpec extends SparkSpec {

  private val D = 86400000L
  private val now = 100 * D

  private def frame = {
    import spark.implicits._
    Seq(
      // (name, team, age days)
      ("m", "juniors", 2L), ("m", "juniors", 5L), // 3d filter
      ("m", "devs", 10L), ("m", "devs", 40L), // 30d filter
      ("m", "other", 40L), ("m", "other", 400L), // period 365d
      ("n", "juniors", 2L), ("n", "juniors", 25L) // matches BOTH → min(3,30)=3
    ).map { case (n, t, age) => (n, Map("team" -> t), now - age * D, 1.0) }
      .toDF("name", "tags", "ts", "value")
  }

  private val filters = SampleStore.parseRetentionFilters(
    Seq("""{team="juniors",__name__=~"m|n"}:3d,{team=~"juniors|devs"}:30d"""), 365 * D)

  test("smallest matching retention wins; unmatched gets the period") {
    val kept = frame
      .filter(SampleStore.retentionFilterPredicate(filters, 365 * D, now))
      .select(col("name"), col("tags")("team"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), (now - r.getLong(2)) / D)).toSet
    assert(kept === Set(
      ("m", "juniors", 2L), // 3d keeps age 2, drops 5
      ("m", "devs", 10L), // 30d keeps 10, drops 40
      ("m", "other", 40L), // period keeps 40, drops 400
      ("n", "juniors", 2L))) // min(3d, 30d)=3d keeps 2, drops 25
  }

  test("per-series dim resolution (>threshold stacks) matches the inline predicate") {
    // pad with never-matching filters to cross DimResolveThreshold, so
    // applyRetentionFilterPredicate takes the broadcast-join path — the
    // kept set must be byte-identical to the per-row matcher stack
    val pad = (0 until SampleStore.DimResolveThreshold + 1).map(i =>
      SampleStore.RetentionFilter(s"""{team="nobody$i"}""", (i + 1) * D))
    val stack = filters ++ pad
    assert(stack.size > SampleStore.DimResolveThreshold)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("name"), col("tags")("team"), col("ts"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val inline = key(frame.filter(
      SampleStore.retentionFilterPredicate(stack, 365 * D, now)))
    val dim = key(SampleStore.applyRetentionFilterPredicate(
      frame, stack, 365 * D, now))
    assert(dim === inline && inline.nonEmpty)
    // ≤ threshold keeps the inline plan (no join in the plan)
    val small = SampleStore.applyRetentionFilterPredicate(frame, filters, 365 * D, now)
    assert(!small.queryExecution.executedPlan.toString.contains("Join"))
    assert(key(small) === key(frame.filter(
      SampleStore.retentionFilterPredicate(filters, 365 * D, now))))
  }

  test("tags-only hash pair: null-name + empty-name series don't fan out (opt r14)") {
    import spark.implicits._
    // A bucketed frame's persisted pair hashes TAGS ONLY, so a null-name
    // and an empty-name series with identical tags share (h1, h2, _rnm)
    // while differing in the dedup payload — the dim used to emit two
    // rows for one join key and duplicate every matching sample row
    // (ADVICE r13). Both rows match the 30d team filter and are 2d old,
    // so exactly the two input rows must survive.
    val entries = array_sort(map_entries(col("tags")))
    val df = Seq(
      (Some(""), Map("team" -> "juniors"), now - 2 * D, 1.0),
      (Option.empty[String], Map("team" -> "juniors"), now - 2 * D, 2.0))
      .toDF("name", "tags", "ts", "value")
      .withColumn("_h1", xxhash64(entries))
      .withColumn("_h2", xxhash64(entries, lit(1)))
    val pad = (0 until SampleStore.DimResolveThreshold + 1).map(i =>
      SampleStore.RetentionFilter(s"""{team="nobody$i"}""", (i + 1) * D))
    val out = SampleStore.applyRetentionFilterPredicate(
      df, filters ++ pad, 365 * D, now)
    assert(out.count() == 2,
      s"dim join duplicated same-key series: ${out.collect().mkString(", ")}")
  }

  test("dim resolution keeps null-tag rows and survives the broadcast fallback") {
    import spark.implicits._
    // a null tags map must resolve like the inline predicate (no filter
    // matches → period retention), not vanish through a null join key
    val withNull = frame.unionByName(
      Seq(("m", 40L), ("m", 400L))
        .map { case (n, age) => (n, null.asInstanceOf[Map[String, String]], now - age * D, 1.0) }
        .toDF("name", "tags", "ts", "value"))
    val pad = (0 until SampleStore.DimResolveThreshold + 1).map(i =>
      SampleStore.RetentionFilter(s"""{team="nobody$i"}""", (i + 1) * D))
    val stack = filters ++ pad
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("name"), col("tags")("team"), col("ts"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val inline = key(withNull.filter(
      SampleStore.retentionFilterPredicate(stack, 365 * D, now)))
    assert(inline.exists(_._2 == null), "inline must keep the young null-tag row")
    assert(key(SampleStore.applyRetentionFilterPredicate(
      withNull, stack, 365 * D, now)) === inline)
    // past the size bound the forced broadcast is abandoned (planner's
    // choice instead — no driver-side risk); the kept set is unchanged
    // default bound: small input → the dim join carries the FORCED
    // broadcast hint (the planner may also pick broadcast on its own —
    // what the guard controls is the hint, i.e. the unbounded force)
    val hinted = SampleStore.applyRetentionFilterPredicate(withNull, stack, 365 * D, now)
    assert(hinted.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "under the bound the dim join must be hint-broadcast")
    // past the size bound the forced hint is dropped (planner's choice
    // instead — no unbounded driver-side build); the kept set is unchanged
    val saved = SampleStore.DimBroadcastMaxInputBytes
    SampleStore.DimBroadcastMaxInputBytes = BigInt(-1)
    try {
      val out = SampleStore.applyRetentionFilterPredicate(withNull, stack, 365 * D, now)
      assert(!out.queryExecution.optimizedPlan.toString.contains("broadcast"),
        "size-bound fallback must not carry the broadcast hint")
      assert(key(out) === inline)
    } finally SampleStore.DimBroadcastMaxInputBytes = saved
  }

  test("flag parsing: braces guard commas; validation errors") {
    assert(filters.map(f => (f.selector, f.retentionMs / D)) === Seq(
      ("""{team="juniors",__name__=~"m|n"}""", 3L),
      ("""{team=~"juniors|devs"}""", 30L)))
    // quote-aware scanning: braces/colons/commas INSIDE a quoted label
    // value must not split entries or truncate the selector
    val quoted = SampleStore.parseRetentionFilters(
      Seq("""{path=~"a{1}:.*,x"}:7d,{team="b"}:14d"""), 30 * D)
    assert(quoted.map(f => (f.selector, f.retentionMs / D)) === Seq(
      ("""{path=~"a{1}:.*,x"}""", 7L), ("""{team="b"}""", 14L)))
    def bad(fs: Seq[String], period: Long): String =
      intercept[IllegalArgumentException](
        SampleStore.parseRetentionFilters(fs, period)).getMessage
    assert(bad(Seq("""{a="b"}:400d"""), 365 * D)
      .contains("lower or equal to -retentionPeriod"))
    assert(bad(Seq("3d"), 365 * D).contains("series filter"))
    assert(bad(Seq("""{a="b"}"""), 365 * D).contains("cannot parse"))
  }

  test("snapshot restore: create → mutate → restore recovers the snapshot state") {
    val path = "target/retention_filter_spec/snap"
    val out = "target/retention_filter_spec/restored"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    SampleStore.write(frame, path)
    val name = SampleStore.createSnapshot(path, nowMs = now)
    // the store mutates after the snapshot (append doubles the rows)
    SampleStore.write(frame, path)
    assert(SampleStore.read(spark, path).count() == 16)
    // restore = vmrestore: the snapshot's exact 8 rows come back
    assert(SampleStore.restoreSnapshot(path, name, out))
    assert(SampleStore.read(spark, out).count() == 8)
    assert(!SampleStore.restoreSnapshot(path, "../evil", out))
    assert(!SampleStore.restoreSnapshot(path, "nope", out))
    // IN-PLACE rollback: existing data files are cleared first, so the
    // post-snapshot appends really disappear (vmrestore deletes the
    // target's contents before restoring); the snapshot itself survives
    assert(SampleStore.restoreSnapshot(path, name, path))
    assert(SampleStore.read(spark, path).count() == 8)
    assert(SampleStore.listSnapshots(path) == Seq(name))
  }

  test("legacy snapshots/ dir migrates to _snapshots/ on first access") {
    // a store created before the `_snapshots` layout keeps an unprefixed
    // snapshots/ dir that breaks partition discovery on every read AND
    // hides its snapshots from list/restore — first access must migrate
    val path = "target/retention_filter_spec/legacy"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    SampleStore.write(frame, path)
    val name = SampleStore.createSnapshot(path, nowMs = now)
    // simulate the pre-r9 layout by un-prefixing the snapshots root
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.move(root.resolve("_snapshots"), root.resolve("snapshots"))
    // read no longer throws CONFLICTING_DIRECTORY_STRUCTURES…
    assert(SampleStore.read(spark, path).count() == 8)
    // …and the legacy snapshot is visible and restorable again
    assert(SampleStore.listSnapshots(path) == Seq(name))
    SampleStore.write(frame, path) // mutate
    assert(SampleStore.restoreSnapshot(path, name, path))
    assert(SampleStore.read(spark, path).count() == 8)
    assert(!java.nio.file.Files.exists(root.resolve("snapshots")))
  }

  test("applyRetentionFilters rewrites the store") {
    val path = "target/retention_filter_spec/in"
    val out = "target/retention_filter_spec/out"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("target/retention_filter_spec"))
    SampleStore.write(frame, path)
    SampleStore.applyRetentionFilters(spark, path, out, filters, 365 * D, now)
    assert(SampleStore.read(spark, out).count() == 4)
    // the compaction job applies the same filters in its rewrite (the
    // reference applies retention filters during background merges)
    val out2 = "target/retention_filter_spec/compacted"
    SampleStore.compact(spark, path, out2, keepFromMs = 0L, dedupIntervalMs = 1L,
      retentionFilters = filters, retentionPeriodMs = 365 * D, nowMs = now)
    assert(SampleStore.read(spark, out2).count() == 4)
  }
}
