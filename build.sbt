ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "victoriametricsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The suite is wall-clock-bound on a handful of long suites (the two
// golden corpora, the HTTP API spec) run back-to-back in ONE forked JVM:
// 22 min sequential, which overran the verification time budget (round 13
// recorded tests_ok=false with no failing test — the run was cut off).
// Split the suites into balanced forked groups and run the groups
// concurrently; each group is its own JVM with its own SparkSession, so
// suites that mutate JVM-global state (StorageLimits, checkpoint GC,
// in-memory catalog tables) stay isolated exactly as before. Suites
// sharing on-disk fixtures stay in the same group (core/* share
// target/ store dirs; api/* share the bucketed-table fixtures).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def groupOf(n: String): Int = n match {
    case "graft.lang.GoldenCorpusSpec" => 0 // 325 s sequential — own JVM
    case "graft.graphite.GraphiteGoldenSpec" |
        "graft.graphite.GraphiteSpec" => 1 // 281 + 48 s
    case s if s.startsWith("graft.api.") => 2 // HttpApiSpec 181 s + api
    case s if s.startsWith("graft.lang.") ||
        s.startsWith("graft.alerting.") => 3 // EvalSpec 71 s + fast lang
    case s if s.startsWith("graft.core.") => 4 // BucketedStoreSpec 87 s
    case s if s.startsWith("graft.streaming.") ||
        s.startsWith("graft.sources.") => 5 // stream/ingest goldens
    case _ => 6 // operators, pipeline, misc
  }
  tests.groupBy(t => groupOf(t.name)).toSeq.sortBy(_._1).map { case (i, ts) =>
    Tests.Group(s"g$i", ts.sortBy(_.name),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
// forked test groups may run concurrently (default limit is 1); everything
// else keeps sbt's defaults
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16),
  // 4 concurrent JVMs measured as the sweet spot: 7 oversubscribed the
  // (hypervisor-shared) box into HTTP-spec timeouts; the remaining groups
  // pipeline in as slots free up
  Tags.limit(Tags.ForkedTestGroup, 4))
// Each forked test JVM sizes its GC/JIT/common-pool threading from the
// visible CPU count (32) — seven such JVMs oversubscribe the box into
// kernel-side thrash (measured: sys time 10× user on the group run, HTTP
// specs timing out against their own in-JVM server). Cap the visible
// processors per test JVM; the 4-core Spark session is unaffected.
Test / javaOptions += "-XX:ActiveProcessorCount=6"
// Pass the forked process's stdout/stderr straight through, UNPREFIXED.
// sbt's default LoggedOutput decorates every forked line with "[info] ",
// which made the driver's bench JSON line unparseable in rounds 1-2
// (BENCH_r0{1,2}.json: "parsed": null).
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
