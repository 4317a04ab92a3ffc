package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway: run the bucketed TSBS increase in a loop and self-sample
  * executor threads to find where the extra CPU goes.
  */
object BuckSample {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val useFlat = sys.env.contains("BS_FLAT")
    val flat = graft.core.Samples.fromEvents(spark, sfDir)
    val src =
      if (useFlat) flat
      else {
        val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
        val tbl = s"buckprof$tag" // reuse BuckProf's table if present
        if (!spark.catalog.tableExists(tbl))
          graft.core.SampleStore.writeBucketed(flat, tbl, s"target/buckprof$tag", 32)
        graft.core.SampleStore.readBucketed(spark, tbl)
      }
    val grid = graft.core.GridSpec(1704067200000L, 1704067200000L + 7 * 86400000L, 60000L)
    val q = "increase(click[12h])"
    graft.Engine.query(src, q, grid, 7200000L).count() // warm
    if (sys.env.contains("BS_CODEGEN")) {
      import org.apache.spark.sql.execution.debug._
      val f = graft.Engine.query(src, q, grid, 7200000L)
      f.queryExecution.executedPlan.execute().count() // finalize AQE subtrees
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.env("BS_CODEGEN")), f.queryExecution.debug.codegenToSeq()
          .map { case (subtree, code, _) => s"=== SUBTREE ===\n$subtree\n--- code ${code.length} chars ---\n$code" }
          .mkString("\n\n"))
      spark.stop()
      return
    }
    val sampler = new Thread(() => {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      val t0 = System.nanoTime()
      while (System.nanoTime() - t0 < 25L * 1000000000L) {
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty &&
            t.getState == Thread.State.RUNNABLE) {
            // top-most interesting frame (skip pure JVM internals)
            val f = st.take(12).map(e => e.getClassName + "." + e.getMethodName)
              .find(n => !n.startsWith("java.") && !n.startsWith("jdk.") &&
                !n.startsWith("sun.") && !n.startsWith("scala.collection"))
              .getOrElse(st.head.toString)
            counts(f) = counts.getOrElse(f, 0) + 1
          }
        }
        Thread.sleep(10)
      }
      counts.toSeq.sortBy(-_._2).take(30).foreach { case (f, c) =>
        println(f"[bs] $c%6d  $f")
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    var runs = 0
    while (System.nanoTime() - t0 < 24L * 1000000000L) {
      graft.Engine.query(src, q, grid, 7200000L).count()
      runs += 1
    }
    Thread.sleep(1500)
    println(s"[bs] runs=$runs in 24s (${if (useFlat) "flat" else "bucketed"})")
    spark.stop()
  }
}
