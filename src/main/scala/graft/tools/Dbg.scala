package graft.tools

import org.apache.spark.sql.SparkSession

// scratch debug main — not part of the library surface
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = """sort_by_label((
			label_set(1, "foo", "common")
			or label_set(2, "foo", "left_only")
		) + fill(0) (
			label_set(3, "foo", "common")
			or label_set(4, "foo", "right_only")
		), "foo")"""
    println(graft.lang.Parser.parse(q))
    val grid = graft.core.GridSpec(1000000, 2000000, 200000)
    val empty = {
      import spark.implicits._
      Seq.empty[(String, Map[String, String], Long, Double)]
        .toDF("name", "tags", "ts", "value")
    }
    val out = graft.Engine.query(empty, q, grid)
    out.orderBy(org.apache.spark.sql.functions.to_json(
      org.apache.spark.sql.functions.col("tags")),
      org.apache.spark.sql.functions.col("t")).show(100, false)
    spark.stop()
  }
}
