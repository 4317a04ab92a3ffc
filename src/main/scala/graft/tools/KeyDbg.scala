package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

// scratch: does the O6 plan key distinguish two LocalRelations that differ
// only in DATA? (not a driver surface)
object KeyDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType)))
    def df(vals: Long*) = spark.createDataFrame(
      vals.map(v => org.apache.spark.sql.Row(v)).asJava, schema)
    val k1 = df(1L, 2L).queryExecution.logical.canonicalized.toString
    val k2 = df(1L, 2L, 3L).queryExecution.logical.canonicalized.toString
    println(s"[keydbg] same=${k1 == k2}")
    println(s"[keydbg] k1=$k1")
    println(s"[keydbg] k2=$k2")
    spark.stop()
  }
}
