package graft.lang

import graft.{Engine, SparkSpec}
import graft.core.GridSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ported slice of the reference's golden query corpus
  * (app/vmselect/promql/exec_test.go TestExecSuccess): full MetricsQL
  * queries over NO stored data on the reference's exact 6-point grid
  * (start=1000e3ms, end=2000e3ms, step=200e3ms), pinning literal/scalar/
  * time()/transform/edge semantics value-for-value. Expected vectors are
  * copied verbatim from the Go subtests (exec_test.go:79-760).
  */
class GoldenSpec extends SparkSpec {

  private val grid = GridSpec(1000000L, 2000000L, 200000L)
  private val gridTs = (0 to 5).map(i => 1000000L + i * 200000L)

  private lazy val empty = spark.createDataFrame(
    new java.util.ArrayList[Row](),
    StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType),
      StructField("value", DoubleType))))

  /** evaluate `q` and compare the 6-point vector (NaN = missing point) */
  private def f(q: String, expected: Seq[Double],
      expectTags: Map[String, String] = null): Unit = {
    val rows = Engine.query(empty, q, grid).collect()
    val byT = rows.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val got = gridTs.map(t => byT.getOrElse(t, Double.NaN))
    expected.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
      val ok =
        if (e.isNaN) g.isNaN
        else math.abs(e - g) <= math.abs(e) * 1e-12 + 1e-12
      assert(ok, s"`$q` point $i: expected $e, got $g (full: $got)")
    }
    if (expectTags != null) {
      assert(rows.nonEmpty, s"`$q`: no rows for tag check")
      assert(rows.head.getMap[String, String](1).toMap == expectTags,
        s"`$q`: tags ${rows.head.getMap[String, String](1)}")
    }
  }

  private def const(v: Double): Seq[Double] = Seq.fill(6)(v)

  test("number literals (exec_test.go simple-number / underscores / suffixes)") {
    f("123", const(123))
    f("123_456_789", const(123456789))
    f("1_2.3_456_789", const(12.3456789))
    f("1h23m5S", const(4985))
    f("1h", const(3600))
    f("123M", const(123e6))
    f("1.23TB", const(1.23e12))
    f("1.23Mib", const(1.23 * (1 << 20)))
    f("1_234M", const(1234e6))
  }

  test("arithmetic precedence and scalar/vector coercion") {
    f("-1+2 *3 ^ 4+5%6", const(166))
    f("scalar(-1)+2 *vector(3) ^ scalar(4)+5", const(166))
    f("""scalar("-12.34")""", const(-12.34))
  }

  test("bitmap functions on constants") {
    f("bitmap_and(0xB3, 0x11)", const(17))
    f("bitmap_or(0xA2, 0x11)", const(179))
    f("bitmap_xor(0xB3, 0x11)", const(162))
  }

  test("time() family") {
    f("time()", Seq(1000, 1200, 1400, 1600, 1800, 2000))
    f("time() + time()", Seq(2000, 2400, 2800, 3200, 3600, 4000))
    f("timestamp(123)", Seq(1000, 1200, 1400, 1600, 1800, 2000))
    f("timestamp(time())", Seq(1000, 1200, 1400, 1600, 1800, 2000))
    f("timestamp(456/time()+123)", Seq(1000, 1200, 1400, 1600, 1800, 2000))
    f("round(now()/now())", const(1))
  }

  test("math transforms over time()") {
    f("abs(1500-time())", Seq(500, 300, 100, 100, 300, 500))
    f("ceil(time()/500)", Seq(2, 3, 3, 4, 4, 4))
    f("floor(time()/500)", Seq(2, 2, 2, 3, 3, 4))
    f("clamp(time(), 1400, 1800)", Seq(1400, 1400, 1400, 1600, 1800, 1800))
    f("clamp_max(time(), 1400)", Seq(1000, 1200, 1400, 1400, 1400, 1400))
    f("exp(time()/1e3)", Seq(2.718281828459045, 3.3201169227365472,
      4.0551999668446745, 4.953032424395115, 6.0496474644129465, 7.38905609893065))
    f("ln(time())", Seq(6.907755278982137, 7.090076835776092, 7.24422751560335,
      7.3777589082278725, 7.495541943884256, 7.600902459542082))
    f("sqrt(time())", Seq(31.622776601683793, 34.64101615137755,
      37.416573867739416, 40, 42.42640687119285, 44.721359549995796))
  }

  test("datetime transforms") {
    f("""timezone_offset("UTC")""", const(0))
    f("minute()", Seq(16, 20, 23, 26, 30, 33))
    f("hour(time()*1e4)", Seq(17, 21, 0, 4, 8, 11))
    f("day_of_month(time()*1e4)", Seq(26, 19, 12, 5, 28, 20))
  }

  test("label_set / default NaN handling (exec_test.go default_for_nan_series)") {
    f("""label_set(time(), "foo", "bar")""",
      Seq(1000, 1200, 1400, 1600, 1800, 2000), Map("foo" -> "bar"))
    f("""label_set(0, "foo", "bar")/0 default 7""", const(7), Map("foo" -> "bar"))
  }

  test("subquery over time() reaching before the grid start") {
    // inner grid extends 1h back: sum of 18 time() points / 3600
    f("sum_over_time(time()[1h]) / 1h", Seq(-3.5, -2.5, -1.5, -0.5, 0.5, 1.5))
  }
}
