package graft.tools

import graft.Engine
import graft.core.GridSpec
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** The exec_test.go golden corpus port (app/vmselect/promql/exec_test.go
  * TestExecSuccess): full MetricsQL queries over NO stored data on the
  * reference's exact 6-point grid, expected vectors copied verbatim from
  * the Go subtests. `check` runs one subtest; the `main` prints PASS/FAIL
  * for every candidate (used to curate GoldenCorpusSpec's exclusions).
  */
object GoldenTriage {
  private val n = Double.NaN
  private val inf = Double.PositiveInfinity
  case class R(name: String, tags: Map[String, String], vals: Seq[Double])
  case class E(nm: String, q: String, rs: Seq[R])
  private def M(kv: (String, String)*) = Map(kv: _*)

  private def entries0: Seq[E] = Seq(
    E("simple-number", "123", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("int_with_underscores", "123_456_789", Seq(R(null, null, Seq(123456789, 123456789, 123456789, 123456789, 123456789, 123456789)))),
    E("float_with_underscores", "1_2.3_456_789", Seq(R(null, null, Seq(12.3456789, 12.3456789, 12.3456789, 12.3456789, 12.3456789, 12.3456789)))),
    E("duration-constant", "1h23m5S", Seq(R(null, null, Seq(4985, 4985, 4985, 4985, 4985, 4985)))),
    E("num-with-suffix-1", "123M", Seq(R(null, null, Seq(123e6, 123e6, 123e6, 123e6, 123e6, 123e6)))),
    E("num-with-suffix-2", "1.23TB", Seq(R(null, null, Seq(1.23e12, 1.23e12, 1.23e12, 1.23e12, 1.23e12, 1.23e12)))),
    E("num-with-suffix-5", "1_234M", Seq(R(null, null, Seq(1234e6, 1234e6, 1234e6, 1234e6, 1234e6, 1234e6)))),
    E("simple-arithmetic", "-1+2 *3 ^ 4+5%6", Seq(R(null, null, Seq(166, 166, 166, 166, 166, 166)))),
    E("simple-string", """"foobar"""", Seq()),
    E("simple-string-op-number", """1+"foobar"*2%9""", Seq()),
    E("scalar-vector-arithmetic", "scalar(-1)+2 *vector(3) ^ scalar(4)+5", Seq(R(null, null, Seq(166, 166, 166, 166, 166, 166)))),
    E("scalar-string-nonnum", """scalar("fooobar")""", Seq()),
    E("scalar-string-num", """scalar("-12.34")""", Seq(R(null, null, Seq(-12.34, -12.34, -12.34, -12.34, -12.34, -12.34)))),
    E("bitmap_and(0xB3, 0x11)", "bitmap_and(0xB3, 0x11)", Seq(R(null, null, Seq(17, 17, 17, 17, 17, 17)))),
    E("bitmap_and(time(), 0x11)", "bitmap_and(time(), 0x11)", Seq(R(null, null, Seq(0, 16, 16, 0, 0, 16)))),
    E("bitmap_and(NaN, 1)", "bitmap_and(NaN, 1)", Seq()),
    E("bitmap_and(1, NaN)", "bitmap_and(1, NaN)", Seq()),
    E("bitmap_or(0xA2, 0x11)", "bitmap_or(0xA2, 0x11)", Seq(R(null, null, Seq(179, 179, 179, 179, 179, 179)))),
    E("bitmap_or(time(), 0x11)", "bitmap_or(time(), 0x11)", Seq(R(null, null, Seq(1017, 1201, 1401, 1617, 1817, 2001)))),
    E("bitmap_or(NaN, 1)", "bitmap_or(NaN, 1)", Seq()),
    E("bitmap_xor(0xB3, 0x11)", "bitmap_xor(0xB3, 0x11)", Seq(R(null, null, Seq(162, 162, 162, 162, 162, 162)))),
    E("bitmap_xor(time(), 0x11)", "bitmap_xor(time(), 0x11)", Seq(R(null, null, Seq(1017, 1185, 1385, 1617, 1817, 1985)))),
    E("bitmap_xor(NaN, 1)", "bitmap_xor(NaN, 1)", Seq()),
    E("timezone_offset(UTC)", """timezone_offset("UTC")""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("time()", "time()", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time() offset 0s", "time() offset 0s", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("(a, b) offset 0s", """sort((label_set(time(), "foo", "bar"), label_set(time()+10, "foo", "baz")) offset 0s)""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, Map("foo" -> "baz"), Seq(1010, 1210, 1410, 1610, 1810, 2010)))),
    E("time()[:100s] offset 0s", "time()[:100s] offset 0s", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time()[:100] offset 0", "time()[:100] offset 0", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time() offset 1h40s0ms", "time() offset 1h40s0ms", Seq(R(null, null, Seq(-2800, -2600, -2400, -2200, -2000, -1800)))),
    E("time() offset 3640", "time() offset 3640", Seq(R(null, null, Seq(-2800, -2600, -2400, -2200, -2000, -1800)))),
    E("time() offset -1h40s0ms", "time() offset -1h40s0ms", Seq(R(null, null, Seq(4600, 4800, 5000, 5200, 5400, 5600)))),
    E("time() offset -100s", "time() offset -100s", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("(a, b) offset 100s", """sort((label_set(time(), "foo", "bar"), label_set(time()+10, "foo", "baz")) offset 100s)""", Seq(R(null, Map("foo" -> "bar"), Seq(800, 1000, 1200, 1400, 1600, 1800)), R(null, Map("foo" -> "baz"), Seq(810, 1010, 1210, 1410, 1610, 1810)))),
    E("(a offset 100s, b offset 50s)", """sort((label_set(time() offset 100s, "foo", "bar"), label_set(time()+10, "foo", "baz") offset 50s))""", Seq(R(null, Map("foo" -> "bar"), Seq(800, 1000, 1200, 1400, 1600, 1800)), R(null, Map("foo" -> "baz"), Seq(810, 1010, 1210, 1410, 1610, 1810)))),
    E("(a offset 100s, b offset 50s) offset 400s", """sort((label_set(time() offset 100s, "foo", "bar"), label_set(time()+10, "foo", "baz") offset 50s) offset 400s)""", Seq(R(null, Map("foo" -> "bar"), Seq(400, 600, 800, 1000, 1200, 1400)), R(null, Map("foo" -> "baz"), Seq(410, 610, 810, 1010, 1210, 1410)))),
    E("(a offset -100s, b offset -50s) offset -400s", """sort((label_set(time() offset -100s, "foo", "bar"), label_set(time()+10, "foo", "baz") offset -50s) offset -400s)""", Seq(R(null, Map("foo" -> "bar"), Seq(1400, 1600, 1800, 2000, 2200, 2400)), R(null, Map("foo" -> "baz"), Seq(1410, 1610, 1810, 2010, 2210, 2410)))),
    E("1h", "1h", Seq(R(null, null, Seq(3600, 3600, 3600, 3600, 3600, 3600)))),
    E("sum_over_time(time()[1h]) / 1h", "sum_over_time(time()[1h]) / 1h", Seq(R(null, null, Seq(-3.5, -2.5, -1.5, -0.5, 0.5, 1.5)))),
    E("time()[:100s] offset 100s", "time()[:100s] offset 100s", Seq(R(null, null, Seq(900, 1100, 1300, 1500, 1700, 1900)))),
    E("time()[300s:100s] offset 100s", "time()[300s:100s] offset 100s", Seq(R(null, null, Seq(900, 1100, 1300, 1500, 1700, 1900)))),
    E("time()[300:100] offset 100", "time()[300:100] offset 100", Seq(R(null, null, Seq(900, 1100, 1300, 1500, 1700, 1900)))),
    E("time()[1.5i:0.5i] offset 0.5i", "time()[1.5i:0.5i] offset 0.5i", Seq(R(null, null, Seq(900, 1100, 1300, 1500, 1700, 1900)))),
    E("time()[300s] offset 100s", "time()[300s] offset 100s", Seq(R(null, null, Seq(800, 1000, 1200, 1400, 1600, 1800)))),
    E("time()[300s]", "time()[300s]", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time() + time()", "time() + time()", Seq(R(null, null, Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("timestamp(123)", "timestamp(123)", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("timestamp(time())", "timestamp(time())", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("timestamp(456/time()+123)", "timestamp(456/time()+123)", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("timestamp(time()>=1600)", "timestamp(time()>=1600)", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("timestamp(alias(time()>=1600))", """timestamp(alias(time()>=1600,"foo"))""", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("tlast_change_over_time(hit_last)", """tlast_change_over_time(
			time()[1h]
		)""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("tlast_change_over_time(hit_middle)", """tlast_change_over_time(
			(time() >=bool 1600)[1h]
		)""", Seq(R(null, null, Seq(n, n, n, 1600, 1600, 1600)))),
    E("tlast_change_over_time(miss)", """tlast_change_over_time(
			1[1h]
		)""", Seq()),
    E("timestamp_with_name(alias(time()>=1600))", """timestamp_with_name(alias(time()>=1600,"foo"))""", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("time()/100", "time()/100", Seq(R(null, null, Seq(10, 12, 14, 16, 18, 20)))),
    E("1e3/time()*2*9*7", "1e3/time()*2*9*7", Seq(R(null, null, Seq(126, 105, 90, 78.75, 70, 63)))),
    E("minute()", "minute()", Seq(R(null, null, Seq(16, 20, 23, 26, 30, 33)))),
    E("day_of_month()", "day_of_month(time()*1e4)", Seq(R(null, null, Seq(26, 19, 12, 5, 28, 20)))),
    E("day_of_week()", "day_of_week(time()*1e4)", Seq(R(null, null, Seq(0, 2, 5, 0, 2, 4)))),
    E("day_of_year()", "day_of_year(time()*1e4)", Seq(R(null, null, Seq(116, 139, 163, 186, 209, 232)))),
    E("days_in_month()", "days_in_month(time()*2e4)", Seq(R(null, null, Seq(31, 31, 30, 31, 28, 30)))),
    E("hour()", "hour(time()*1e4)", Seq(R(null, null, Seq(17, 21, 0, 4, 8, 11)))),
    E("month()", "month(time()*1e4)", Seq(R(null, null, Seq(4, 5, 6, 7, 7, 8)))),
    E("year()", "year(time()*1e5)", Seq(R(null, null, Seq(1973, 1973, 1974, 1975, 1975, 1976)))),
    E("minute(30*60+time())", "minute(30*60+time())", Seq(R(null, null, Seq(46, 50, 53, 56, 0, 3)))),
    E("minute(series_with_NaNs)", "minute(time() <= 1200 or time() > 1600)", Seq(R(null, null, Seq(16, 20, n, n, 30, 33)))),
    E("rate({})", "rate({})", Seq()),
    E("abs(1500-time())", "abs(1500-time())", Seq(R(null, null, Seq(500, 300, 100, 100, 300, 500)))),
    E("abs(-time()+1300)", "abs(-time()+1300)", Seq(R(null, null, Seq(300, 100, 100, 300, 500, 700)))),
    E("ceil(time() / 900)", "ceil(time()/500)", Seq(R(null, null, Seq(2, 3, 3, 4, 4, 4)))),
    E("absent(time())", "absent(time())", Seq()),
    E("absent_over_time(time())", "absent_over_time(time())", Seq()),
    E("present_over_time(time())", "present_over_time(time())", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("present_over_time(time()[100:300])", "present_over_time(time()[100:300])", Seq(R(null, null, Seq(n, 1, n, n, 1, n)))),
    E("present_over_time(time()<10m)", "present_over_time(time()<1600)", Seq(R(null, null, Seq(1, 1, 1, n, n, n)))),
    E("absent(123)", "absent(123)", Seq()),
    E("absent(vector(scalar(123)))", "absent(vector(scalar(123)))", Seq()),
    E("absent(NaN)", "absent(NaN)", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("absent_over_time(nan[200s:10s])", "absent_over_time(nan[200s:10s])", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1))))
  )

  private def entries1: Seq[E] = Seq(
    E("absent(scalar(multi-timeseries))", """
		absent(label_set(scalar(1 or label_set(2, "xx", "foo")), "yy", "foo"))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("absent_over_time(non-nan)", """
		absent_over_time(time())""", Seq()),
    E("absent_over_time(nan)", """
		absent_over_time((time() < 1500)[300s:])""", Seq(R(null, null, Seq(n, n, n, n, 1, 1)))),
    E("absent_over_time(multi-ts)", """
		absent_over_time((
			alias((time() < 1400)[200s:], "one"),
			alias((time() > 1600)[200s:], "two"),
		))""", Seq(R(null, null, Seq(n, n, 1, 1, n, n)))),
    E("absent(time() > 1500)", """
		absent(time() > 1500)""", Seq(R(null, null, Seq(1, 1, 1, n, n, n)))),
    E("clamp(time(), 1400, 1800)", "clamp(time(), 1400, 1800)", Seq(R(null, null, Seq(1400, 1400, 1400, 1600, 1800, 1800)))),
    E("clamp_max(time(), 1400)", "clamp_max(time(), 1400)", Seq(R(null, null, Seq(1000, 1200, 1400, 1400, 1400, 1400)))),
    E("clamp_max(alias(time(),\"foobar\"), 1400)", """clamp_max(alias(time(), "foobar"), 1400)""", Seq(R(null, null, Seq(1000, 1200, 1400, 1400, 1400, 1400)))),
    E("CLAmp_MAx(alias(time(),\"foobar\"), 1400)", """CLAmp_MAx(alias(time(), "foobar"), 1400)""", Seq(R(null, null, Seq(1000, 1200, 1400, 1400, 1400, 1400)))),
    E("clamp_min(time(), -time()+3000)", "clamp_min(time(), -time()+2500)", Seq(R(null, null, Seq(1500, 1300, 1400, 1600, 1800, 2000)))),
    E("clamp_min(1500, time())", "clamp_min(1500, time())", Seq(R(null, null, Seq(1500, 1500, 1500, 1600, 1800, 2000)))),
    E("exp(time()/1e3)", """exp(alias(time()/1e3, "foobar"))""", Seq(R(null, null, Seq(2.718281828459045, 3.3201169227365472, 4.0551999668446745, 4.953032424395115, 6.0496474644129465, 7.38905609893065)))),
    E("exp(time()/1e3) keep_metric_names", """exp(alias(time()/1e3, "foobar")) keep_metric_names""", Seq(R(null, null, Seq(2.718281828459045, 3.3201169227365472, 4.0551999668446745, 4.953032424395115, 6.0496474644129465, 7.38905609893065)))),
    E("time() @ 1h", "time() @ 1h", Seq(R(null, null, Seq(3600, 3600, 3600, 3600, 3600, 3600)))),
    E("time() @ start()", "time() @ start()", Seq(R(null, null, Seq(1000, 1000, 1000, 1000, 1000, 1000)))),
    E("time() @ end()", "time() @ end()", Seq(R(null, null, Seq(2000, 2000, 2000, 2000, 2000, 2000)))),
    E("time() @ end() offset 10m", "time() @ end() offset 10m", Seq(R(null, null, Seq(1400, 1400, 1400, 1400, 1400, 1400)))),
    E("time() @ (end()-10m)", "time() @ (end()-10m)", Seq(R(null, null, Seq(1400, 1400, 1400, 1400, 1400, 1400)))),
    E("pi()", "pi()", Seq(R(null, null, Seq(3.141592653589793, 3.141592653589793, 3.141592653589793, 3.141592653589793, 3.141592653589793, 3.141592653589793)))),
    E("sinh()", "sinh(pi()*(2000-time())/1000)", Seq(R(null, null, Seq(11.548739357257748, 6.132140673514712, 3.217113080357038, 1.6144880404748523, 0.6704839982471175, 0)))),
    E("asin()", "asin((2000-time())/1000)", Seq(R(null, null, Seq(1.5707963267948966, 0.9272952180016123, 0.6435011087932843, 0.41151684606748806, 0.20135792079033082, 0)))),
    E("asinh(sinh)", "asinh(sinh((2000-time())/1000))", Seq(R(null, null, Seq(1, 0.8000000000000002, 0.6, 0.4000000000000001, 0.2, 0)))),
    E("atan2()", "time() atan2 time()/10", Seq(R(null, null, Seq(0.07853981633974483, 0.07853981633974483, 0.07853981633974483, 0.07853981633974483, 0.07853981633974483, 0.07853981633974483)))),
    E("atan()", "atan((2000-time())/1000)", Seq(R(null, null, Seq(0.7853981633974483, 0.6747409422235526, 0.5404195002705842, 0.3805063771123649, 0.19739555984988078, 0)))),
    E("atanh(tanh)", "atanh(tanh((2000-time())/1000))", Seq(R(null, null, Seq(1, 0.8000000000000002, 0.6, 0.4000000000000001, 0.2, 0)))),
    E("cos()", "cos(pi()*(2000-time())/1000)", Seq(R(null, null, Seq(-1, -0.8090169943749475, -0.30901699437494734, 0.30901699437494745, 0.8090169943749473, 1)))),
    E("acos()", "acos((2000-time())/1000)", Seq(R(null, null, Seq(0, 0.6435011087932843, 0.9272952180016123, 1.1592794807274085, 1.3694384060045657, 1.5707963267948966)))),
    E("acosh(cosh)", "acosh(cosh((2000-time())/1000))", Seq(R(null, null, Seq(1, 0.8000000000000002, 0.5999999999999999, 0.40000000000000036, 0.20000000000000023, 0)))),
    E("rad(deg)", "rad(deg(time()/500))", Seq(R(null, null, Seq(2, 2.3999999999999995, 2.8, 3.2, 3.6, 4)))),
    E("floor(time()/500)", "floor(time()/500)", Seq(R(null, null, Seq(2, 2, 2, 3, 3, 4)))),
    E("sqrt(time())", "sqrt(time())", Seq(R(null, null, Seq(31.622776601683793, 34.64101615137755, 37.416573867739416, 40, 42.42640687119285, 44.721359549995796)))),
    E("ln(time())", "ln(time())", Seq(R(null, null, Seq(6.907755278982137, 7.090076835776092, 7.24422751560335, 7.3777589082278725, 7.495541943884256, 7.600902459542082)))),
    E("log2(time())", "log2(time())", Seq(R(null, null, Seq(9.965784284662087, 10.228818690495881, 10.451211111832329, 10.643856189774725, 10.813781191217037, 10.965784284662087)))),
    E("log10(time())", "log10(time())", Seq(R(null, null, Seq(3, 3.0791812460476247, 3.1461280356782377, 3.2041199826559246, 3.255272505103306, 3.3010299956639813)))),
    E("time()*(-4)^0.5", "time()*(-4)^0.5", Seq()),
    E("time()*-4^0.5", "time()*-4^0.5", Seq(R(null, null, Seq(-2000, -2400, -2800, -3200, -3600, -4000)))),
    E("default_for_nan_series", """label_set(0, "foo", "bar")/0 default 7""", Seq(R(null, Map("foo" -> "bar"), Seq(7, 7, 7, 7, 7, 7)))),
    E("alias()", """alias(time(), "foobar")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_set(tag)", """label_set(time(), "tagname", "tagvalue")""", Seq(R(null, Map("tagname" -> "tagvalue"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_set(metricname)", """label_set(time(), "__name__", "foobar")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_set(metricname, tag)", """label_set(
			label_set(time(), "__name__", "foobar"),
			"tagname", "tagvalue"
		)""", Seq(R(null, Map("tagname" -> "tagvalue"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_set(del_metricname)", """label_set(
			label_set(time(), "__name__", "foobar"),
			"__name__", ""
		)""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_set(del_tag)", """label_set(
			label_set(time(), "tagname", "foobar"),
			"tagname", ""
		)""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_set(multi)", """label_set(time()+100, "t1", "v1", "t2", "v2", "__name__", "v3")""", Seq(R(null, Map("t1" -> "v1", "t2" -> "v2"), Seq(1100, 1300, 1500, 1700, 1900, 2100)))),
    E("label_map(match)", """sort(label_map((
			label_set(time(), "label", "v1"),
			label_set(time()+100, "label", "v2"),
			label_set(time()+200, "label", "v3"),
			label_set(time()+300, "x", "y"),
			label_set(time()+400, "label", "v4"),
		), "label", "v1", "foo", "v2", "bar", "", "qwe", "v4", ""))""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, null, Seq(1100, 1300, 1500, 1700, 1900, 2100)), R(null, null, Seq(1200, 1400, 1600, 1800, 2000, 2200)), R(null, null, Seq(1300, 1500, 1700, 1900, 2100, 2300)), R(null, null, Seq(1400, 1600, 1800, 2000, 2200, 2400)))),
    E("label_uppercase", """label_uppercase(
			label_set(time(), "foo", "bAr", "XXx", "yyy", "zzz", "abc"),
			"foo", "XXx", "aaa"
		)""", Seq(R(null, Map("XXx" -> "YYY", "foo" -> "BAR", "zzz" -> "abc"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_lowercase", """label_lowercase(
			label_set(time(), "foo", "bAr", "XXx", "yyy", "zzz", "aBc"),
			"foo", "XXx", "aaa"
		)""", Seq(R(null, Map("XXx" -> "yyy", "foo" -> "bar", "zzz" -> "aBc"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_copy(new_tag)", """label_copy(
			label_set(time(), "tagname", "foobar"),
			"tagname", "xxx"
		)""", Seq(R(null, Map("tagname" -> "foobar", "xxx" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_move(new_tag)", """label_move(
			label_set(time(), "tagname", "foobar"),
			"tagname", "xxx"
		)""", Seq(R(null, Map("xxx" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_copy(same_tag)", """label_copy(
			label_set(time(), "tagname", "foobar"),
			"tagname", "tagname"
		)""", Seq(R(null, Map("tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_move(same_tag)", """label_move(
			label_set(time(), "tagname", "foobar"),
			"tagname", "tagname"
		)""", Seq(R(null, Map("tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_copy(same_tag_nonexisting_src)", """label_copy(
			label_set(time(), "tagname", "foobar"),
			"non-existing-tag", "tagname"
		)""", Seq(R(null, Map("tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_move(same_tag_nonexisting_src)", """label_move(
			label_set(time(), "tagname", "foobar"),
			"non-existing-tag", "tagname"
		)""", Seq(R(null, Map("tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_copy(existing_tag)", """label_copy(
			label_set(time(), "tagname", "foobar", "xx", "yy"),
			"xx", "tagname"
		)""", Seq(R(null, Map("tagname" -> "yy", "xx" -> "yy"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_move(existing_tag)", """label_move(
			label_set(time(), "tagname", "foobar", "xx", "yy"),
			"xx", "tagname"
		)""", Seq(R(null, Map("tagname" -> "yy"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_copy(from_metric_group)", """label_copy(
			label_set(time(), "tagname", "foobar", "__name__", "yy"),
			"__name__", "aa"
		)""", Seq(R(null, Map("aa" -> "yy", "tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_move(from_metric_group)", """label_move(
			label_set(time(), "tagname", "foobar", "__name__", "yy"),
			"__name__", "aa"
		)""", Seq(R(null, Map("aa" -> "yy", "tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_copy(to_metric_group)", """label_copy(
			label_set(time(), "tagname", "foobar"),
			"tagname", "__name__"
		)""", Seq(R(null, Map("tagname" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_move(to_metric_group)", """label_move(
			label_set(time(), "tagname", "foobar"),
			"tagname", "__name__"
		)""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("labels_equal()", """sort(labels_equal((
			label_set(10, "instance", "qwe", "host", "rty"),
			label_set(20, "instance", "qwe", "host", "qwe"),
			label_set(30, "aaa", "bbb", "instance", "foo", "host", "foo"),
		), "instance", "host"))""", Seq(R(null, Map("host" -> "qwe", "instance" -> "qwe"), Seq(20, 20, 20, 20, 20, 20)), R(null, Map("aaa" -> "bbb", "host" -> "foo", "instance" -> "foo"), Seq(30, 30, 30, 30, 30, 30)))),
    E("drop_empty_series()", """sort(drop_empty_series(
			(
				alias(time(), "foo"),
				alias(500 + time(), "bar"),
			) > 2000
		) default 123)""", Seq(R(null, null, Seq(123, 123, 123, 2100, 2300, 2500)))),
    E("no drop_empty_series()", """sort((
			(
				alias(time(), "foo"),
				alias(500 + time(), "bar"),
			) > 2000
		) default 123)""", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)), R(null, null, Seq(123, 123, 123, 2100, 2300, 2500)))),
    E("drop_common_labels(single_series)", """drop_common_labels(label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"))""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("drop_common_labels(multi_series)", """sort_desc(drop_common_labels((
			label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"),
			label_set(time()/10, "foo", "bar", "__name__", "yyy"),
		)))""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, null, Seq(100, 120, 140, 160, 180, 200)))),
    E("drop_common_labels(multi_args)", """sort(drop_common_labels(
			label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"),
			label_set(time()/10, "foo", "bar", "__name__", "xxx"),
		))""", Seq(R(null, null, Seq(100, 120, 140, 160, 180, 200)), R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_keep(nolabels)", """label_keep(time(), "foo", "bar")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_keep(certain_labels)", """label_keep(label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"), "foo", "nonexisting-label")""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_keep(metricname)", """label_keep(label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"), "nonexisting-label", "__name__")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_del(nolabels)", """label_del(time(), "foo", "bar")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_del(certain_labels)", """label_del(label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"), "foo", "nonexisting-label")""", Seq(R(null, Map("q" -> "we"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_del(metricname)", """label_del(label_set(time(), "foo", "bar", "__name__", "xxx", "q", "we"), "nonexisting-label", "__name__")""", Seq(R(null, Map("foo" -> "bar", "q" -> "we"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_join(empty)", """label_join(vector(time()), "tt", "(sep)", "BAR")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_join(tt)", """label_join(vector(time()), "tt", "(sep)", "foo", "BAR")""", Seq(R(null, Map("tt" -> "(sep)"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_join(__name__)", """label_join(time(), "__name__", "(sep)", "foo", "BAR", "")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_join(label_join)", """label_join(label_join(time(), "__name__", "(sep)", "foo", "BAR"), "xxx", ",", "foobar", "__name__")""", Seq(R(null, Map("xxx" -> ",(sep)"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_join dst_label is equal to src_label", """label_join(label_join(time(), "bar", "sep1", "a", "b"), "bar", "sep2", "a", "bar")""", Seq(R(null, Map("bar" -> "sep2sep1"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_value()", """with (
			x = (
				label_set(time() > 1500, "foo", "123.456", "__name__", "aaa"),
				label_set(-time(), "foo", "bar", "__name__", "bbb"),
				label_set(-time(), "__name__", "bxs"),
				label_set(-time(), "foo", "45", "bar", "xs"),
			)
		)
		sort(x + label_value(x, "foo"))""", Seq(R(null, Map("bar" -> "xs", "foo" -> "45"), Seq(-955, -1155, -1355, -1555, -1755, -1955)), R(null, Map("foo" -> "123.456"), Seq(n, n, n, 1723.456, 1923.456, 2123.456)))),
    E("label_transform(mismatch)", """label_transform(time(), "__name__", "foobar", "xx")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_transform(match)", """label_transform(
			label_set(time(), "foo", "a.bar.baz"),
			"foo", "\\.", "-")""", Seq(R(null, Map("foo" -> "a-bar-baz"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_replace(nonexisting_src)", """label_replace(time(), "__name__", "x${1}y", "foo", ".+")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000))))
  )

  private def entries2: Seq[E] = Seq(
    E("label_replace(nonexisting_src_match)", """label_replace(time(), "foo", "x", "bar", "")""", Seq(R(null, Map("foo" -> "x"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_replace(nonexisting_src_mismatch)", """label_replace(time(), "foo", "x", "bar", "y")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_replace(mismatch)", """label_replace(label_set(time(), "foo", "foobar"), "__name__", "x${1}y", "foo", "bar(.+)")""", Seq(R(null, Map("foo" -> "foobar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_replace(match)", """label_replace(time(), "__name__", "x${1}y", "foo", ".*")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_replace(label_replace)", """
		label_replace(
			label_replace(
				label_replace(time(), "__name__", "x${1}y", "foo", ".*"),
				"xxx", "foo${1}bar(${1})", "__name__", "(.+)"),
			"xxx", "AA$1", "xxx", "foox(.+)"
		)""", Seq(R(null, Map("xxx" -> "AAybar(xy)"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_match()", """
		label_match((
			alias(time(), "foo"),
			alias(2*time(), "bar"),
		), "__name__", "f.+")""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("label_mismatch()", """
		label_mismatch((
			alias(time(), "foo"),
			alias(2*time(), "bar"),
		), "__name__", "f.+")""", Seq(R(null, null, Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("label_graphite_group()", """sort(label_graphite_group((
			alias(1, "foo.bar.baz"),
			alias(2, "abc"),
			label_set(alias(3, "a.xx.zz.asd"), "qwe", "rty"),
	        ), 1, 3))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(2, 2, 2, 2, 2, 2)), R(null, null, Seq(3, 3, 3, 3, 3, 3)))),
    E("limit_offset", """limit_offset(1, 1, sort_by_label((
			label_set(time()*1, "foo", "y"),
			label_set(time()*2, "foo", "a"),
			label_set(time()*3, "foo", "x"),
		), "foo"))""", Seq(R(null, Map("foo" -> "x"), Seq(3000, 3600, 4200, 4800, 5400, 6000)))),
    E("limit_offset(too-big-offset)", """limit_offset(1, 10, sort_by_label((
			label_set(time()*1, "foo", "y"),
			label_set(time()*2, "foo", "a"),
			label_set(time()*3, "foo", "x"),
		), "foo"))""", Seq()),
    E("limit_offset NaN", """limit_offset(1, 1, sort_by_label_desc((
			label_set(time()*1, "foo", "1"),
			label_set(time()*2, "foo", "2"),
			label_set(time()*3, "foo", "3"),
		) < 3000, "foo"))""", Seq(R(null, Map("foo" -> "1"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("sum(label_graphite_group)", """sort(sum by (__name__) (
			label_graphite_group((
				alias(1, "foo.bar.baz"),
				alias(2, "x.y.z"),
				alias(3, "qe.bar.qqq"),
			), 1)
		))""", Seq(R(null, null, Seq(2, 2, 2, 2, 2, 2)), R(null, null, Seq(4, 4, 4, 4, 4, 4)))),
    E("two_timeseries", """sort_desc(time() or label_set(2, "xx", "foo"))""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, null, Seq(2, 2, 2, 2, 2, 2)))),
    E("sgn(time()-1400)", "sgn(time()-1400)", Seq(R(null, null, Seq(-1, -1, 0, 1, 1, 1)))),
    E("round(time()/1e3)", "round(time()/1e3)", Seq(R(null, null, Seq(1, 1, 1, 2, 2, 2)))),
    E("round(time()/1e3, 0.5)", "round(time()/1e3, 0.5)", Seq(R(null, null, Seq(1, 1, 1.5, 1.5, 2, 2)))),
    E("round(-time()/1e3, 1)", "round(-time()/1e3, 0.5)", Seq(R(null, null, Seq(-1, -1, -1.5, -1.5, -2, -2)))),
    E("scalar(multi-timeseries)", """scalar(1 or label_set(2, "xx", "foo"))""", Seq()),
    E("sort()", """sort(2 or label_set(1, "xx", "foo"))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(2, 2, 2, 2, 2, 2)))),
    E("sort_desc()", """sort_desc(1 or label_set(2, "xx", "foo"))""", Seq(R(null, null, Seq(2, 2, 2, 2, 2, 2)), R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("sort_by_label()", """sort_by_label((
			alias(1, "foo"),
			alias(2, "bar"),
		), "__name__")""", Seq(R(null, null, Seq(2, 2, 2, 2, 2, 2)), R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("sort_by_label_desc()", """sort_by_label_desc((
			alias(1, "foo"),
			alias(2, "bar"),
		), "__name__")""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(2, 2, 2, 2, 2, 2)))),
    E("sort_by_label(multiple_labels)", """sort_by_label((
			label_set(1, "x", "b", "y", "aa"),
			label_set(2, "x", "a", "y", "aa"),
		), "y", "x")""", Seq(R(null, Map("x" -> "a", "y" -> "aa"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("x" -> "b", "y" -> "aa"), Seq(1, 1, 1, 1, 1, 1)))),
    E("scalar < time()", "123 < time()", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time() > scalar", "time() > 1234", Seq(R(null, null, Seq(n, n, 1400, 1600, 1800, 2000)))),
    E("time() >bool scalar", "time() >bool 1234", Seq(R(null, null, Seq(0, 0, 1, 1, 1, 1)))),
    E("nan >bool scalar1", "(time() > 1234) >bool 1450", Seq(R(null, null, Seq(n, n, 0, 1, 1, 1)))),
    E("nan!=bool scalar", "(time() > 1234) !=bool 1400", Seq(R(null, null, Seq(n, n, 0, 1, 1, 1)))),
    E("scalar!=bool nan", "1400 !=bool (time() > 1234)", Seq(R(null, null, Seq(n, n, 0, 1, 1, 1)))),
    E("scalar > time()", "123 > time()", Seq()),
    E("time() < scalar", "time() < 123", Seq()),
    E("scalar1 < time() < scalar2", "1300 < time() < 1700", Seq(R(null, null, Seq(n, n, 1400, 1600, n, n)))),
    E("a cmp scalar (leave MetricGroup)", """sort_desc((
			label_set(time(), "__name__", "foo", "a", "x"),
			label_set(time()+200, "__name__", "bar", "a", "x"),
		) > 1300)""", Seq(R(null, Map("a" -> "x"), Seq(n, 1400, 1600, 1800, 2000, 2200)), R(null, Map("a" -> "x"), Seq(n, n, 1400, 1600, 1800, 2000)))),
    E("a cmp bool scalar (drop MetricGroup)", """sort_desc((
			label_set(time(), "__name__", "foo", "a", "x"),
			label_set(time()+200, "__name__", "bar", "a", "y"),
		) >= bool 1200)""", Seq(R(null, Map("a" -> "y"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("a" -> "x"), Seq(0, 1, 1, 1, 1, 1)))),
    E("1 > 2", "1 > 2", Seq()),
    E("vector(1) == bool time()", "vector(1) == bool time()", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("vector(1) == time()", "vector(1) == time()", Seq()),
    E("compare_to_nan_right", "1 != nan", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("compare_to_nan_left", "nan != 1", Seq()),
    E("compare_to_nan_left_vector_right_scalar", """label_set(time(), "foo", "bar") != NaN""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("compare_to_non_nan_scalar_right", """label_set(time(), "foo", "bar") != 1200""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, n, 1400, 1600, 1800, 2000)))),
    E("compare_to_nan_vector_right", """label_set(time(), "foo", "bar") != label_set(NaN, "foo", "bar")""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("compare_to_nan_scalar_comparison_right", """label_set(time(), "foo", "bar") != (1 > 2)""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("compare_to_empty_vector_right", """label_set(time(), "foo", "bar") != (label_set(time(), "foo", "bar") > 100000)""", Seq()),
    E("compare_to_empty_vector_right_offset", """label_set(time(), "foo", "bar") != ((label_set(time(), "foo", "bar") > 100000) offset 0s)""", Seq()),
    E("compare_to_empty_vector_left", """(label_set(time(), "foo", "bar") > 100000) != label_set(time(), "foo", "bar")""", Seq()),
    E("compare_to_empty_series_right_bool", """label_set(time(), "foo", "bar") == bool (label_set(time(), "foo", "bar") > 100000)""", Seq()),
    E("compare_to_partially_empty_series_right", """label_set(time(), "foo", "bar") != (label_set(time(), "foo", "bar") * 2 > 2800)""", Seq(R(null, Map("foo" -> "bar"), Seq(n, n, n, 1600, 1800, 2000)))),
    E("compare_to_empty_unlabeled_vector_right", """sum(label_set(time(), "foo", "bar")) != (sum(label_set(time(), "foo", "bar")) > 100000)""", Seq()),
    E("compare_to_empty_series_right_with_fill_left", """label_set(time(), "foo", "bar") != fill_left(0) (label_set(time(), "foo", "bar") > 100000)""", Seq()),
    E("compare_to_empty_series_right_with_fill_right", """label_set(time(), "foo", "bar") != fill_right(0) (label_set(time(), "foo", "bar") > 100000)""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("-1 < 2", "-1 < 2", Seq(R(null, null, Seq(-1, -1, -1, -1, -1, -1)))),
    E("time() > 2", "time() > 2", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time() >= bool 2", "time() >= bool 2", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("1 and (0 > 1)", "1 and (0 > 1)", Seq()),
    E("time() and 2", "time() and 2", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("time() and time() > 1300", "time() and time() > 1300", Seq(R(null, null, Seq(n, n, 1400, 1600, 1800, 2000)))),
    E("time() unless 2", "time() unless 2", Seq()),
    E("time() unless time() > 1500", "time() unless time() > 1500", Seq(R(null, null, Seq(1000, 1200, 1400, n, n, n)))),
    E("series or series", """(
			label_set(time(), "x", "foo"),
			label_set(time()+1, "x", "bar"),
		) or (
			label_set(time()+2, "x", "foo"),
			label_set(time()+3, "x", "baz"),
		)""", Seq(R(null, Map("x" -> "bar"), Seq(1001, 1201, 1401, 1601, 1801, 2001)), R(null, Map("x" -> "foo"), Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, Map("x" -> "baz"), Seq(1003, 1203, 1403, 1603, 1803, 2003)))),
    E("scalar or scalar", "time() > 1400 or 123", Seq(R(null, null, Seq(123, 123, 123, 1600, 1800, 2000)))),
    E("timseries-with-tags unless 2", """label_set(time(), "foo", "bar") unless 2""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("scalar default scalar", "time() > 1400 default 123", Seq(R(null, null, Seq(123, 123, 123, 1600, 1800, 2000)))),
    E("scalar default scalar_from_vector", """time() > 1400 default scalar(label_set(123, "foo", "bar"))""", Seq(R(null, null, Seq(123, 123, 123, 1600, 1800, 2000)))),
    E("scalar default vector1", """time() > 1400 default label_set(123, "foo", "bar")""", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("scalar default vector2", """time() > 1400 default (
			label_set(123, "foo", "bar"),
			label_set(456, "__name__", "xxx"),
		)""", Seq(R(null, null, Seq(456, 456, 456, 1600, 1800, 2000)))),
    E("scalar default NaN", "time() > 1400 default (time() < -100)", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("vector default scalar", """sort_desc(union(
			label_set(time() > 1400, "__name__", "x", "foo", "bar"),
			label_set(time() < 1700, "__name__", "y", "foo", "baz")) default 123)""", Seq(R(null, Map("foo" -> "bar"), Seq(123, 123, 123, 1600, 1800, 2000)), R(null, Map("foo" -> "baz"), Seq(1000, 1200, 1400, 1600, 123, 123)))),
    E("vector / scalar", """sort_desc((label_set(time(), "foo", "bar") or label_set(10, "foo", "qwert")) / 2)""", Seq(R(null, Map("foo" -> "bar"), Seq(500, 600, 700, 800, 900, 1000)), R(null, Map("foo" -> "qwert"), Seq(5, 5, 5, 5, 5, 5)))),
    E("vector / scalar keep_metric_names", """sort_desc(((label_set(time(), "foo", "bar", "__name__", "q1") or label_set(10, "foo", "qwert", "__name__", "q2")) / 2) keep_metric_names)""", Seq(R(null, Map("foo" -> "bar"), Seq(500, 600, 700, 800, 900, 1000)), R(null, Map("foo" -> "qwert"), Seq(5, 5, 5, 5, 5, 5)))),
    E("vector * scalar", "sum(time()) * 2", Seq(R(null, null, Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("scalar * vector", """sort_desc(2 * (label_set(time(), "foo", "bar") or label_set(10, "foo", "qwert")))""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("foo" -> "qwert"), Seq(20, 20, 20, 20, 20, 20)))),
    E("scalar * vector keep_metric_names", """sort_desc(2 * (label_set(time(), "foo", "bar", "__name__", "q1"), label_set(10, "foo", "qwert", "__name__", "q2")) keep_metric_names)""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("foo" -> "qwert"), Seq(20, 20, 20, 20, 20, 20)))),
    E("scalar * on() group_right vector", """sort_desc(2 * on() group_right() (label_set(time(), "foo", "bar") or label_set(10, "foo", "qwert")))""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("foo" -> "qwert"), Seq(20, 20, 20, 20, 20, 20)))),
    E("scalar * on() group_right vector keep_metric_names", """sort_desc(2 * on() group_right() (label_set(time(), "foo", "bar", "__name__", "q1"), label_set(10, "foo", "qwert", "__name__", "q2")) keep_metric_names)""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("foo" -> "qwert"), Seq(20, 20, 20, 20, 20, 20)))),
    E("scalar * ignoring(foo) group_right vector", """sort_desc(label_set(2, "a", "2") * ignoring(foo,a) group_right(a) (label_set(time(), "foo", "bar", "a", "1"), label_set(10, "foo", "qwert")))""", Seq(R(null, Map("a" -> "2", "foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("a" -> "2", "foo" -> "qwert"), Seq(20, 20, 20, 20, 20, 20)))),
    E("scalar * ignoring(a) vector", """sort_desc(label_set(2, "foo", "bar") * ignoring(a) (label_set(time(), "foo", "bar") or label_set(10, "foo", "qwert")))""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("scalar * on(foo) vector", """sort_desc(label_set(2, "foo", "bar", "aa", "bb") * on(foo) (label_set(time(), "foo", "bar", "xx", "yy") or label_set(10, "foo", "qwert")))""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("vector * on(foo) scalar", """sort_desc((label_set(time(), "foo", "bar", "xx", "yy"), label_set(10, "foo", "qwert")) * on(foo) label_set(2, "foo","bar","aa","bb"))""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("vector * on(foo) scalar keep_metric_names", """((
		          label_set(time(), "foo", "bar", "xx", "yy", "__name__", "q1"),
			  label_set(10, "foo", "qwert", "__name__", "q2")
		      ) * on(foo) label_set(2, "foo","bar","aa","bb", "__name__", "q2")) keep_metric_names""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000))))
  )

  private def entries3: Seq[E] = Seq(
    E("vector * on(foo) group_left(additional_tag) duplicate_timeseries_differ_by_additional_tag", """sort(label_set(time()/10, "foo", "bar", "xx", "yy", "__name__", "qwert") + on(foo) group_left(op) (
			label_set(time() < 1400, "foo", "bar", "op", "le"),
			label_set(time() >= 1400, "foo", "bar", "op", "ge"),
		))""", Seq(R(null, Map("foo" -> "bar", "op" -> "le", "xx" -> "yy"), Seq(1100, 1320, n, n, n, n)), R(null, Map("foo" -> "bar", "op" -> "ge", "xx" -> "yy"), Seq(n, n, 1540, 1760, 1980, 2200)))),
    E("vector * on(foo) duplicate_nonoverlapping_timeseries", """label_set(time()/10, "foo", "bar", "xx", "yy", "__name__", "qwert") + on(foo) (
			label_set(time() < 1400, "foo", "bar", "op", "le"),
			label_set(time() >= 1400, "foo", "bar", "op", "ge"),
		)""", Seq(R(null, Map("foo" -> "bar"), Seq(1100, 1320, 1540, 1760, 1980, 2200)))),
    E("vector * on(foo) group_left() duplicate_nonoverlapping_timeseries", """label_set(time()/10, "foo", "bar", "xx", "yy", "__name__", "qwert") + on(foo) group_left() (
			label_set(time() < 1400, "foo", "bar", "op", "le"),
			label_set(time() >= 1400, "foo", "bar", "op", "ge"),
		)""", Seq(R(null, Map("foo" -> "bar", "xx" -> "yy"), Seq(1100, 1320, 1540, 1760, 1980, 2200)))),
    E("vector * on(foo) group_left(__name__)", """label_set(time()/10, "foo", "bar", "xx", "yy", "__name__", "qwert") + on(foo) group_left(__name__)
			label_set(time(), "foo", "bar", "__name__", "aaa")""", Seq(R(null, Map("foo" -> "bar", "xx" -> "yy"), Seq(1100, 1320, 1540, 1760, 1980, 2200)))),
    E("vector * on(foo) group_right()", """sort(label_set(time()/10, "foo", "bar", "xx", "yy", "__name__", "qwert") + on(foo) group_right(xx) (
			label_set(time(), "foo", "bar", "__name__", "aaa"),
			label_set(time()+3, "foo", "bar", "__name__", "yyy","ppp", "123"),
		))""", Seq(R(null, Map("foo" -> "bar", "xx" -> "yy"), Seq(1100, 1320, 1540, 1760, 1980, 2200)), R(null, Map("foo" -> "bar", "ppp" -> "123", "xx" -> "yy"), Seq(1103, 1323, 1543, 1763, 1983, 2203)))),
    E("vector * on() group_left scalar", """sort_desc((label_set(time(), "foo", "bar") or label_set(10, "foo", "qwert")) * on() group_left 2)""", Seq(R(null, Map("foo" -> "bar"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("foo" -> "qwert"), Seq(20, 20, 20, 20, 20, 20)))),
    E("vector + vector matching", """sort_desc(
			(label_set(time(), "t1", "v1") or label_set(10, "t2", "v2"))
			+
			(label_set(100, "t1", "v1") or label_set(time(), "t2", "v2"))
		)""", Seq(R(null, Map("t1" -> "v1"), Seq(1100, 1300, 1500, 1700, 1900, 2100)), R(null, Map("t2" -> "v2"), Seq(1010, 1210, 1410, 1610, 1810, 2010)))),
    E("vector + vector partial matching", """sort_desc(
			(label_set(time(), "t1", "v1") or label_set(10, "t2", "v2"))
			+
			(label_set(100, "t1", "v1") or label_set(time(), "t2", "v3"))
		)""", Seq(R(null, Map("t1" -> "v1"), Seq(1100, 1300, 1500, 1700, 1900, 2100)))),
    E("vector + vector partial matching keep_metric_names", """(
		  (label_set(time(), "t1", "v1", "__name__", "q1") or label_set(10, "t2", "v2", "__name__", "q2"))
		    +
		  (label_set(100, "t1", "v1", "__name__", "q1") or label_set(time(), "t2", "v3"))
		) keep_metric_names""", Seq(R(null, Map("t1" -> "v1"), Seq(1100, 1300, 1500, 1700, 1900, 2100)))),
    E("vector + vector no matching", """sort_desc(
			(label_set(time(), "t2", "v1") or label_set(10, "t2", "v2"))
			+
			(label_set(100, "t1", "v1") or label_set(time(), "t2", "v3"))
		)""", Seq()),
    E("vector + vector on matching", """sort_desc(
			(label_set(time(), "t1", "v123", "t2", "v3") or label_set(10, "t2", "v2"))
			+ on (foo, t2)
			(label_set(100, "t1", "v1") or label_set(time(), "t2", "v3"))
		)""", Seq(R(null, Map("t2" -> "v3"), Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("vector + vector on group_left matching", """sort_desc(
			(label_set(time(), "t1", "v123", "t2", "v3"), label_set(10, "t2", "v3", "xxx", "yy"))
			+ on (foo, t2) group_left (t1, noxxx)
			(label_set(100, "t1", "v1"), label_set(time(), "t2", "v3", "noxxx", "aa"))
		)""", Seq(R(null, Map("noxxx" -> "aa", "t2" -> "v3"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("noxxx" -> "aa", "t2" -> "v3", "xxx" -> "yy"), Seq(1010, 1210, 1410, 1610, 1810, 2010)))),
    E("vector + vector on group_left(*)", """sort_desc(
			(label_set(time(), "t1", "v123", "t2", "v3"), label_set(10, "t2", "v3", "xxx", "yy"))
			+ on (foo, t2) group_left (*)
			(label_set(100, "t1", "v1"), label_set(time(), "t2", "v3", "noxxx", "aa"))
		)""", Seq(R(null, Map("noxxx" -> "aa", "t1" -> "v123", "t2" -> "v3"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("noxxx" -> "aa", "t2" -> "v3", "xxx" -> "yy"), Seq(1010, 1210, 1410, 1610, 1810, 2010)))),
    E("vector + vector on group_left(*) prefix", """sort_desc(
			(label_set(time(), "t1", "v123", "t2", "v3"), label_set(10, "t2", "v3", "xxx", "yy"))
			+ on (foo, t2) group_left (*) prefix "abc_"
			(label_set(100, "t1", "v1"), label_set(time(), "t2", "v3", "noxxx", "aa"))
		)""", Seq(R(null, Map("abc_noxxx" -> "aa", "t1" -> "v123", "t2" -> "v3"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("abc_noxxx" -> "aa", "t2" -> "v3", "xxx" -> "yy"), Seq(1010, 1210, 1410, 1610, 1810, 2010)))),
    E("vector + vector on group_left (__name__)", """sort_desc(
			(union(label_set(time(), "t2", "v3", "__name__", "vv3", "x", "y"), label_set(10, "t2", "v3", "__name__", "yy")))
			+ on (t2, dfdf) group_left (__name__, xxx)
			(label_set(100, "t1", "v1") or label_set(time(), "t2", "v3", "__name__", "abc"))
		)""", Seq(R(null, Map("t2" -> "v3", "x" -> "y"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("t2" -> "v3"), Seq(1010, 1210, 1410, 1610, 1810, 2010)))),
    E("vector + vector ignoring matching", """sort_desc(
			(label_set(time(), "t1", "v123", "t2", "v3") or label_set(10, "t2", "v2"))
			+ ignoring (foo, t1, bar)
			(label_set(100, "t1", "v1") or label_set(time(), "t2", "v3"))
		)""", Seq(R(null, Map("t2" -> "v3"), Seq(2000, 2400, 2800, 3200, 3600, 4000)))),
    E("vector + vector ignoring group_right matching", """sort_desc(
			(label_set(time(), "t1", "v123", "t2", "v3") or label_set(10, "t2", "v321", "t1", "v123", "t32", "v32"))
			+ ignoring (foo, t2) group_right ()
			(label_set(100, "t1", "v123") or label_set(time(), "t1", "v123", "t2", "v3"))
		)""", Seq(R(null, Map("t1" -> "v123", "t2" -> "v3"), Seq(2000, 2400, 2800, 3200, 3600, 4000)), R(null, Map("t1" -> "v123"), Seq(1100, 1300, 1500, 1700, 1900, 2100)))),
    E("vector + vector fill()", """sort_by_label((
			label_set(1, "foo", "common")
			or label_set(2, "foo", "left_only")
		) + fill(0) (
			label_set(3, "foo", "common")
			or label_set(4, "foo", "right_only")
		), "foo")""", Seq(R(null, Map("foo" -> "common"), Seq(4, 4, 4, 4, 4, 4)), R(null, Map("foo" -> "left_only"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("foo" -> "right_only"), Seq(4, 4, 4, 4, 4, 4)))),
    E("vector + vector fill() both sides NaN case", """(
			label_set(time() <= 1200, "foo", "common")
		) + fill(10) (
			label_set(time() >= 1600, "foo", "common")
		)""", Seq(R(null, Map("foo" -> "common"), Seq(1010, 1210, n, 1610, 1810, 2010)))),
    E("vector + vector fill_left() fill_right()", """sort_by_label((
			label_set(1, "foo", "common")
			or label_set(2, "foo", "left_only")
		) + fill_left(10) fill_right(20) (
			label_set(3, "foo", "common")
			or label_set(4, "foo", "right_only")
		), "foo")""", Seq(R(null, Map("foo" -> "common"), Seq(4, 4, 4, 4, 4, 4)), R(null, Map("foo" -> "left_only"), Seq(22, 22, 22, 22, 22, 22)), R(null, Map("foo" -> "right_only"), Seq(14, 14, 14, 14, 14, 14)))),
    E("vector + vector fill_right() only", """sort_by_label((
			label_set(1, "foo", "common")
			or label_set(2, "foo", "left_only")
		) + fill_right(20) (
			label_set(3, "foo", "common")
			or label_set(4, "foo", "right_only")
		), "foo")""", Seq(R(null, Map("foo" -> "common"), Seq(4, 4, 4, 4, 4, 4)), R(null, Map("foo" -> "left_only"), Seq(22, 22, 22, 22, 22, 22)))),
    E("vector + vector on() fill()", """sort_by_label((
			label_set(1, "foo", "common", "extra", "l")
			or label_set(2, "foo", "left_only", "extra", "l")
		) + on(foo) fill(0) (
			label_set(3, "foo", "common", "extra", "r")
			or label_set(4, "foo", "right_only", "extra", "r")
		), "foo")""", Seq(R(null, Map("foo" -> "common"), Seq(4, 4, 4, 4, 4, 4)), R(null, Map("foo" -> "left_only"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("foo" -> "right_only"), Seq(4, 4, 4, 4, 4, 4)))),
    E("vector + vector on() group_left() fill_right()", """sort_by_label((
			label_set(1, "method", "get", "code", "500")
			or label_set(2, "method", "get", "code", "404")
			or label_set(3, "method", "put", "code", "501")
		) + on(method) group_left() fill_right(0) (
			label_set(10, "method", "get")
		), "method", "code")""", Seq(R(null, Map("code" -> "404", "method" -> "get"), Seq(12, 12, 12, 12, 12, 12)), R(null, Map("code" -> "500", "method" -> "get"), Seq(11, 11, 11, 11, 11, 11)), R(null, Map("code" -> "501", "method" -> "put"), Seq(3, 3, 3, 3, 3, 3)))),
    E("vector / vector ignoring() fill()", """sort_by_label((
			label_set(6, "method", "get", "code", "500")
			or label_set(1, "method", "put", "code", "500")
		) / ignoring(code) fill(0) (
			label_set(12, "method", "get")
			or label_set(5, "method", "post")
			or label_set(10, "method", "put")
		), "method")""", Seq(R(null, Map("method" -> "get"), Seq(0.5, 0.5, 0.5, 0.5, 0.5, 0.5)), R(null, Map("method" -> "post"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("method" -> "put"), Seq(0.1, 0.1, 0.1, 0.1, 0.1, 0.1)))),
    E("histogram_quantile(scalar)", "histogram_quantile(0.6, time())", Seq()),
    E("histogram_share(scalar)", "histogram_share(123, time())", Seq()),
    E("histogram_fraction(scalar)", "histogram_fraction(123, 456, time())", Seq()),
    E("histogram_quantile(single-value-no-le)", """histogram_quantile(0.6, label_set(100, "foo", "bar"))""", Seq()),
    E("histogram_share(single-value-no-le)", """histogram_share(123, label_set(100, "foo", "bar"))""", Seq()),
    E("histogram_fraction(single-value-no-le)", """histogram_fraction(123,456, label_set(100, "foo", "bar"))""", Seq()),
    E("histogram_quantile(single-value-invalid-le)", """histogram_quantile(0.6, label_set(100, "le", "foobar"))""", Seq()),
    E("histogram_share(single-value-invalid-le)", """histogram_share(50, label_set(100, "le", "foobar"))""", Seq()),
    E("histogram_fraction(single-value-invalid-le)", """histogram_fraction(50, 60, label_set(100, "le", "foobar"))""", Seq()),
    E("histogram_quantile(single-value-inf-le)", """histogram_quantile(0.6, label_set(100, "le", "+Inf"))""", Seq()),
    E("histogram_quantile(zero-value-inf-le)", """histogram_quantile(0.6, (
			label_set(100, "le", "+Inf"),
			label_set(0, "le", "42"),
		))""", Seq(R(null, null, Seq(42, 42, 42, 42, 42, 42)))),
    E("histogram_quantile(single-value-valid-le)", """histogram_quantile(0.6, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(120, 120, 120, 120, 120, 120)))),
    E("histogram_share(single-value-valid-le)", """histogram_share(80, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(0.4, 0.4, 0.4, 0.4, 0.4, 0.4)))),
    E("histogram_fraction(single-value-valid-le)", """histogram_fraction(0, 100, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(0.5, 0.5, 0.5, 0.5, 0.5, 0.5)))),
    E("histogram_quantile(single-value-valid-le, boundsLabel)", """sort(histogram_quantile(0.6, label_set(100, "le", "200"), "foobar"))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)), R(null, null, Seq(120, 120, 120, 120, 120, 120)), R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("histogram_share(single-value-valid-le, boundsLabel)", """sort(histogram_share(120, label_set(100, "le", "200"), "foobar"))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)), R(null, null, Seq(0.6, 0.6, 0.6, 0.6, 0.6, 0.6)), R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("histogram_quantile(single-value-valid-le-max-phi)", """histogram_quantile(1, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("histogram_share(single-value-valid-le-max-le)", """histogram_share(200, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("histogram_quantile(single-value-valid-le-min-phi)", """histogram_quantile(0, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(55, 55, 55, 55, 55, 55)))),
    E("histogram_share(single-value-valid-le-min-le)", """histogram_share(0, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("histogram_share(single-value-valid-le-low-le)", """histogram_share(55, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("histogram_fraction(single-value-valid-le-max-le)", """histogram_fraction(0,100, (
			label_set(100, "le", "100"),
			label_set(40, "le", "50"),
			label_set(0, "le", "10"),
		))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("histogram_fraction(single-value-valid-le-min-le)", """histogram_fraction(0,10, (
			label_set(100, "le", "100"),
			label_set(40, "le", "50"),
			label_set(0, "le", "10"),
		))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("histogram_share(single-value-valid-le-mid-le-1)", """histogram_share(105, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(0.3448275862068966, 0.3448275862068966, 0.3448275862068966, 0.3448275862068966, 0.3448275862068966, 0.3448275862068966)))),
    E("histogram_share(single-value-valid-le-mid-le-2)", """histogram_share(55, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("histogram_fraction(single-value-valid-le-mid-le)", """histogram_fraction(55,105, (
			label_set(100, "le", "200"),
			label_set(0, "le", "55"),
		))""", Seq(R(null, null, Seq(0.3448275862068966, 0.3448275862068966, 0.3448275862068966, 0.3448275862068966, 0.3448275862068966, 0.3448275862068966)))),
    E("histogram_quantile(single-value-valid-le-min-phi-no-zero-bucket)", """histogram_quantile(0, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("histogram_quantile(scalar-phi)", """histogram_quantile(time() / 2 / 1e3, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(100, 120, 140, 160, 180, 200)))),
    E("histogram_share(scalar-phi)", """histogram_share(time() / 8, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(0.625, 0.75, 0.875, 1, 1, 1)))),
    E("histogram_fraction(scalar-phi)", """histogram_fraction(25, time() / 8, label_set(100, "le", "200"))""", Seq(R(null, null, Seq(0.5, 0.625, 0.75, 0.875, 0.875, 0.875)))),
    E("histogram_quantile(duplicate-le)", """round(sort(histogram_quantile(0.6,
			label_set(90, "foo", "bar", "le", "5")
			or label_set(100, "foo", "bar", "le", "5.0")
			or label_set(200, "foo", "bar", "le", "6.0")
			or label_set(300, "foo", "bar", "le", "+Inf")
		)), 0.1)""", Seq(R(null, Map("foo" -> "bar"), Seq(4.7, 4.7, 4.7, 4.7, 4.7, 4.7)))),
    E("histogram_quantile(valid)", """sort(histogram_quantile(0.6,
			label_set(90, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
			or label_set(200, "tag", "xx", "le", "10")
			or label_set(300, "tag", "xx", "le", "30")
		))""", Seq(R(null, Map("tag" -> "xx"), Seq(9, 9, 9, 9, 9, 9)), R(null, Map("foo" -> "bar"), Seq(30, 30, 30, 30, 30, 30)))),
    E("histogram_share(valid)", """sort(histogram_share(25,
			label_set(90, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
			or label_set(200, "tag", "xx", "le", "10")
			or label_set(300, "tag", "xx", "le", "30")
		))""", Seq(R(null, Map("foo" -> "bar"), Seq(0.325, 0.325, 0.325, 0.325, 0.325, 0.325)), R(null, Map("tag" -> "xx"), Seq(0.9166666666666666, 0.9166666666666666, 0.9166666666666666, 0.9166666666666666, 0.9166666666666666, 0.9166666666666666)))),
    E("histogram_fraction(valid)", """sort(histogram_fraction(0, 25,
			label_set(90, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
			or label_set(200, "tag", "xx", "le", "10")
			or label_set(300, "tag", "xx", "le", "30")
		))""", Seq(R(null, Map("foo" -> "bar"), Seq(0.325, 0.325, 0.325, 0.325, 0.325, 0.325)), R(null, Map("tag" -> "xx"), Seq(0.9166666666666666, 0.9166666666666666, 0.9166666666666666, 0.9166666666666666, 0.9166666666666666, 0.9166666666666666)))),
    E("histogram_quantile(negative-bucket-count)", """histogram_quantile(0.6,
			label_set(90, "foo", "bar", "le", "10")
			or label_set(-100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
		)""", Seq(R(null, Map("foo" -> "bar"), Seq(30, 30, 30, 30, 30, 30)))),
    E("histogram_quantile(nan-bucket-count-some)", """round(histogram_quantile(0.6,
			union(label_set(90, "foo", "bar", "le", "10"),
			label_set(NaN, "foo", "bar", "le", "30"),
			label_set(300, "foo", "bar", "le", "+Inf"))
		),0.01)""", Seq(R(null, Map("foo" -> "bar"), Seq(30, 30, 30, 30, 30, 30)))),
    E("histogram_quantile(normal-bucket-count)", """histogram_quantile(0.2,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
		)""", Seq(R(null, Map("foo" -> "bar"), Seq(22, 22, 22, 22, 22, 22)))),
    E("histogram_quantiles()", """sort_by_label(histogram_quantiles("phi", 0.2, 0.3,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
		), "phi")""", Seq(R(null, Map("foo" -> "bar", "phi" -> "0.2"), Seq(22, 22, 22, 22, 22, 22)), R(null, Map("foo" -> "bar", "phi" -> "0.3"), Seq(28, 28, 28, 28, 28, 28)))),
    E("histogram_share(normal-bucket-count)", """histogram_share(35,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
		)""", Seq(R(null, Map("foo" -> "bar"), Seq(0.3333333333333333, 0.3333333333333333, 0.3333333333333333, 0.3333333333333333, 0.3333333333333333, 0.3333333333333333)))),
    E("histogram_fraction(normal-bucket-count)", """histogram_fraction(22,35,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf")
		)""", Seq(R(null, Map("foo" -> "bar"), Seq(0.1333333333333333, 0.1333333333333333, 0.1333333333333333, 0.1333333333333333, 0.1333333333333333, 0.1333333333333333)))),
    E("histogram_quantile(normal-bucket-count, boundsLabel)", """sort(histogram_quantile(0.2,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf"),
			"xxx"
		))""", Seq(R(null, Map("foo" -> "bar", "xxx" -> "lower"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("foo" -> "bar"), Seq(22, 22, 22, 22, 22, 22)), R(null, Map("foo" -> "bar", "xxx" -> "upper"), Seq(30, 30, 30, 30, 30, 30)))),
    E("histogram_share(normal-bucket-count, boundsLabel)", """sort(histogram_share(22,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(100, "foo", "bar", "le", "30")
			or label_set(300, "foo", "bar", "le", "+Inf"),
			"xxx"
		))""", Seq(R(null, Map("foo" -> "bar", "xxx" -> "lower"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("foo" -> "bar"), Seq(0.2, 0.2, 0.2, 0.2, 0.2, 0.2)), R(null, Map("foo" -> "bar", "xxx" -> "upper"), Seq(0.3333333333333333, 0.3333333333333333, 0.3333333333333333, 0.3333333333333333, 0.3333333333333333, 0.3333333333333333)))),
    E("histogram_quantile(zero-bucket-count)", """histogram_quantile(0.6,
			label_set(0, "foo", "bar", "le", "10")
			or label_set(0, "foo", "bar", "le", "30")
			or label_set(0, "foo", "bar", "le", "+Inf")
		)""", Seq()),
    E("histogram_quantile(nan-bucket-count-all)", """histogram_quantile(0.6,
			label_set(nan, "foo", "bar", "le", "10")
			or label_set(nan, "foo", "bar", "le", "30")
			or label_set(nan, "foo", "bar", "le", "+Inf")
		)""", Seq()),
    E("buckets_limit(trim_zero_preserve_empty_when_limit_not_reached)", """sort(buckets_limit(3, (
			alias(label_set(36, "le", "+Inf"), "metric"),
			alias(label_set(36, "le", "25"), "metric"),
			alias(label_set(36, "le", "21"), "metric"),
			alias(label_set(36, "le", "19"), "metric"),
			alias(label_set(36, "le", "18"), "metric"),
			alias(label_set(36, "le", "17"), "metric"),
			alias(label_set(36, "le", "16"), "metric"),
			alias(label_set(27, "le", "12"), "metric"),
			alias(label_set(14, "le", "9"), "metric"),
			alias(label_set(0, "le", "6"), "metric"),
			alias(label_set(0, "le", "1"), "metric"),
			)))""", Seq(R(null, Map("le" -> "9"), Seq(14, 14, 14, 14, 14, 14)), R(null, Map("le" -> "12"), Seq(27, 27, 27, 27, 27, 27)), R(null, Map("le" -> "16"), Seq(36, 36, 36, 36, 36, 36)))),
    E("buckets_limit(trim_zero)", """sort(buckets_limit(5, (
			alias(label_set(36, "le", "18"), "metric"),
			alias(label_set(36, "le", "17"), "metric"),
			alias(label_set(36, "le", "16"), "metric"),
			alias(label_set(27, "le", "12"), "metric"),
			alias(label_set(14, "le", "9"), "metric"),
			alias(label_set(0, "le", "6"), "metric"),
			alias(label_set(0, "le", "1"), "metric"),
			)))""", Seq(R(null, Map("le" -> "1"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("le" -> "6"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("le" -> "9"), Seq(14, 14, 14, 14, 14, 14)), R(null, Map("le" -> "12"), Seq(27, 27, 27, 27, 27, 27)), R(null, Map("le" -> "16"), Seq(36, 36, 36, 36, 36, 36)))),
    E("buckets_limit(unused)", """sort(buckets_limit(5, (
			alias(label_set(100, "le", "inf", "x", "y"), "metric"),
			alias(label_set(50, "le", "120", "x", "y"), "metric"),
		)))""", Seq(R(null, Map("le" -> "120", "x" -> "y"), Seq(50, 50, 50, 50, 50, 50)), R(null, Map("le" -> "inf", "x" -> "y"), Seq(100, 100, 100, 100, 100, 100)))),
    E("buckets_limit(used)", """sort(buckets_limit(2, (
			alias(label_set(100, "le", "inf", "x", "y"), "metric"),
			alias(label_set(98, "le", "300", "x", "y"), "metric"),
			alias(label_set(52, "le", "200", "x", "y"), "metric"),
			alias(label_set(50, "le", "120", "x", "y"), "metric"),
			alias(label_set(20, "le", "70", "x", "y"), "metric"),
			alias(label_set(10, "le", "30", "x", "y"), "metric"),
			alias(label_set(9, "le", "10", "x", "y"), "metric"),
		)))""", Seq(R(null, Map("le" -> "10", "x" -> "y"), Seq(9, 9, 9, 9, 9, 9)), R(null, Map("le" -> "300", "x" -> "y"), Seq(98, 98, 98, 98, 98, 98)), R(null, Map("le" -> "inf", "x" -> "y"), Seq(100, 100, 100, 100, 100, 100)))),
    E("prometheus_buckets(missing-vmrange)", """sort(prometheus_buckets((
			alias(label_set(time()/20, "foo", "bar", "le", "0.2"), "xyz"),
			alias(label_set(time()/100, "foo", "bar", "vmrange", "foobar"), "xxx"),
			alias(label_set(time()/100, "foo", "bar", "vmrange", "30...foobar"), "xxx"),
			alias(label_set(time()/100, "foo", "bar", "vmrange", "30...40"), "xxx"),
			alias(label_set(time()/80, "foo", "bar", "vmrange", "0...900", "le", "54"), "yyy"),
			alias(label_set(time()/40, "foo", "bar", "vmrange", "900...+Inf", "le", "2343"), "yyy"),
		)))""", Seq(R(null, Map("foo" -> "bar", "le" -> "30"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("foo" -> "bar", "le" -> "40"), Seq(10, 12, 14, 16, 18, 20)), R(null, Map("foo" -> "bar", "le" -> "+Inf"), Seq(10, 12, 14, 16, 18, 20)), R(null, Map("foo" -> "bar", "le" -> "900"), Seq(12.5, 15, 17.5, 20, 22.5, 25)), R(null, Map("foo" -> "bar", "le" -> "+Inf"), Seq(37.5, 45, 52.5, 60, 67.5, 75)), R(null, Map("foo" -> "bar", "le" -> "0.2"), Seq(50, 60, 70, 80, 90, 100)))),
    E("prometheus_buckets(valid)", """sort(prometheus_buckets((
			alias(label_set(90, "foo", "bar", "vmrange", "0...0"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0...0.2"), "xxx"),
			alias(label_set(time()/100, "foo", "bar", "vmrange", "0.2...40"), "xxx"),
			alias(label_set(time()/10, "foo", "bar", "vmrange", "40...Inf"), "xxx"),
		)))""", Seq(R(null, Map("foo" -> "bar", "le" -> "0"), Seq(90, 90, 90, 90, 90, 90)), R(null, Map("foo" -> "bar", "le" -> "0.2"), Seq(140, 150, 160, 170, 180, 190)), R(null, Map("foo" -> "bar", "le" -> "40"), Seq(150, 162, 174, 186, 198, 210)), R(null, Map("foo" -> "bar", "le" -> "Inf"), Seq(250, 282, 314, 346, 378, 410)))),
    E("prometheus_buckets(overlapped ranges)", """sort(prometheus_buckets((
			alias(label_set(90, "foo", "bar", "vmrange", "0...0"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0...0.2"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0.2...0.25"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0...0.26"), "xxx"),
			alias(label_set(time()/100, "foo", "bar", "vmrange", "0.2...40"), "xxx"),
			alias(label_set(time()/10, "foo", "bar", "vmrange", "40...Inf"), "xxx"),
		)))""", Seq(R(null, Map("foo" -> "bar", "le" -> "0"), Seq(90, 90, 90, 90, 90, 90)), R(null, Map("foo" -> "bar", "le" -> "0.2"), Seq(140, 150, 160, 170, 180, 190)), R(null, Map("foo" -> "bar", "le" -> "0.25"), Seq(190, 210, 230, 250, 270, 290)), R(null, Map("foo" -> "bar", "le" -> "0.26"), Seq(240, 270, 300, 330, 360, 390)), R(null, Map("foo" -> "bar", "le" -> "40"), Seq(250, 282, 314, 346, 378, 410)), R(null, Map("foo" -> "bar", "le" -> "Inf"), Seq(350, 402, 454, 506, 558, 610)))),
    E("prometheus_buckets(overlapped ranges at the end)", """sort(prometheus_buckets((
			alias(label_set(90, "foo", "bar", "vmrange", "0...0"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0...0.2"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0.2...0.25"), "xxx"),
			alias(label_set(time()/20, "foo", "bar", "vmrange", "0...0.25"), "xxx"),
			alias(label_set(time()/100, "foo", "bar", "vmrange", "0.2...40"), "xxx"),
			alias(label_set(time()/10, "foo", "bar", "vmrange", "40...Inf"), "xxx"),
		)))""", Seq(R(null, Map("foo" -> "bar", "le" -> "0"), Seq(90, 90, 90, 90, 90, 90)), R(null, Map("foo" -> "bar", "le" -> "0.2"), Seq(140, 150, 160, 170, 180, 190)), R(null, Map("foo" -> "bar", "le" -> "0.25"), Seq(190, 210, 230, 250, 270, 290)), R(null, Map("foo" -> "bar", "le" -> "40"), Seq(200, 222, 244, 266, 288, 310)), R(null, Map("foo" -> "bar", "le" -> "Inf"), Seq(300, 342, 384, 426, 468, 510)))),
    E("median_over_time()", "median_over_time({})", Seq()),
    E("sum(scalar)", "sum(123)", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("sum(multi-args)", "sum(1, 2, 3)", Seq(R(null, null, Seq(6, 6, 6, 6, 6, 6)))),
    E("sum(union-scalars)", "sum((1, 2, 3))", Seq(R(null, null, Seq(6, 6, 6, 6, 6, 6))))
  )

  private def entries4: Seq[E] = Seq(
    E("sum(union-vectors)", """sum((
			alias(1, "foo"),
			alias(2, "foo"),
			alias(3, "foo"),
		))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("sum(scalar) by ()", "sum(123) by ()", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("sum(scalar) without ()", "sum(123) without ()", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("mode()", """mode((
			alias(3, "m1"),
			alias(2, "m2"),
			alias(3, "m3"),
			alias(4, "m4"),
			alias(3, "m5"),
			alias(2, "m6"),
		))""", Seq(R(null, null, Seq(3, 3, 3, 3, 3, 3)))),
    E("share()", """sort_by_label(round(share((
			label_set(time()/100+10, "k", "v1"),
			label_set(time()/200+5, "k", "v2"),
			label_set(time()/110-10, "k", "v3"),
			label_set(time()/90-5, "k", "v4"),
		)), 0.001), "k")""", Seq(R(null, Map("k" -> "v1"), Seq(0.554, 0.521, 0.487, 0.462, 0.442, 0.426)), R(null, Map("k" -> "v2"), Seq(0.277, 0.26, 0.243, 0.231, 0.221, 0.213)), R(null, Map("k" -> "v3"), Seq(n, 0.022, 0.055, 0.081, 0.1, 0.116)), R(null, Map("k" -> "v4"), Seq(0.169, 0.197, 0.214, 0.227, 0.237, 0.245)))),
    E("sum(share())", """round(sum(share((
			label_set(time()/100+10, "k", "v1"),
			label_set(time()/200+5, "k", "v2"),
			label_set(time()/110-10, "k", "v3"),
			label_set(time()/90-5, "k", "v4"),
		))), 0.001)""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("sum(share() by (k))", """round(sum(share((
			label_set(time()/100+10, "k", "v1"),
			label_set(time()/200+5, "k", "v2", "a", "b"),
			label_set(time()/110-10, "k", "v1", "a", "b"),
			label_set(time()/90-5, "k", "v2"),
		)) by (k)), 0.001)""", Seq(R(null, null, Seq(2, 2, 2, 2, 2, 2)))),
    E("zscore()", """sort_by_label(round(zscore((
			label_set(time()/100+10, "k", "v1"),
			label_set(time()/200+5, "k", "v2"),
			label_set(time()/110-10, "k", "v3"),
			label_set(time()/90-5, "k", "v4"),
		)), 0.001), "k")""", Seq(R(null, Map("k" -> "v1"), Seq(1.482, 1.511, 1.535, 1.552, 1.564, 1.57)), R(null, Map("k" -> "v2"), Seq(0.159, 0.058, -0.042, -0.141, -0.237, -0.329)), R(null, Map("k" -> "v3"), Seq(-1.285, -1.275, -1.261, -1.242, -1.219, -1.193)), R(null, Map("k" -> "v4"), Seq(-0.356, -0.294, -0.232, -0.17, -0.108, -0.048)))),
    E("avg(scalar) without (xx, yy)", "avg without (xx, yy) (123)", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("histogram(scalar)", """sort(histogram(123)+(
			label_set(0, "le", "1.000e+02"),
			label_set(0, "le", "1.136e+02"),
			label_set(0, "le", "1.292e+02"),
			label_set(1, "le", "+Inf"),
		))""", Seq(R(null, Map("le" -> "1.136e+02"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("le" -> "1.292e+02"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("le" -> "+Inf"), Seq(2, 2, 2, 2, 2, 2)))),
    E("histogram(vector)", """sort(histogram((
			label_set(1, "foo", "bar"),
			label_set(1.1, "xx", "yy"),
			alias(1.15, "foobar"),
		))+(
			label_set(0, "le", "8.799e-01"),
			label_set(0, "le", "1.000e+00"),
			label_set(0, "le", "1.292e+00"),
			label_set(1, "le", "+Inf"),
		))""", Seq(R(null, Map("le" -> "8.799e-01"), Seq(0, 0, 0, 0, 0, 0)), R(null, Map("le" -> "1.000e+00"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("le" -> "1.292e+00"), Seq(3, 3, 3, 3, 3, 3)), R(null, Map("le" -> "+Inf"), Seq(4, 4, 4, 4, 4, 4)))),
    E("avg(scalar) wiTHout (xx, yy)", "avg wiTHout (xx, yy) (123)", Seq(R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("sum(time)", "sum(time()/100)", Seq(R(null, null, Seq(10, 12, 14, 16, 18, 20)))),
    E("geomean(time)", "geomean(time()/100)", Seq(R(null, null, Seq(10, 12, 14, 16, 18, 20)))),
    E("geomean_over_time(time)", """round(geomean_over_time(alias(time()/100, "foobar")[3i]), 0.1)""", Seq(R(null, null, Seq(7.8, 9.9, 11.9, 13.9, 15.9, 17.9)))),
    E("sum2(time)", "sum2(time()/100)", Seq(R(null, null, Seq(100, 144, 196, 256, 324, 400)))),
    E("sum2_over_time(time)", """sum2_over_time(alias(time()/100, "foobar")[3i])""", Seq(R(null, null, Seq(200, 308, 440, 596, 776, 980)))),
    E("range_over_time(time)", """range_over_time(alias(time()/100, "foobar")[3i])""", Seq(R(null, null, Seq(4, 4, 4, 4, 4, 4)))),
    E("sum(multi-vector)", """sum(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss"))""", Seq(R(null, null, Seq(20, 22, 24, 26, 28, 30)))),
    E("geomean(multi-vector)", """round(geomean(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss")), 0.1)""", Seq(R(null, null, Seq(10, 11, 11.8, 12.6, 13.4, 14.1)))),
    E("sum2(multi-vector)", """sum2(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss"))""", Seq(R(null, null, Seq(200, 244, 296, 356, 424, 500)))),
    E("sqrt(sum2(multi-vector))", """round(sqrt(sum2(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss"))))""", Seq(R(null, null, Seq(14, 16, 17, 19, 21, 22)))),
    E("avg(multi-vector)", """avg(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss"))""", Seq(R(null, null, Seq(10, 11, 12, 13, 14, 15)))),
    E("stddev(multi-vector)", """stddev(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss"))""", Seq(R(null, null, Seq(0, 1, 2, 3, 4, 5)))),
    E("count(multi-vector)", """count(label_set(time()<1500, "foo", "bar") or label_set(time()<1800, "baz", "sss"))""", Seq(R(null, null, Seq(2, 2, 2, 1, n, n)))),
    E("sum(multi-vector) by (known-tag)", """sort(sum(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss")) by (foo))""", Seq(R(null, null, Seq(10, 10, 10, 10, 10, 10)), R(null, null, Seq(10, 12, 14, 16, 18, 20)))),
    E("sum(multi-vector) by (known-tag) limit 1", """sum(label_set(10, "foo", "bar") or label_set(time()/100, "baz", "sss")) by (foo) limit 1""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("sum(multi-vector) by (known-tags)", """sum(label_set(10, "foo", "bar", "baz", "sss", "x", "y") or label_set(time()/100, "baz", "sss", "foo", "bar")) by (foo, baz, foo)""", Seq(R(null, Map("baz" -> "sss", "foo" -> "bar"), Seq(20, 22, 24, 26, 28, 30)))),
    E("sum(multi-vector) by (__name__)", """sort(sum(label_set(10, "__name__", "bar", "baz", "sss", "x", "y") or label_set(time()/100, "baz", "sss", "__name__", "aaa")) by (__name__))""", Seq(R(null, null, Seq(10, 10, 10, 10, 10, 10)), R(null, null, Seq(10, 12, 14, 16, 18, 20)))),
    E("min(multi-vector) by (unknown-tag)", """min(label_set(10, "foo", "bar") or label_set(time()/100/1.5, "baz", "sss")) by (unknowntag)""", Seq(R(null, null, Seq(6.666666666666667, 8, 9.333333333333334, 10, 10, 10)))),
    E("max(multi-vector) by (unknown-tag)", """max(label_set(10, "foo", "bar") or label_set(time()/100/1.5, "baz", "sss")) by (unknowntag)""", Seq(R(null, null, Seq(10, 10, 10, 10.666666666666666, 12, 13.333333333333334)))),
    E("equal-list", "time() == (100, 1000, 1400, 600)", Seq(R(null, null, Seq(1000, n, 1400, n, n, n)))),
    E("equal-list-reverse", "(100, 1000, 1400, 600) == time()", Seq(R(null, null, Seq(1000, n, 1400, n, n, n)))),
    E("not-equal-list", """alias(time(), "foobar") != UNIon(100, 1000, 1400, 600)""", Seq(R(null, null, Seq(n, 1200, n, 1600, 1800, 2000)))),
    E("not-equal-list-reverse", "(100, 1000, 1400, 600) != time()", Seq(R(null, null, Seq(n, 1200, n, 1600, 1800, 2000)))),
    E("quantiles_over_time(single_sample)", """sort_by_label(
			quantiles_over_time("phi", 0.5, 0.9,
				time()[100s:100s]
			),
			"phi",
		)""", Seq(R(null, Map("phi" -> "0.5"), Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, Map("phi" -> "0.9"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("duration_over_time", "duration_over_time((time()<1200)[600s:10s], 20s)", Seq(R(null, null, Seq(590, 580, 380, 180, n, n)))),
    E("limitk(-1)", """limitk(-1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq()),
    E("limitk(1)", """limitk(1, label_set(10, "foo", "bar") or label_set(time()/150, "xbaz", "sss"))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("limitk(10)", """sort(limitk(10, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("limitk(inf)", """sort(limitk(inf, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("any()", """any(label_set(10, "__name__", "x", "foo", "bar") or label_set(time()/150, "__name__", "y", "baz", "sss"))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("any(empty-series)", """any(label_set(time()<0, "foo", "bar"))""", Seq()),
    E("group() by (test)", """group((
			label_set(5, "__name__", "data", "test", "three samples", "point", "a"),
			label_set(6, "__name__", "data", "test", "three samples", "point", "b"),
			label_set(7, "__name__", "data", "test", "three samples", "point", "c"),
		)) by (test)""", Seq(R(null, Map("test" -> "three samples"), Seq(1, 1, 1, 1, 1, 1)))),
    E("group() without (point)", """group((
			label_set(5, "__name__", "data", "test", "three samples", "point", "a"),
			label_set(6, "__name__", "data", "test", "three samples", "point", "b"),
			label_set(7, "__name__", "data", "test", "three samples", "point", "c"),
		)) without (point)""", Seq(R(null, Map("test" -> "three samples"), Seq(1, 1, 1, 1, 1, 1)))),
    E("topk(-1)", """sort(topk(-1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq()),
    E("topk(1)", """topk(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, Map("baz" -> "sss"), Seq(n, n, n, 10.666666666666666, 12, 13.333333333333334)), R(null, Map("foo" -> "bar"), Seq(10, 10, 10, n, n, n)))),
    E("topk_min(1)", """sort(topk_min(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("bottomk_min(1)", """sort(bottomk_min(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("topk_max(1)", """topk_max(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("topk_max(1, remaining_sum)", """sort_desc(topk_max(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"), "remaining_sum=foo"))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)), R(null, Map("remaining_sum" -> "foo"), Seq(10, 10, 10, 10, 10, 10)))),
    E("topk_max(2, remaining_sum)", """sort_desc(topk_max(2, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"), "remaining_sum"))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)), R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("topk_max(3, remaining_sum)", """sort_desc(topk_max(3, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"), "remaining_sum"))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)), R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("bottomk_max(1)", """sort(bottomk_max(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("topk_avg(1)", """sort(topk_avg(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("bottomk_avg(1)", """sort(bottomk_avg(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("topk_median(1)", """sort(topk_median(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("topk_last(1)", """sort(topk_last(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("bottomk_median(1)", """sort(bottomk_median(1, label_set(10, "foo", "bar") or label_set(time()/15, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("bottomk_last(1)", """sort(bottomk_last(1, label_set(10, "foo", "bar") or label_set(time()/15, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)))),
    E("topk(1, nan_timeseries)", """topk(1, label_set(NaN, "foo", "bar") or label_set(time()/150, "baz", "sss")) default 0""", Seq(R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("topk(2)", """sort(topk(2, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("topk(NaN)", """sort(topk(NaN, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq()),
    E("topk(100500)", """sort(topk(100500, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("foo" -> "bar"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, 10.666666666666666, 12, 13.333333333333334)))),
    E("bottomk(1)", """bottomk(1, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss") or label_set(time()<100, "a", "b"))""", Seq(R(null, Map("foo" -> "bar"), Seq(n, n, n, 10, 10, 10)), R(null, Map("baz" -> "sss"), Seq(6.666666666666667, 8, 9.333333333333334, n, n, n)))),
    E("keep_last_value()", """keep_last_value(label_set(time() < 1300 default time() > 1700, "__name__", "foobar", "x", "y"))""", Seq(R(null, Map("x" -> "y"), Seq(1000, 1200, 1200, 1200, 1800, 2000)))),
    E("keep_next_value()", """keep_next_value(label_set(time() < 1300 default time() > 1700, "__name__", "foobar", "x", "y"))""", Seq(R(null, Map("x" -> "y"), Seq(1000, 1200, 1800, 1800, 1800, 2000)))),
    E("interpolate()", """interpolate(label_set(time() < 1300 default time() > 1700, "__name__", "foobar", "x", "y"))""", Seq(R(null, Map("x" -> "y"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("interpolate(tail)", "interpolate(time() < 1300)", Seq(R(null, null, Seq(1000, 1200, n, n, n, n)))),
    E("interpolate(head)", "interpolate(time() > 1500)", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("interpolate(tail_head_and_middle)", "interpolate(time() > 1100 and time() < 1300 default time() > 1700 and time() < 1900)", Seq(R(null, null, Seq(n, 1200, 1400, 1600, 1800, n)))),
    E("distinct_over_time([500s])", "distinct_over_time((time() < 1700)[500s])", Seq(R(null, null, Seq(3, 3, 3, 3, 2, 1)))),
    E("distinct_over_time([2.5i])", "distinct_over_time((time() < 1700)[2.5i])", Seq(R(null, null, Seq(3, 3, 3, 3, 2, 1)))),
    E("distinct()", """distinct(union(
			1+time() > 1100,
			label_set(time() > 1700, "foo", "bar"),
		))""", Seq(R(null, null, Seq(n, 1, 1, 1, 2, 2)))),
    E("vector2 if vector1", """(
			label_set(time()/10, "x", "y"),
			label_set(time(), "foo", "bar", "__name__", "x"),
		) if (
			label_set(time()>1400, "foo", "bar"),
		)""", Seq(R(null, Map("foo" -> "bar"), Seq(n, n, n, 1600, 1800, 2000)))),
    E("vector2 if vector2", """sort((
			label_set(time()/10, "x", "y"),
			label_set(time(), "foo", "bar", "__name__", "x"),
		) if (
			label_set(time()>1400, "foo", "bar"),
			label_set(time()<1400, "x", "y"),
		))""", Seq(R(null, Map("x" -> "y"), Seq(100, 120, n, n, n, n)), R(null, Map("foo" -> "bar"), Seq(n, n, n, 1600, 1800, 2000)))),
    E("scalar if vector1", """time() if (
			label_set(123, "foo", "bar"),
		)""", Seq()),
    E("scalar if vector2", """time() if (
			label_set(123, "foo", "bar"),
			alias(time() > 1400, "xxx"),
		)""", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)))),
    E("if-default", "time() if time() > 1400 default -time()", Seq(R(null, null, Seq(-1000, -1200, -1400, 1600, 1800, 2000)))),
    E("ifnot-default", "time() ifnot time() > 1400 default -time()", Seq(R(null, null, Seq(1000, 1200, 1400, -1600, -1800, -2000))))
  )

  private def entries5: Seq[E] = Seq(
    E("ifnot", "time() ifnot time() > 1400", Seq(R(null, null, Seq(1000, 1200, 1400, n, n, n)))),
    E("ifnot-no-matching-timeseries", """label_set(time(), "foo", "bar") ifnot label_set(time() > 1400, "x", "y")""", Seq(R(null, Map("foo" -> "bar"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("quantile(-2)", """quantile(-2, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, null, Seq(-inf, -inf, -inf, -inf, -inf, -inf)))),
    E("quantile(0.2)", """quantile(0.2, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, null, Seq(7.333333333333334, 8.4, 9.466666666666669, 10.133333333333333, 10.4, 10.666666666666668)))),
    E("quantile(0.5)", """quantile(0.5, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, null, Seq(8.333333333333334, 9, 9.666666666666668, 10.333333333333332, 11, 11.666666666666668)))),
    E("quantiles(\"phi\", 0.2, 0.5)", """sort(quantiles("phi", 0.2, 0.5, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""", Seq(R(null, Map("phi" -> "0.2"), Seq(7.333333333333334, 8.4, 9.466666666666669, 10.133333333333333, 10.4, 10.666666666666668)), R(null, Map("phi" -> "0.5"), Seq(8.333333333333334, 9, 9.666666666666668, 10.333333333333332, 11, 11.666666666666668)))),
    E("median()", """median(label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, null, Seq(8.333333333333334, 9, 9.666666666666668, 10.333333333333332, 11, 11.666666666666668)))),
    E("median(3-timeseries)", """median(union(label_set(10, "foo", "bar"), label_set(time()/150, "baz", "sss"), time()/200))""", Seq(R(null, null, Seq(6.666666666666667, 8, 9.333333333333334, 10, 10, 10)))),
    E("quantile(3)", """quantile(3, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq(R(null, null, Seq(inf, inf, inf, inf, inf, inf)))),
    E("quantile(NaN)", """quantile(NaN, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss"))""", Seq()),
    E("mad()", """mad(
			alias(time(), "metric1"),
			alias(time()*1.5, "metric2"),
			label_set(time()*0.9, "baz", "sss"),
		)""", Seq(R(null, null, Seq(100, 120, 140, 160, 180, 200)))),
    E("outliers_iqr()", """sort(outliers_iqr((
			alias(time(), "m1"),
			alias(time()*1.5, "m2"),
			alias(time()*10, "m3"),
			alias(time()*1.2, "m4"),
			alias(time()*0.1, "m5"),
		)))""", Seq(R(null, null, Seq(100, 120, 140, 160, 180, 200)), R(null, null, Seq(10000, 12000, 14000, 16000, 18000, 20000)))),
    E("outliers_mad(1)", """outliers_mad(1, (
			alias(time(), "metric1"),
			alias(time()*1.5, "metric2"),
			label_set(time()*0.9, "baz", "sss"),
		))""", Seq(R(null, null, Seq(1500, 1800, 2100, 2400, 2700, 3000)))),
    E("outliers_mad(5)", """outliers_mad(5, (
			alias(time(), "metric1"),
			alias(time()*1.5, "metric2"),
			label_set(time()*0.9, "baz", "sss"),
		))""", Seq()),
    E("outliersk(0)", """outliersk(0, (
			label_set(1300, "foo", "bar"),
			label_set(time(), "baz", "sss"),
		))""", Seq()),
    E("outliersk(1)", """outliersk(1, (
			label_set(2000, "foo", "bar"),
			label_set(time(), "baz", "sss"),
		))""", Seq(R(null, Map("baz" -> "sss"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("outliersk(3)", """sort_desc(outliersk(3, (
			label_set(1300, "foo", "bar"),
			label_set(time(), "baz", "sss"),
		)))""", Seq(R(null, Map("baz" -> "sss"), Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, Map("foo" -> "bar"), Seq(1300, 1300, 1300, 1300, 1300, 1300)))),
    E("range_trim_outliers()", "range_trim_outliers(0.5, time())", Seq(R(null, null, Seq(n, n, 1400, 1600, n, n)))),
    E("range_trim_outliers(time() > 1200)", "range_trim_outliers(0.5, time() > 1200)", Seq(R(null, null, Seq(n, n, n, 1600, 1800, n)))),
    E("range_trim_spikes()", "range_trim_spikes(0.2, time())", Seq(R(null, null, Seq(n, 1200, 1400, 1600, 1800, n)))),
    E("range_trim_spikes(time() > 1200 <= 1800)", "range_trim_spikes(0.2, time() > 1200 <= 1800)", Seq(R(null, null, Seq(n, n, n, 1600, n, n)))),
    E("range_trim_zscore()", "range_trim_zscore(0.9, time())", Seq(R(null, null, Seq(n, 1200, 1400, 1600, 1800, n)))),
    E("range_trim_zscore(time() > 1200 <= 1800)", "range_trim_zscore(0.9, time() > 1200 <= 1800)", Seq(R(null, null, Seq(n, n, n, 1600, n, n)))),
    E("range_zscore()", "round(range_zscore(time()), 0.1)", Seq(R(null, null, Seq(-1.5, -0.9, -0.3, 0.3, 0.9, 1.5)))),
    E("range_zscore(time() > 1200 < 1800)", "round(range_zscore(time() > 1200 < 1800), 0.1)", Seq(R(null, null, Seq(n, n, -1, 1, n, n)))),
    E("range_quantile(0.5)", "range_quantile(0.5, time())", Seq(R(null, null, Seq(1500, 1500, 1500, 1500, 1500, 1500)))),
    E("range_quantile(0.5, time() > 1200 < 2000)", "range_quantile(0.5, time() > 1200 < 2000)", Seq(R(null, null, Seq(1600, 1600, 1600, 1600, 1600, 1600)))),
    E("range_stddev()", "round(range_stddev(time()),0.01)", Seq(R(null, null, Seq(341.57, 341.57, 341.57, 341.57, 341.57, 341.57)))),
    E("range_stddev(time() > 1200 < 1800)", "round(range_stddev(time() > 1200 < 1800),0.01)", Seq(R(null, null, Seq(100, 100, 100, 100, 100, 100)))),
    E("range_stdvar()", "round(range_stdvar(time()),0.01)", Seq(R(null, null, Seq(116666.67, 116666.67, 116666.67, 116666.67, 116666.67, 116666.67)))),
    E("range_stdvar(time() > 1200 < 1800)", "round(range_stdvar(time() > 1200 < 1800),0.01)", Seq(R(null, null, Seq(10000, 10000, 10000, 10000, 10000, 10000)))),
    E("range_median()", "range_median(time())", Seq(R(null, null, Seq(1500, 1500, 1500, 1500, 1500, 1500)))),
    E("ttf(2000-time())", "ttf(2000-time())", Seq(R(null, null, Seq(1000, 866.6666666666666, 688.8888888888889, 496.2962962962963, 298.7654320987655, 99.58847736625516)))),
    E("ttf(1000-time())", "ttf(1000-time())", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("ttf(1500-time())", "ttf(1500-time())", Seq(R(null, null, Seq(500, 366.6666666666667, 188.8888888888889, 62.962962962962976, 20.987654320987662, 6.995884773662555)))),
    E("ru(time(), 2000)", "ru(time(), 2000)", Seq(R(null, null, Seq(50, 40, 30, 20, 10, 0)))),
    E("ru(time() offset 100s, 2000)", "ru(time() offset 100s, 2000)", Seq(R(null, null, Seq(60, 50, 40, 30, 20, 10)))),
    E("ru(time() offset 0.5i, 2000)", "ru(time() offset 0.5i, 2000)", Seq(R(null, null, Seq(60, 50, 40, 30, 20, 10)))),
    E("ru(time() offset 1i, 2000)", "ru(time() offset 1.5i, 2000)", Seq(R(null, null, Seq(70, 60, 50, 40, 30, 20)))),
    E("ru(time(), 1600)", "ru(time(), 1600)", Seq(R(null, null, Seq(37.5, 25, 12.5, 0, 0, 0)))),
    E("ru(1500-time(), 1000)", "ru(1500-time(), 1000)", Seq(R(null, null, Seq(50, 70, 90, 100, 100, 100)))),
    E("mode_over_time()", "mode_over_time(round(time()/500)[100s:1s])", Seq(R(null, null, Seq(2, 2, 3, 3, 4, 4)))),
    E("rate_over_sum()", "rate_over_sum(round(time()/500)[100s:5s])", Seq(R(null, null, Seq(0.4, 0.4, 0.6, 0.6, 0.71, 0.8)))),
    E("zscore_over_time(const)", "zscore_over_time(1[100s:10s])", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("integrate(1)", "integrate(1)", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("integrate(time())", "integrate(time()/1e3)", Seq(R(null, null, Seq(160, 200, 240, 280, 320, 360)))),
    E("rate(time())", """rate(label_set(alias(time(), "foo"), "x", "y"))""", Seq(R(null, Map("x" -> "y"), Seq(1, 1, 1, 1, 1, 1)))),
    E("rate(time()) keep_metric_names", """rate(label_set(alias(time(), "foo"), "x", "y")) keep_metric_names""", Seq(R(null, Map("x" -> "y"), Seq(1, 1, 1, 1, 1, 1)))),
    E("sum(rate(time()) keep_metric_names) by (__name__)", """sum(rate(label_set(alias(time(), "foo"), "x", "y")) keep_metric_names) by (__name__)""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("rate(2000-time())", "rate(2000-time())", Seq(R(null, null, Seq(5.5, 4.5, 3.5, 2.5, 1.5, 0.5)))),
    E("rate((2000-time())[100s])", "rate((2000-time())[100s])", Seq(R(null, null, Seq(5, 4, 3, 2, 1, 0)))),
    E("rate((2000-time())[100s:])", "rate((2000-time())[100s:])", Seq(R(null, null, Seq(5, 4, 3, 2, 1, 0)))),
    E("rate((2000-time())[100s:100s])", "rate((2000-time())[100s:100s])", Seq(R(null, null, Seq(0, 0, 6, 4, 2, 0)))),
    E("rate((2000-time())[100s:100s] offset 100s)", "rate((2000-time())[100s:100s] offset 100s)", Seq(R(null, null, Seq(0, 0, 7, 5, 3, 1)))),
    E("rate((2000-time())[100s:100s] offset 100s)[:] offset 100s", "rate((2000-time())[100s:100s] offset 100s)[:] offset 100s", Seq(R(null, null, Seq(0, 0, 0, 7, 5, 3)))),
    E("increase_pure(time())", "increase_pure(time())", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("increase(time())", "increase(time())", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("increase(2000-time())", "increase(2000-time())", Seq(R(null, null, Seq(1000, 800, 600, 400, 200, 0)))),
    E("increase_prometheus(time())", "increase_prometheus(time())", Seq()),
    E("increase_prometheus(time()[201s])", "increase_prometheus(time()[201s])", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("running_max(1)", "running_max(1)", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("running_min(abs(1500-time()))", "running_min(abs(1500-time()))", Seq(R(null, null, Seq(500, 300, 100, 100, 100, 100)))),
    E("running_min(abs(1500-time()) < 400 > 100)", "running_min(abs(1500-time()) < 400 > 100)", Seq(R(null, null, Seq(n, 300, 300, 300, 300, 300)))),
    E("running_max(abs(1300-time()))", "running_max(abs(1300-time()))", Seq(R(null, null, Seq(300, 300, 300, 300, 500, 700)))),
    E("running_max(abs(1300-time()) > 300 < 700)", "running_max(abs(1300-time()) > 300 < 700)", Seq(R(null, null, Seq(n, n, n, n, 500, 500)))),
    E("running_sum(1)", "running_sum(1)", Seq(R(null, null, Seq(1, 2, 3, 4, 5, 6)))),
    E("running_sum(time())", "running_sum(time()/1e3)", Seq(R(null, null, Seq(1, 2.2, 3.6, 5.2, 7, 9)))),
    E("running_sum(time() > 1.2 < 1.8)", "running_sum(time()/1e3 > 1.2 < 1.8)", Seq(R(null, null, Seq(n, n, 1.4, 3, 3, 3)))),
    E("running_avg(time())", "running_avg(time())", Seq(R(null, null, Seq(1000, 1100, 1200, 1300, 1400, 1500)))),
    E("running_avg(time() > 1200 < 1800)", "running_avg(time() > 1200 < 1800)", Seq(R(null, null, Seq(n, n, 1400, 1500, 1500, 1500)))),
    E("smooth_exponential(time(), 1)", "smooth_exponential(time(), 1)", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("smooth_exponential(time(), 0)", "smooth_exponential(time(), 0)", Seq(R(null, null, Seq(1000, 1000, 1000, 1000, 1000, 1000)))),
    E("smooth_exponential(time(), 0.5)", "smooth_exponential(time(), 0.5)", Seq(R(null, null, Seq(1000, 1100, 1250, 1425, 1612.5, 1806.25)))),
    E("remove_resets()", "remove_resets(abs(1500-time()))", Seq(R(null, null, Seq(500, 800, 900, 900, 1100, 1300)))),
    E("remove_resets(sum)", """remove_resets(sum(
			alias(time(), "full"),
			alias(time()/5 < 300, "partial"),
		))""", Seq(R(null, null, Seq(1200, 1440, 1680, 1680, 1880, 2080)))),
    E("range_avg(time())", "range_avg(time())", Seq(R(null, null, Seq(1500, 1500, 1500, 1500, 1500, 1500)))),
    E("range_min(time())", "range_min(time())", Seq(R(null, null, Seq(1000, 1000, 1000, 1000, 1000, 1000)))),
    E("range_min(time() > 1200 < 1800)", "range_min(time() > 1200 < 1800)", Seq(R(null, null, Seq(1400, 1400, 1400, 1400, 1400, 1400)))),
    E("range_normalize(time(),alias(-time(),\"negative\"))", """range_normalize(time(),alias(-time(), "negative"))""", Seq(R(null, null, Seq(0, 0.2, 0.4, 0.6, 0.8, 1)), R(null, null, Seq(1, 0.8, 0.6, 0.4, 0.2, 0)))),
    E("range_normalize(time() > 1200 < 1800,alias(-(time() > 1400 < 2000),\"negative\"))", """range_normalize(time() > 1200 < 1800,alias(-(time() > 1200 < 2000), "negative"))""", Seq(R(null, null, Seq(n, n, 0, 1, n, n)), R(null, null, Seq(n, n, 1, 0.5, 0, n))))
  )

  private def entries6: Seq[E] = Seq(
    E("range_first(time())", "range_first(time())", Seq(R(null, null, Seq(1000, 1000, 1000, 1000, 1000, 1000)))),
    E("range_first(time() > 1200 < 1800)", "range_first(time() > 1200 < 1800)", Seq(R(null, null, Seq(1400, 1400, 1400, 1400, 1400, 1400)))),
    E("range_mad(time())", "range_mad(time())", Seq(R(null, null, Seq(300, 300, 300, 300, 300, 300)))),
    E("range_mad(time() > 1200 < 1800)", "range_mad(time() > 1200 < 1800)", Seq(R(null, null, Seq(100, 100, 100, 100, 100, 100)))),
    E("range_max(time())", "range_max(time())", Seq(R(null, null, Seq(2000, 2000, 2000, 2000, 2000, 2000)))),
    E("range_max(time() > 1200 < 1800)", "range_max(time() > 1200 < 1800)", Seq(R(null, null, Seq(1600, 1600, 1600, 1600, 1600, 1600)))),
    E("range_sum(time())", "range_sum(time())", Seq(R(null, null, Seq(9000, 9000, 9000, 9000, 9000, 9000)))),
    E("range_sum(time() > 1200 < 1800)", "range_sum(time() > 1200 < 1800)", Seq(R(null, null, Seq(3000, 3000, 3000, 3000, 3000, 3000)))),
    E("range_last(time())", "range_last(time())", Seq(R(null, null, Seq(2000, 2000, 2000, 2000, 2000, 2000)))),
    E("range_last(time() > 1200 < 1800)", "range_last(time() > 1200 < 1800)", Seq(R(null, null, Seq(1600, 1600, 1600, 1600, 1600, 1600)))),
    E("range_linear_regression(time())", "range_linear_regression(time())", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("range_linear_regression(-time())", "range_linear_regression(-time())", Seq(R(null, null, Seq(-1000, -1200, -1400, -1600, -1800, -2000)))),
    E("range_linear_regression(time() > 1200 < 1800)", "range_linear_regression(time() > 1200 < 1800)", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("range_linear_regression(100/time())", """sort_desc(round((
				alias(range_linear_regression(100/time()), "regress"),
				alias(100/time(), "orig"),
			),
			0.001
		))""", Seq(R(null, null, Seq(0.1, 0.083, 0.071, 0.062, 0.056, 0.05)), R(null, null, Seq(0.095, 0.085, 0.075, 0.066, 0.056, 0.046)))),
    E("deriv(N)", "deriv(1000)", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("deriv(time())", "deriv(2*time())", Seq(R(null, null, Seq(2, 2, 2, 2, 2, 2)))),
    E("deriv(-time())", "deriv(-time())", Seq(R(null, null, Seq(-1, -1, -1, -1, -1, -1)))),
    E("delta(time())", "delta(time())", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("delta(delta(time()))", "delta(delta(2*time()))", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("delta(-time())", "delta(-time())", Seq(R(null, null, Seq(-200, -200, -200, -200, -200, -200)))),
    E("delta(1)", "delta(1)", Seq(R(null, null, Seq(0, 0, 0, 0, 0, 0)))),
    E("delta_prometheus(time())", "delta_prometheus(time())", Seq()),
    E("delta_prometheus(time()[201s])", "delta_prometheus(time()[201s])", Seq(R(null, null, Seq(200, 200, 200, 200, 200, 200)))),
    E("median_over_time(\"foo\")", """median_over_time("foo")""", Seq()),
    E("median_over_time(12)", "median_over_time(12)", Seq(R(null, null, Seq(12, 12, 12, 12, 12, 12)))),
    E("avg(aggr_over_time(multi-func))", """avg(aggr_over_time(("min_over_time", "max_over_time"), time()[:10s]))""", Seq(R(null, null, Seq(905, 1105, 1305, 1505, 1705, 1905)))),
    E("avg(aggr_over_time(multi-func)) by (rollup)", """sort(avg(aggr_over_time(("min_over_time", "max_over_time"), time()[:10s])) by (rollup))""", Seq(R(null, Map("rollup" -> "min_over_time"), Seq(810, 1010, 1210, 1410, 1610, 1810)), R(null, Map("rollup" -> "max_over_time"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("rollup_increase()", "sort(rollup_increase(time()))", Seq(R(null, Map("rollup" -> "min"), Seq(200, 200, 200, 200, 200, 200)), R(null, Map("rollup" -> "max"), Seq(200, 200, 200, 200, 200, 200)), R(null, Map("rollup" -> "avg"), Seq(200, 200, 200, 200, 200, 200)))),
    E("rollup_rate()", "rollup_rate((2200-time())[600s])", Seq(R(null, Map("rollup" -> "avg"), Seq(6, 5, 4, 3, 2, 1)), R(null, Map("rollup" -> "max"), Seq(7, 6, 5, 4, 3, 2)), R(null, Map("rollup" -> "min"), Seq(5, 4, 3, 2, 1, 0)))),
    E("rollup_rate(q, \"max\")", """rollup_rate((2200-time())[600s], "max")""", Seq(R(null, null, Seq(7, 6, 5, 4, 3, 2)))),
    E("rollup_rate(q, \"avg\")", """rollup_rate((2200-time())[600s], "avg")""", Seq(R(null, null, Seq(6, 5, 4, 3, 2, 1)))),
    E("rollup_scrape_interval()", """sort_by_label(rollup_scrape_interval(1[5m:10S]), "rollup")""", Seq(R(null, Map("rollup" -> "avg"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("rollup" -> "max"), Seq(10, 10, 10, 10, 10, 10)), R(null, Map("rollup" -> "min"), Seq(10, 10, 10, 10, 10, 10)))),
    E("rollup()", "sort(rollup(time()[:50s]))", Seq(R(null, Map("rollup" -> "min"), Seq(850, 1050, 1250, 1450, 1650, 1850)), R(null, Map("rollup" -> "avg"), Seq(925, 1125, 1325, 1525, 1725, 1925)), R(null, Map("rollup" -> "max"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("rollup_deriv()", "sort(rollup_deriv(time()[100s:50s]))", Seq(R(null, Map("rollup" -> "min"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("rollup" -> "max"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("rollup" -> "avg"), Seq(1, 1, 1, 1, 1, 1)))),
    E("rollup_deriv(q, \"max\")", """sort(rollup_deriv(time()[100s:50s], "max"))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("{}", "{}", Seq()),
    E("rate({}[:5s])", "rate({}[:5s])", Seq()),
    E("start()", "time() - start()", Seq(R(null, null, Seq(0, 200, 400, 600, 800, 1000)))),
    E("end()", "end() - time()", Seq(R(null, null, Seq(1000, 800, 600, 400, 200, 0)))),
    E("step()", "time() / step()", Seq(R(null, null, Seq(5, 6, 7, 8, 9, 10)))),
    E("lag()", "lag(time()[60s:17s])", Seq(R(null, null, Seq(14, 10, 6, 2, 15, 11)))),
    E("()", "()", Seq()),
    E("union()", "union()", Seq()),
    E("union(1)", "union(1)", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("(1)", "(1)", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("union(identical_labels)", """union(label_set(1, "foo", "bar"), label_set(2, "foo", "bar"))""", Seq(R(null, Map("foo" -> "bar"), Seq(1, 1, 1, 1, 1, 1)))),
    E("(identical_labels)", """(label_set(1, "foo", "bar"), label_set(2, "foo", "bar"))""", Seq(R(null, Map("foo" -> "bar"), Seq(1, 1, 1, 1, 1, 1)))),
    E("union(identical_labels_with_names)", """union(label_set(1, "foo", "bar", "__name__", "xx"), label_set(2, "__name__", "xx", "foo", "bar"))""", Seq(R(null, Map("foo" -> "bar"), Seq(1, 1, 1, 1, 1, 1)))),
    E("(identical_labels_with_names)", """(label_set(1, "foo", "bar", "__name__", "xx"), label_set(2, "__name__", "xx", "foo", "bar"))""", Seq(R(null, Map("foo" -> "bar"), Seq(1, 1, 1, 1, 1, 1)))),
    E("union(identical_labels_different_names)", """union(label_set(1, "foo", "bar", "__name__", "xx"), label_set(2, "__name__", "yy", "foo", "bar"))""", Seq(R(null, Map("foo" -> "bar"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("foo" -> "bar"), Seq(2, 2, 2, 2, 2, 2)))),
    E("(identical_labels_different_names)", """(label_set(1, "foo", "bar", "__name__", "xx"), label_set(2, "__name__", "yy", "foo", "bar"))""", Seq(R(null, Map("foo" -> "bar"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("foo" -> "bar"), Seq(2, 2, 2, 2, 2, 2)))),
    E("((1),(2,3))", """((
			alias(1, "x1"),
		),(
			alias(2, "x2"),
			alias(3, "x3"),
		))""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(2, 2, 2, 2, 2, 2)), R(null, null, Seq(3, 3, 3, 3, 3, 3)))),
    E("union(more-than-two)", """union(
			label_set(1, "foo", "bar", "__name__", "xx"),
			label_set(2, "__name__", "yy", "foo", "bar"),
			label_set(time(), "qwe", "123") or label_set(3, "__name__", "rt"))""", Seq(R(null, null, Seq(1000, 1200, 1400, 1600, 1800, 2000)), R(null, null, Seq(3, 3, 3, 3, 3, 3)), R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(2, 2, 2, 2, 2, 2)))),
    E("count_values_big_numbers", """sort_by_label(
			count_values("xxx", (alias(772424014, "first"), alias(772424230, "second"))),
			"xxx"
		)""", Seq(R(null, Map("xxx" -> "772424014"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("xxx" -> "772424230"), Seq(1, 1, 1, 1, 1, 1)))),
    E("count_values", """count_values("xxx", label_set(10, "foo", "bar") or label_set(time()/100, "foo", "bar", "baz", "xx"))""", Seq(R(null, Map("xxx" -> "10"), Seq(2, 1, 1, 1, 1, 1)), R(null, Map("xxx" -> "12"), Seq(n, 1, n, n, n, n)), R(null, Map("xxx" -> "14"), Seq(n, n, 1, n, n, n)), R(null, Map("xxx" -> "16"), Seq(n, n, n, 1, n, n)), R(null, Map("xxx" -> "18"), Seq(n, n, n, n, 1, n)), R(null, Map("xxx" -> "20"), Seq(n, n, n, n, n, 1)))),
    E("count_values by (xxx)", """count_values("xxx", label_set(10, "foo", "bar", "xxx", "aaa") or label_set(floor(time()/600), "foo", "bar", "baz", "xx")) by (xxx)""", Seq(R(null, Map("xxx" -> "1"), Seq(1, n, n, n, n, n)), R(null, Map("xxx" -> "2"), Seq(n, 1, 1, 1, n, n)), R(null, Map("xxx" -> "3"), Seq(n, n, n, n, 1, 1)), R(null, Map("xxx" -> "10"), Seq(1, 1, 1, 1, 1, 1)))),
    E("count_values without (baz)", """count_values("xxx", label_set(floor(time()/600), "foo", "bar")) without (baz)""", Seq(R(null, Map("foo" -> "bar", "xxx" -> "1"), Seq(1, n, n, n, n, n)), R(null, Map("foo" -> "bar", "xxx" -> "2"), Seq(n, 1, 1, 1, n, n)), R(null, Map("foo" -> "bar", "xxx" -> "3"), Seq(n, n, n, n, 1, 1)))),
    E("result sorting", """(label_set(1, "instance", "localhost:1001", "type", "free"),
			label_set(1, "instance", "localhost:1001", "type", "buffers"),
			label_set(1, "instance", "localhost:1000", "type", "buffers"),
			label_set(1, "instance", "localhost:1000", "type", "free"),
		)""", Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(1, 1, 1, 1, 1, 1)), R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("no_sorting_for_or", """label_set(2, "foo", "bar") or label_set(1, "foo", "baz")""", Seq(R(null, Map("foo" -> "bar"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("foo" -> "baz"), Seq(1, 1, 1, 1, 1, 1)))),
    E("sort_by_label_numeric(multiple_labels_only_string)", """sort_by_label_numeric((
			label_set(1, "x", "b", "y", "aa"),
			label_set(2, "x", "a", "y", "aa"),
		), "y", "x")""", Seq(R(null, Map("x" -> "a", "y" -> "aa"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("x" -> "b", "y" -> "aa"), Seq(1, 1, 1, 1, 1, 1)))),
    E("sort_by_label_numeric(multiple_labels_numbers_special_chars)", """sort_by_label_numeric((
			label_set(1, "x", "1:0:2", "y", "1:0:1"),
			label_set(2, "x", "1:0:15", "y", "1:0:1"),
		), "x", "y")""", Seq(R(null, Map("x" -> "1:0:2", "y" -> "1:0:1"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("x" -> "1:0:15", "y" -> "1:0:1"), Seq(2, 2, 2, 2, 2, 2)))),
    E("sort_by_label_numeric_desc(multiple_labels_numbers_special_chars)", """sort_by_label_numeric_desc((
			label_set(1, "x", "1:0:2", "y", "1:0:1"),
			label_set(2, "x", "1:0:15", "y", "1:0:1"),
		), "x", "y")""", Seq(R(null, Map("x" -> "1:0:15", "y" -> "1:0:1"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("x" -> "1:0:2", "y" -> "1:0:1"), Seq(1, 1, 1, 1, 1, 1)))),
    E("limit_offset(5, 0, sort_by_label_numeric_desc(multiple_labels_numbers_special_chars, \"foo\"))", """limit_offset(5, 0, sort_by_label_numeric_desc((
                        label_set(3, "foo", "1:0:3"),
			label_set(4, "foo", "5:0:15"),
			label_set(1, "foo", "1:0:2"),
			label_set(5, "foo", "7:0:15"),
			label_set(7, "foo", "3:0:1"),
			label_set(6, "foo", "1:0:2"),
			label_set(8, "foo", "9:0:15")
                ), "foo"))""", Seq(R(null, Map("foo" -> "9:0:15"), Seq(8, 8, 8, 8, 8, 8)), R(null, Map("foo" -> "7:0:15"), Seq(5, 5, 5, 5, 5, 5)), R(null, Map("foo" -> "5:0:15"), Seq(4, 4, 4, 4, 4, 4)), R(null, Map("foo" -> "3:0:1"), Seq(7, 7, 7, 7, 7, 7)), R(null, Map("foo" -> "1:0:3"), Seq(3, 3, 3, 3, 3, 3)))),
    E("sort_by_label_numeric(alias_numbers_with_special_chars)", """sort_by_label_numeric((
			label_set(4, "a", "DS50:1/0/15"),
			label_set(1, "a", "DS50:1/0/0"),
			label_set(2, "a", "DS50:1/0/1"),
			label_set(3, "a", "DS50:1/0/2"),
		), "a")""", Seq(R(null, Map("a" -> "DS50:1/0/0"), Seq(1, 1, 1, 1, 1, 1)), R(null, Map("a" -> "DS50:1/0/1"), Seq(2, 2, 2, 2, 2, 2)), R(null, Map("a" -> "DS50:1/0/2"), Seq(3, 3, 3, 3, 3, 3)), R(null, Map("a" -> "DS50:1/0/15"), Seq(4, 4, 4, 4, 4, 4)))),
    E("nan^any", "(hour(time()*1e4) == 4)^1", Seq(R(null, null, Seq(n, n, n, 4, n, n)))),
    E("nan or on() series", """(label_set(1, "a", "a", "b", "b1") == 0) or on(a) label_set(2, "a", "a", "b", "b2")""", Seq(R(null, Map("a" -> "a", "b" -> "b2"), Seq(2, 2, 2, 2, 2, 2)))),
    E("series with NaNs or scalar", """(label_set(time() >= 1600, "a", "a", "b", "b1")) or 1""", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)), R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
    E("series or on() scalar", """(label_set(time() > 1200, "a", "a", "b", "b1")) or on() vector(0)""", Seq(R(null, null, Seq(n, n, 1400, 1600, 1800, 2000)), R(null, null, Seq(0, 0, n, n, n, n)))),
    E("series or on() series", """(label_set(time() <= 1200, "a", "a", "b", "b1")) or on(a) label_set(time() > 1200, "a", "a", "b", "b2")""", Seq(R(null, Map("a" -> "a", "b" -> "b1"), Seq(1000, 1200, n, n, n, n)), R(null, Map("a" -> "a", "b" -> "b2"), Seq(n, n, 1400, 1600, 1800, 2000)))),
    E("series with no NaNs or on() series", """(label_set(time() < 3000, "a", "a", "b", "b1")) or on(a) label_set(time() > 3000, "a", "a", "b", "b2")""", Seq(R(null, Map("a" -> "a", "b" -> "b1"), Seq(1000, 1200, 1400, 1600, 1800, 2000)))),
    E("series or on() series with overlap", """(label_set(time() <= 1500, "a", "a", "b", "b1")) or on(a) label_set(time() > 1100, "a", "a", "b", "b2")""", Seq(R(null, Map("a" -> "a", "b" -> "b1"), Seq(1000, 1200, 1400, n, n, n)), R(null, Map("a" -> "a", "b" -> "b2"), Seq(n, n, n, 1600, 1800, 2000)))),
    E("series or on() series merge", """(label_set(time() <= 1200, "a", "a", "b", "b1")) or on(a) label_set(time() > 1400, "a", "a", "b", "b1")""", Seq(R(null, Map("a" -> "a", "b" -> "b1"), Seq(1000, 1200, n, 1600, 1800, 2000)))),
    E("scalar or timeseries", """time() > 1400 or label_set(123, "foo", "bar")""", Seq(R(null, null, Seq(n, n, n, 1600, 1800, 2000)), R(null, null, Seq(123, 123, 123, 123, 123, 123)))),
    E("series or many series", """(
			label_set(time()!=1200, "x", "foo"),
		) or on(x) (
			label_set(time()+1, "x", "foo", "y", "bar"),
			label_set(time()+2, "y", "baz", "x", "foo"),
		)""", Seq(R(null, Map("x" -> "foo"), Seq(1000, n, 1400, 1600, 1800, 2000)), R(null, Map("x" -> "foo", "y" -> "bar"), Seq(n, 1201, n, n, n, n)), R(null, Map("x" -> "foo", "y" -> "baz"), Seq(n, 1202, n, n, n, n)))),
    E("many series or series", """(
			label_set(time()!=1200, "x", "foo"),
			label_set(time()+1, "x", "foo", "y","baz"),
		) or on(x) (
			label_set(time()+2, "x", "foo", "y", "bar"),
		)""", Seq(R(null, Map("x" -> "foo"), Seq(1000, n, 1400, 1600, 1800, 2000)), R(null, Map("x" -> "foo", "y" -> "baz"), Seq(1001, 1201, 1401, 1601, 1801, 2001)))),
    E("many series or series with no merge", """(
			label_set(time()!=1400, "job", "a1", "a", "a"),
			label_set(time()>=1400, "job", "a2", "a", "a"),
		) or on(a) (
			label_set(time(), "job", "a3", "a", "a"),
			label_set(time(), "job", "a4", "a", "a"),
		)""", Seq(R(null, Map("a" -> "a", "job" -> "a1"), Seq(1000, 1200, n, 1600, 1800, 2000)), R(null, Map("a" -> "a", "job" -> "a2"), Seq(n, n, 1400, 1600, 1800, 2000)))),
    E("many series or series with merge", """(
			label_set(time()!=1400, "job", "a1", "a", "a"),
			label_set(time()>=1600, "job", "a2", "a", "a"),
		) or on(a) (
			label_set(time(), "job", "a3", "a", "a"),
			label_set(time(), "job", "a4", "a", "a"),
		)""", Seq(R(null, Map("a" -> "a", "job" -> "a1"), Seq(1000, 1200, n, 1600, 1800, 2000)), R(null, Map("a" -> "a", "job" -> "a2"), Seq(n, n, n, 1600, 1800, 2000)), R(null, Map("a" -> "a", "job" -> "a3"), Seq(n, n, 1400, n, n, n)), R(null, Map("a" -> "a", "job" -> "a4"), Seq(n, n, 1400, n, n, n))))
  )

  /** Round-5 slice: the TestExecSuccess subtests whose expected vectors do
    * NOT pin Go's seeded math/rand stream (exec_test.go). The 37 remaining
    * unported subtests (rand(0)/rand(1)-seeded vectors: stdvar_over_time(),
    * share_*_over_time, histogram_over_time buckets, rollup_candlestick,
    * hoeffding_bound_*, aggr_over_time, zscore_over_time(rand), …) assert
    * byte-exact outputs of Go's ALFG rngSource, whose 607-entry rngCooked
    * seed table is not reproducible here; our rand(seed) is deterministic
    * per (seed, timestamp) but a different stream — documented deviation in
    * SURVEY §8. Queries where the expectation is RNG-invariant (clamped to
    * 0, rounded below 0.5, or a sample-count identity like
    * sum(histogram_over_time) = #samples) ARE ported below.
    */
  private def entries7: Seq[E] = {
    val mib = 1.23 * (1 << 20)
    // the reference computes these with the test host's tzdata at
    // timestampsExpected[0] (exec_test.go timezone_offset subtests); do the
    // same so the vector tracks the environment like the Go test does
    val nyOff = java.util.TimeZone.getTimeZone("America/New_York").getOffset(1000000L) / 1000.0
    val locOff = java.util.TimeZone.getDefault.getOffset(1000000L) / 1000.0
    Seq(
      E("num-with-suffix-3", "1.23Mib", Seq(R(null, null, Seq.fill(6)(mib)))),
      E("num-with-suffix-4", "1.23mib", Seq(R(null, null, Seq.fill(6)(mib)))),
      E("timezone_offset(America/New_York)", """timezone_offset("America/New_York")""",
        Seq(R(null, null, Seq.fill(6)(nyOff)))),
      E("timezone_offset(Local)", """timezone_offset("Local")""",
        Seq(R(null, null, Seq.fill(6)(locOff)))),
      E("rand()", "round(rand()/2)", Seq(R(null, null, Seq.fill(6)(0.0)))),
      E("rand_normal()", "clamp_max(clamp_min(0, rand_normal()), 0)",
        Seq(R(null, null, Seq.fill(6)(0.0)))),
      E("rand_exponential()", "clamp_max(clamp_min(0, rand_exponential()), 0)",
        Seq(R(null, null, Seq.fill(6)(0.0)))),
      E("now()", "round(now()/now())", Seq(R(null, null, Seq.fill(6)(1.0)))),
      E("sin()", "sin(pi()*(2000-time())/1000)",
        Seq(R(null, null, Seq(1.2246467991473515e-16, 0.5877852522924732, 0.9510565162951536,
          0.9510565162951535, 0.5877852522924731, 0)))),
      E("prometheus_buckets(zero-vmrange-value)",
        """sort(prometheus_buckets(label_set(0, "vmrange", "0...0")))""", Seq()),
      E("""quantiles("phi", 0.2, 0.5)""",
        """sort(quantiles("phi", 0.2, 0.5, label_set(10, "foo", "bar") or label_set(time()/150, "baz", "sss")))""",
        Seq(
          R(null, M("phi" -> "0.2"), Seq(7.333333333333334, 8.4, 9.466666666666669,
            10.133333333333333, 10.4, 10.666666666666668)),
          R(null, M("phi" -> "0.5"), Seq(8.333333333333334, 9, 9.666666666666668,
            10.333333333333332, 11, 11.666666666666668)))),
      E("""range_normalize(time(),alias(-time(),"negative"))""",
        """range_normalize(time(),alias(-time(), "negative"))""",
        Seq(
          R(null, null, Seq(0, 0.2, 0.4, 0.6, 0.8, 1)),
          R("negative", M(), Seq(1, 0.8, 0.6, 0.4, 0.2, 0)))),
      E("""range_normalize(time() > 1200 < 1800,alias(-(time() > 1400 < 2000),"negative"))""",
        """range_normalize(time() > 1200 < 1800,alias(-(time() > 1200 < 2000), "negative"))""",
        Seq(
          R(null, null, Seq(n, n, 0, 1, n, n)),
          R("negative", M(), Seq(n, n, 1, 0.5, 0, n)))),
      E("""median_over_time("foo")""", """median_over_time("foo")""", Seq()),
      E("""rollup_rate(q, "max")""", """rollup_rate((2200-time())[600s], "max")""",
        Seq(R(null, null, Seq(7, 6, 5, 4, 3, 2)))),
      E("""rollup_rate(q, "avg")""", """rollup_rate((2200-time())[600s], "avg")""",
        Seq(R(null, null, Seq(6, 5, 4, 3, 2, 1)))),
      E("""rollup_deriv(q, "max")""", """sort(rollup_deriv(time()[100s:50s], "max"))""",
        Seq(R(null, null, Seq(1, 1, 1, 1, 1, 1)))),
      E("""limit_offset(5, 0, sort_by_label_numeric_desc(multiple_labels_numbers_special_chars, "foo"))""",
        """limit_offset(5, 0, sort_by_label_numeric_desc((
                        label_set(3, "foo", "1:0:3"),
			label_set(4, "foo", "5:0:15"),
			label_set(1, "foo", "1:0:2"),
			label_set(5, "foo", "7:0:15"),
			label_set(7, "foo", "3:0:1"),
			label_set(6, "foo", "1:0:2"),
			label_set(8, "foo", "9:0:15")
                ), "foo"))""",
        Seq(
          R(null, M("foo" -> "9:0:15"), Seq.fill(6)(8.0)),
          R(null, M("foo" -> "7:0:15"), Seq.fill(6)(5.0)),
          R(null, M("foo" -> "5:0:15"), Seq.fill(6)(4.0)),
          R(null, M("foo" -> "3:0:1"), Seq.fill(6)(7.0)),
          R(null, M("foo" -> "1:0:3"), Seq.fill(6)(3.0)))),
      E("""clamp_max(alias(time(),"foobar"), 1400)""",
        """clamp_max(alias(time(), "foobar"), 1400)""",
        Seq(R("foobar", M(), Seq(1000, 1200, 1400, 1400, 1400, 1400)))),
      E("""CLAmp_MAx(alias(time(),"foobar"), 1400)""",
        """CLAmp_MAx(alias(time(), "foobar"), 1400)""",
        Seq(R("foobar", M(), Seq(1000, 1200, 1400, 1400, 1400, 1400)))),
      E("sum(histogram_over_time)",
        """sum(histogram_over_time(alias(label_set(rand(0)*1.3+1.1, "foo", "bar"), "xxx")[200s:5s]))""",
        Seq(R(null, null, Seq.fill(6)(40.0)))),
      E("sum(Histogram_OVER_time)",
        """sum(Histogram_OVER_time(alias(label_set(rand(0)*1.3+1.1, "foo", "bar"), "xxx")[200s:5s]))""",
        Seq(R(null, null, Seq.fill(6)(40.0)))))
  }

  val entries: Seq[E] = entries0 ++ entries1 ++ entries2 ++ entries3 ++ entries4 ++ entries5 ++ entries6 ++ entries7

  val grid = GridSpec(1000000L, 2000000L, 200000L)
  private val gridTs = (0 to 5).map(i => 1000000L + i * 200000L)

  def emptySamples(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](),
      StructType(Seq(
        StructField("name", StringType),
        StructField("tags", MapType(StringType, StringType)),
        StructField("ts", LongType),
        StructField("value", DoubleType))))

  /** run one subtest; None = pass, Some(reason) = fail */
  def check(spark: SparkSession, e: E): Option[String] =
    try {
      val rows = Engine.query(emptySamples(spark), e.q, grid).collect()
      // per (name, tags) key: t → multiset of values. Distinct series CAN
      // share an identical label set (e.g. prometheus_buckets emits one
      // "+Inf" family per source group), so matching consumes values from
      // the shared pool instead of assuming key == series.
      val pool = scala.collection.mutable.Map.empty[
        (String, Map[String, String]),
        scala.collection.mutable.Map[Long, scala.collection.mutable.ArrayBuffer[Double]]]
      rows.foreach { r =>
        val key = (Option(r.getString(0)).getOrElse(""),
          Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty))
        pool.getOrElseUpdate(key, scala.collection.mutable.Map.empty)
          .getOrElseUpdate(r.getLong(2), scala.collection.mutable.ArrayBuffer.empty) +=
          r.getDouble(3)
      }
      val nSeries = pool.size
      if (e.rs.isEmpty) {
        if (rows.isEmpty) None else Some(s"expected empty, got ${rows.length} rows")
      } else {
        // greedy match: claim one got-series per expected result — by
        // tags/name when given, else by vector closeness. A NaN expected
        // point consumes nothing (absent row); the leftover check below
        // catches unclaimed rows.
        def claim(vals: Seq[Double],
            byT: scala.collection.mutable.Map[Long, scala.collection.mutable.ArrayBuffer[Double]]):
            Boolean = {
          val picks = gridTs.zip(vals).flatMap { case (t, ev) =>
            if (ev.isNaN) None
            else {
              val avail = byT.getOrElse(t, scala.collection.mutable.ArrayBuffer.empty)
              val i = avail.indexWhere(gv =>
                ev == gv || math.abs(ev - gv) <= math.abs(ev) * 1e-9 + 1e-9)
              if (i < 0) return false
              Some((t, i))
            }
          }
          // NaN-expected points must have no leftover candidate IF this
          // key holds exactly one series' worth of rows — skip that
          // strictness on shared keys (can't attribute rows to series)
          picks.foreach { case (t, i) => byT(t).remove(i) }
          true
        }
        val errs = e.rs.flatMap { r =>
          val hit = pool.exists { case ((nm2, tg), byT) =>
            val keyOk = r.tags == null || (tg == r.tags && (r.name == null || nm2 == r.name))
            keyOk && claim(r.vals, byT)
          }
          if (hit) Nil
          else Seq(s"no series matching tags=${r.tags} name=${r.name} vals=${r.vals}")
        }
        val leftover = pool.valuesIterator.map(_.valuesIterator.map(_.size).sum).sum
        if (errs.nonEmpty) Some(errs.take(2).mkString("; "))
        else if (leftover > 0)
          Some(s"$leftover unclaimed rows across $nSeries keys (extra series?), want ${e.rs.size} series")
        else None
      }
    } catch { case ex: Throwable => Some("EXC " + String.valueOf(ex.getMessage).take(160)) }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional filter: substrings of subtest names (faster local iteration)
    val wanted = args.toSeq
    val selected =
      if (wanted.isEmpty) entries
      else entries.filter(e => wanted.exists(w => e.nm.contains(w)))
    var pass = 0; var fail = 0
    selected.foreach { e =>
      check(spark, e) match {
        case None => pass += 1; println(s"PASS ${e.nm}")
        case Some(msg) => fail += 1
          println(s"FAIL ${e.nm} :: ${e.q.replace('\n', ' ').take(80)} :: $msg")
      }
    }
    println(s"TOTAL pass=$pass fail=$fail")
    spark.stop()
  }
}
