package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ported golden corpus: lib/protoparser/vmimport/parser_test.go
  * (TestRowsUnmarshalFailure / TestRowsUnmarshalSuccess) against
  * [[LineFormats.parseImportLine]]. Pure-JVM.
  */
class VmImportGoldenSpec extends AnyFunSuite {

  private case class R(tags: Map[String, String], values: Seq[Double],
      timestamps: Seq[Long])

  private def parse(s: String): Seq[R] =
    s.split("\n", -1).toSeq.flatMap(l => LineFormats.parseImportLine(l))
      .map(p => R(p.tags, p.values, p.timestamps))

  private def sameValues(a: Seq[Double], b: Seq[Double]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      x == y || (x.isNaN && y.isNaN)
    }

  test("failures: every invalid line parses to zero rows") {
    Seq(
      "", "\n", "foo\n", "123", "[1,3]", "{}", "[]", """{"foo":"bar"}""",
      // invalid metric
      """{"metric":123,"values":[1,2],"timestamps":[3,4]}""",
      """{"metric":[123],"values":[1,2],"timestamps":[3,4]}""",
      """{"metric":[],"values":[1,2],"timestamps":[3,4]}""",
      """{"metric":{},"values":[1,2],"timestamps":[3,4]}""",
      """{"metric":null,"values":[1,2],"timestamps":[3,4]}""",
      """{"values":[1,2],"timestamps":[3,4]}""",
      // invalid values
      """{"metric":{"foo":"bar"},"values":1,"timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"values":{"x":1},"timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"values":null,"timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"values":["foo"],"timestamps":[3]}""",
      """{"metric":{"foo":"bar"},"values":"null","timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"values":"NaN","timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"values":[["NaN"]],"timestamps":[3,4]}""",
      // invalid timestamps
      """{"metric":{"foo":"bar"},"values":[1,2],"timestamps":3}""",
      """{"metric":{"foo":"bar"},"values":[1,2],"timestamps":false}""",
      """{"metric":{"foo":"bar"},"values":[1,2],"timestamps":{}}""",
      """{"metric":{"foo":"bar"},"values":[1,2]}""",
      """{"metric":{"foo":"bar"},"values":[1,2],"timestamps":[1,"foo"]}""",
      // count mismatch
      """{"metric":{"foo":"bar"},"values":[],"timestamps":[]}""",
      """{"metric":{"foo":"bar"},"values":[],"timestamps":[1]}""",
      """{"metric":{"foo":"bar"},"values":[2],"timestamps":[]}""",
      """{"metric":{"foo":"bar"},"values":[2],"timestamps":[3,4]}""",
      """{"metric":{"foo":"bar"},"values":[2,3],"timestamps":[4]}""",
      // garbage after the line
      """{"metric":{"foo":"bar"},"values":[2],"timestamps":[4]}{}""")
      .foreach(s => assert(parse(s).isEmpty, s"expected zero rows for $s"))
  }

  test("single line with a single tag") {
    val got = parse("""{"metric":{"foo":"bar"},"values":[1.23],"timestamps":[456]}""")
    assert(got == Seq(R(Map("foo" -> "bar"), Seq(1.23), Seq(456L))))
  }

  test("bare Inf/NaN tokens, quoted words and nulls") {
    val got = parse("""{"metric":{"foo":"bar"},"values":[Inf, -Inf, "Infinity", "-Infinity", NaN, "NaN", null, "null", 1.2],"timestamps":[456, 789, 123, 0, 1, 42, 2, 3, 7]}""")
    assert(got.length == 1)
    val inf = Double.PositiveInfinity
    assert(sameValues(got.head.values,
      Seq(inf, -inf, inf, -inf, Double.NaN, Double.NaN, Double.NaN, Double.NaN, 1.2)))
    assert(got.head.timestamps == Seq(456L, 789L, 123L, 0L, 1L, 42L, 2L, 3L, 7L))
  }

  test("multiple tags, multiple lines, invalid middle line, no trailing newline") {
    val l1 = """{"metric":{"foo":"bar","baz":"xx"},"values":[1.23, -3.21],"timestamps" : [456,789]}"""
    val l2 = """{"metric":{"__name__":"xx"},"values":[34],"timestamps" : [11]}"""
    val exp = Seq(
      R(Map("foo" -> "bar", "baz" -> "xx"), Seq(1.23, -3.21), Seq(456L, 789L)),
      R(Map("__name__" -> "xx"), Seq(34.0), Seq(11L)))
    assert(parse(l1 + "\n" + l2 + "\n") == exp)
    assert(parse(l1 + "\ngarbage here\n" + l2) == exp)
    assert(parse(l1 + "\n" + l2) == exp)
  }
}
