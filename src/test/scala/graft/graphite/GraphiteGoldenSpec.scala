package graft.graphite

import graft.SparkSpec
import graft.tools.GraphiteGolden
import graft.tools.GraphiteGolden.{E, GS}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Graphite golden-corpus gate: the ported TestExecExprSuccess /
  * TestExecExprFailure subtests (tools/GraphiteGolden — eval_test.go
  * vectors verbatim) against an empty store on the reference's exact
  * evalConfig. Mirrors compareSeries: series matched by name; tags,
  * timestamps, pathExpression exact; values NaN-aware with 1e-9
  * relative epsilon.
  */
class GraphiteGoldenSpec extends SparkSpec {

  private lazy val emptyStore: DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("name", StringType),
        StructField("tags", MapType(StringType, StringType)),
        StructField("ts", LongType),
        StructField("value", DoubleType))))

  private def ctx: GraphiteCtx =
    GraphiteCtx(spark, emptyStore, 120000L, 210000L, 30000L,
      nowMs = 150000000L)

  /** compareSeries (eval_test.go:4078) */
  def check(e: E): Option[String] = {
    val rows =
      try {
        GraphiteEval.exec(ctx, e.q).df
          .select("sid", "name", "tags", "pathExpr", "t", "value")
          .collect()
      } catch {
        case ex: Exception => return Some(s"error: ${ex.getMessage}")
      }
    val got = rows.groupBy(_.getString(0)).map { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(4))
      val h = sorted.head
      GS(
        h.getString(1),
        Option(h.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty),
        h.getString(3),
        sorted.map(_.getLong(4)).toSeq,
        sorted.map(_.getDouble(5)).toSeq)
    }.toSeq
    if (got.size != e.exp.size)
      return Some(s"series count ${got.size} != ${e.exp.size}; got names " +
        got.map(_.name).sorted.mkString("[", ", ", "]"))
    val byName = e.exp.map(s => s.name -> s).toMap
    got.flatMap { s =>
      byName.get(s.name) match {
        case None => Some(s"unexpected series '${s.name}'")
        case Some(exp) =>
          if (s.tags != exp.tags)
            Some(s"'${s.name}' tags ${s.tags} != ${exp.tags}")
          else if (s.ts != exp.ts)
            Some(s"'${s.name}' ts ${s.ts.take(6)}.. != ${exp.ts.take(6)}..")
          else if (!equalFloats(s.vs, exp.vs))
            Some(s"'${s.name}' values ${s.vs.take(8)}.. != ${exp.vs.take(8)}..")
          else {
            val expPath = if (exp.pathExpr.nonEmpty) exp.pathExpr else exp.name
            if (s.pathExpr != expPath)
              Some(s"'${s.name}' pathExpr '${s.pathExpr}' != '$expPath'")
            else None
          }
      }
    }.headOption
  }

  private def equalFloats(a: Seq[Double], b: Seq[Double]): Boolean =
    a.size == b.size && a.zip(b).forall { case (x, y) =>
      (x.isNaN && y.isNaN) || x == y ||
        (!x.isNaN && !y.isNaN && math.abs(x - y) <= math.abs(x) / 1e9)
    }

  /** subtests pinned as known gaps (inapplicable or unimplemented);
    * entries may only be added alongside a newly ported subtest, never
    * to re-pin a regression
    */
  private val knownGaps: Set[String] = Set.empty

  test("ported TestExecExprSuccess corpus passes (minus pinned gaps)") {
    val active = GraphiteGolden.entries.filterNot(e => knownGaps(e.nm))
    assert(active.size >= 200, s"corpus shrank to ${active.size}")
    val failures = graft.TestPar.flatMapPar(active, 4)(e =>
      check(e).map(m => s"${e.nm} ${e.q}: $m"))
    assert(failures.isEmpty,
      s"${failures.size} golden subtests failed:\n${failures.take(15).mkString("\n")}")
  }

  /** failure-corpus queries that only error in the reference's test
    * harness because it has NO storage backend (any real metric fetch
    * fails there); an empty store legitimately returns empty series here
    */
  private val errEnvOnly: Set[String] = Set(
    "linearRegression(none.exist.metric)",
    "holtWintersForecast(none.exist.metric)",
    "holtWintersConfidenceBands(none.exist.metric)",
    "holtWintersAberration(none.exist.metric)")

  test("ported TestExecExprFailure corpus is rejected") {
    val accepted = graft.TestPar.flatMapPar(
      GraphiteGolden.errQueries.filterNot(errEnvOnly), 4) { q =>
      try {
        // errors may surface at parse, plan, or execution time
        GraphiteEval.exec(ctx, q).df.collect()
        Some(q)
      } catch { case _: Exception => None }
    }
    assert(accepted.isEmpty,
      s"${accepted.size} queries should error but ran:\n${accepted.take(15).mkString("\n")}")
  }
}
