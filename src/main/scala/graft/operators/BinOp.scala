package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Binary operators between two series sets — PromQL vector matching
  * (app/vmselect/promql/binary_op.go:15-43 registration; matching rules
  * binary_op.go:271-519 adjustBinaryOpTags/groupJoin).
  *
  * Both inputs are grid DataFrames (joinKeys…, t, value). `on(...)`
  * matching = the explicit join-key column list; `ignoring(...)` = project
  * those labels away before calling. Set ops match per (key, t) POINT, not
  * per whole series — exactly the reference's per-point presence logic
  * (binary_op.go:535 and, :588 or, :715 unless).
  */
object BinOp {

  /** The 7 arithmetic kernels (binary_op.go:16-24; scalar kernels
    * vendor/.../metricsql/binaryop/funcs.go).
    */
  val arith: Map[String, (Column, Column) => Column] = Map(
    "add" -> (_ + _),
    "sub" -> (_ - _),
    "mul" -> (_ * _),
    "div" -> (_ / _),
    // Go math.Mod = truncated remainder, sign of dividend — Spark's `%`
    // has the same semantics for doubles (binaryop/funcs.go `mod`).
    "mod" -> (_ % _),
    "pow" -> (pow(_, _)),
    "atan2" -> (atan2(_, _)))

  /** Inner equi-join on (keys, t): the default 1:1 vector match
    * (binary_op.go:271-393). Returns keys…, t, lv, rv.
    */
  def matched(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val l = left.withColumnRenamed("value", "lv")
    val r = right.withColumnRenamed("value", "rv")
    l.join(r, keys :+ "t")
  }

  /** Apply an arithmetic/comparison op after matching. */
  def apply2(left: DataFrame, right: DataFrame, keys: Seq[String], f: (Column, Column) => Column,
      out: String = "value"): DataFrame =
    matched(left, right, keys).withColumn(out, f(col("lv"), col("rv")))

  /** Comparison without `bool` modifier: FILTER — keep left points where
    * the comparison holds, value = left value (binary_op.go:136-153).
    */
  def cmpFilter(left: DataFrame, right: DataFrame, keys: Seq[String],
      f: (Column, Column) => Column): DataFrame =
    matched(left, right, keys)
      .filter(f(col("lv"), col("rv")))
      .withColumn("value", col("lv"))
      .drop("lv", "rv")

  /** Comparison with `bool` modifier: 0/1 result (binary_op.go:27-32). */
  def cmpBool(left: DataFrame, right: DataFrame, keys: Seq[String],
      f: (Column, Column) => Column): DataFrame =
    matched(left, right, keys)
      .withColumn("value", f(col("lv"), col("rv")).cast(DoubleType))
      .drop("lv", "rv")

  /** `and` — intersect: left points whose (keys, t) exists on the right
    * (binary_op.go:535). left-semi join: no right payload moves.
    */
  def and(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right.select((keys :+ "t").map(col): _*).distinct(), keys :+ "t", "left_semi")

  /** `unless` — except: left points with no right match (binary_op.go:715) */
  def unless(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right.select((keys :+ "t").map(col): _*).distinct(), keys :+ "t", "left_anti")

  /** `or` — union preferring left (binary_op.go:588): right points pass
    * only where the left has no point at that (keys, t).
    */
  def or(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = (keys :+ "t" :+ "value").map(col)
    val rOnly = right.join(left.select((keys :+ "t").map(col): _*).distinct(), keys :+ "t", "left_anti")
    left.select(cols: _*).unionByName(rOnly.select(cols: _*))
  }

  /** MetricsQL `if` / `ifnot` / `default` (binary_op.go:521,700,568):
    * if    = keep left only where right exists;
    * ifnot = keep left only where right does NOT exist;
    * default = left, gaps filled from right.
    */
  def ifOp(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    and(left, right, keys)
  def ifNot(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    unless(left, right, keys)
  def default(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val l = left.withColumnRenamed("value", "lv")
    val r = right.withColumnRenamed("value", "rv")
    l.join(r, keys :+ "t", "full_outer")
      .withColumn("value", coalesce(col("lv"), col("rv")))
      .drop("lv", "rv")
  }

  /** group_left: many-to-one join — the "one" (right) side may match many
    * left rows and contributes extra label columns
    * (binary_op.go:409 groupJoin). rightExtra columns are carried through.
    */
  def groupLeft(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      rightExtra: Seq[String],
      f: (Column, Column) => Column): DataFrame = {
    val r = right.select((on ++ rightExtra :+ "t").map(col) :+ col("value").as("rv"): _*)
    left
      .withColumnRenamed("value", "lv")
      .join(r, on :+ "t")
      .withColumn("value", f(col("lv"), col("rv")))
      .drop("lv", "rv")
  }

  /** fill_left/fill_right(v) — substitute a constant for a missing side
    * before the op (parser.go:518; binary_op.go:192-231): full-outer match
    * with coalesce on the filled side.
    */
  def withFill(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      fillLeft: Option[Double],
      fillRight: Option[Double],
      f: (Column, Column) => Column): DataFrame = {
    val l = left.withColumnRenamed("value", "lv")
    val r = right.withColumnRenamed("value", "rv")
    val joined = l.join(r, keys :+ "t", "full_outer")
    val lv = fillLeft.map(x => coalesce(col("lv"), lit(x))).getOrElse(col("lv"))
    val rv = fillRight.map(x => coalesce(col("rv"), lit(x))).getOrElse(col("rv"))
    joined
      .withColumn("value", f(lv, rv))
      .filter(col("value").isNotNull)
      .drop("lv", "rv")
  }
}
