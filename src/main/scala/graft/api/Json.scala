package graft.api

/** Shared JSON rendering primitives for the hand-rolled HTTP payloads —
  * one escape implementation instead of a copy per endpoint (a missed
  * control char in one copy is exactly how /api/v1/rules emitted invalid
  * JSON in round 5).
  */
object Json {

  /** escape for inclusion inside a JSON string literal */
  def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** quoted JSON string */
  def str(s: String): String = "\"" + esc(s) + "\""

  /** string map as a JSON object, keys sorted */
  def obj(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${str(k)}:${str(v)}" }
      .mkString("{", ",", "}")

  /** locale-independent fixed-point number (JSON numbers must use '.') */
  def num3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
}
