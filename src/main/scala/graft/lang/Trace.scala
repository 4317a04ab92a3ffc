package graft.lang

/** Minimal query tracer — the engine's analogue of the reference's
  * `lib/querytracer` (tracer.go; spans
  * `{duration_msec, message, children}`), surfaced as the `"trace"` node
  * of /api/v1/query and /api/v1/query_range responses when `trace=1`.
  *
  * The reference traces its interpreter's evaluation recursion. This
  * engine's evaluation has two phases — Catalyst plan CONSTRUCTION
  * (Eval's recursion over the AST) and plan EXECUTION (one streamed
  * Spark job) — so the span tree mirrors that: one child per AST node
  * visited while the plan is built, then one span around execution. A
  * span message names the node exactly like the reference's
  * (`aggregate sum()`, `binary op "+"`, `rollup rate()`).
  *
  * Thread-local: the HTTP facade evaluates a request on one thread.
  * Tracing disabled (no root started) costs one ThreadLocal read per
  * AST node.
  */
object Trace {

  final class Span(val message: String) {
    private[Trace] val startNs: Long = System.nanoTime()
    private[Trace] var durationMsec: Double = 0.0
    private[Trace] val children = scala.collection.mutable.ArrayBuffer.empty[Span]

    def json: String = {
      val kids =
        if (children.isEmpty) ""
        else s""","children":[${children.map(_.json).mkString(",")}]"""
      s"""{"duration_msec":${graft.api.Json.num3(durationMsec)},""" +
        s""""message":${graft.api.Json.str(message)}$kids}"""
    }
  }

  private val current = new ThreadLocal[Span]

  /** open the root span and enable tracing on this thread */
  def begin(message: String): Span = {
    val root = new Span(message)
    current.set(root)
    root
  }

  /** finalize the root's duration and disable tracing on this thread */
  def end(root: Span): Span = {
    root.durationMsec = (System.nanoTime() - root.startNs) / 1e6
    current.remove()
    root
  }

  /** run `f` inside a child span; free when tracing is off (the message
    * thunk is never evaluated)
    */
  def child[T](message: => String)(f: => T): T = {
    val parent = current.get()
    if (parent == null) f
    else {
      val span = new Span(message)
      parent.children += span
      current.set(span)
      try f
      finally {
        span.durationMsec = (System.nanoTime() - span.startNs) / 1e6
        current.set(parent)
      }
    }
  }

  /** record a zero-duration message span (the reference's qt.Printf) */
  def printf(message: => String): Unit = {
    val parent = current.get()
    if (parent != null) parent.children += new Span(message)
  }
}
