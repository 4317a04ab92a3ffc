package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent-job helper for corpus-style suites: hundreds of independent
  * tiny queries are planning-bound, and Spark happily runs concurrent jobs
  * from several driver threads (spark_optimization_guide §2.6) — the
  * per-query Catalyst/codegen work overlaps while the 4-core local session
  * interleaves the (tiny) task sets. Results keep input order; exceptions
  * propagate like a sequential run.
  */
object TestPar {
  def flatMapPar[A, B](xs: Seq[A], threads: Int)(f: A => Iterable[B]): Seq[B] = {
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.traverse(xs)(a => Future(f(a))), Duration.Inf).flatten.toSeq
    finally pool.shutdown()
  }
}
