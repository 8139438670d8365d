package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class PipelineSpec extends AnyFunSuite {

  test("runs tasks in dependency order") {
    val order = mutable.ListBuffer.empty[String]
    val run = new Pipeline(Seq(
      Task("c", deps = Seq("b"))(() => order += "c"),
      Task("a")(() => order += "a"),
      Task("b", deps = Seq("a"))(() => order += "b"))).run()
    assert(run.succeeded)
    assert(order.toList == List("a", "b", "c"))
  }

  test("retries a failing task once by default, then records the failure") {
    var attempts = 0
    val run = new Pipeline(Seq(
      Task("flaky")(() => { attempts += 1; sys.error("boom") }))).run()
    assert(attempts == 2)
    run.results("flaky") match {
      case TaskResult.Failed(_, n) => assert(n == 2)
      case r => fail(s"expected Failed, got $r")
    }
  }

  test("a retry that succeeds on the second attempt passes") {
    var attempts = 0
    val run = new Pipeline(Seq(
      Task("recovers")(() => { attempts += 1; if (attempts < 2) sys.error("x") })
    )).run()
    assert(run.succeeded && attempts == 2)
  }

  test("downstream of a failure is skipped; alwaysRun teardown still runs") {
    var teardownRan = false
    var gatedRan = false
    val run = new Pipeline(Seq(
      Task("job", retries = 0)(() => sys.error("job died")),
      Task("gated", deps = Seq("job"))(() => gatedRan = true),
      Task("teardown", deps = Seq("job"), alwaysRun = true)(() =>
        teardownRan = true))).run()
    assert(!gatedRan)
    assert(teardownRan)
    assert(run.skipped == Seq("gated"))
    assert(run.failed == Seq("job"))
  }

  test("async submit returns immediately; sensor surfaces the result") {
    val h = AsyncJob.submit { Thread.sleep(100); 42 }
    // submit must not block on the job
    val n = AsyncJob.awaitDone(h, pollMs = 10, timeoutMs = 5000)
    assert(n == 42)
    assert(h.isDone)
  }

  test("sensor rethrows the job's failure (gates the downstream DAG)") {
    val h = AsyncJob.submit[Int] { sys.error("job blew up") }
    val e = intercept[RuntimeException] {
      AsyncJob.awaitDone(h, pollMs = 5, timeoutMs = 5000)
    }
    assert(e.getMessage == "job blew up")
  }

  test("sensor times out on a stuck job") {
    val h = AsyncJob.submit { Thread.sleep(60000); 1 }
    intercept[IllegalStateException] {
      AsyncJob.awaitDone(h, pollMs = 5, timeoutMs = 100)
    }
  }

  test("submit+sensor inside a DAG: failed job skips downstream via sensor") {
    val handle = new java.util.concurrent.atomic.AtomicReference[JobHandle[Int]]()
    var loaded = false
    val run = new Pipeline(Seq(
      Task("submit_job")(() =>
        handle.set(AsyncJob.submit[Int] { sys.error("spark job failed") })),
      Task("job_sensor", deps = Seq("submit_job"), retries = 0)(() =>
        AsyncJob.awaitDone(handle.get(), 5, 5000)),
      Task("load", deps = Seq("job_sensor"))(() => loaded = true))).run()
    assert(run.failed == Seq("job_sensor"))
    assert(run.skipped == Seq("load"))
    assert(!loaded)
  }

  test("rejects unknown dependencies and cycles") {
    intercept[IllegalArgumentException] {
      new Pipeline(Seq(Task("a", deps = Seq("ghost"))(() => ())))
    }
    intercept[IllegalArgumentException] {
      new Pipeline(Seq(
        Task("a", deps = Seq("b"))(() => ()),
        Task("b", deps = Seq("a"))(() => ()))).run()
    }
  }
}
