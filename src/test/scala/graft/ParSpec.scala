package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the bounded concurrent map driving the harness
  * grids: result order, failure propagation, nested use (the deadlock
  * case a shared fixed pool would hit), and the degenerate sizes.
  */
class ParSpec extends AnyFunSuite {
  import graft.ops.Par

  test("results keep input order under concurrency") {
    val xs = 1 to 40
    val out = Par.map(xs, parallelism = 8) { x => Thread.sleep((x % 5) * 3L); x * 2 }
    assert(out == xs.map(_ * 2))
  }

  test("first failure propagates unwrapped") {
    val e = intercept[IllegalStateException] {
      Par.map(1 to 8, parallelism = 4) { x =>
        if (x == 5) throw new IllegalStateException("boom")
        x
      }
    }
    assert(e.getMessage == "boom")
  }

  test("failure cancels the remaining fan-out") {
    // After one body throws, queued bodies must not keep running in a
    // leaked pool. Deterministic shape: the first body fails instantly,
    // every other body BLOCKS on a gate until cancellation interrupts it
    // — so however slowly the main thread observes the failure, queued
    // bodies can never drain through the workers and inflate `started`.
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      intercept[IllegalStateException] {
        Par.map(1 to 64, parallelism = 2) { x =>
          started.incrementAndGet()
          if (x == 1) throw new IllegalStateException("boom")
          gate.await() // held until cancel(true)'s interrupt unblocks it
          x
        }
      }
      Thread.sleep(100L) // grace: anything leaked would start here
      // at most the 2 workers' in-flight bodies (plus the one each may
      // have dequeued before shutdownNow drained the queue) ever start
      assert(started.get() < 8,
        s"${started.get()} bodies ran despite an early failure — fan-out not cancelled")
    } finally gate.countDown()
  }

  test("nested maps complete (outer grid over inner folds)") {
    // a single shared fixed pool deadlocks here: outer bodies block on
    // inner futures that can never get a thread. Fresh pool per call must
    // complete.
    val out = Par.map(1 to 6, parallelism = 6) { cell =>
      Par.map(1 to 3, parallelism = 3)(fold => cell * 10 + fold).sum
    }
    assert(out == (1 to 6).map(c => (1 to 3).map(c * 10 + _).sum))
  }

  test("degenerate sizes run inline") {
    assert(Par.map(Seq.empty[Int])(_ * 2) == Seq.empty)
    assert(Par.map(Seq(7))(_ * 2) == Seq(14))
    assert(Par.map(1 to 4, parallelism = 1)(_ * 2) == Seq(2, 4, 6, 8))
  }
}
