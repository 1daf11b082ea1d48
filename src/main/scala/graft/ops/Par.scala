package graft.ops

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Bounded concurrent map for driver-orchestrated evaluation loops
  * (sensitivity grids, ablations, CV folds, learning-curve prefixes —
  * SURVEY.md M19–M23). Each element's body is an independent Spark job
  * tree (feature prep + a fit + a collect); running the bodies from a
  * small driver thread pool lets the scheduler overlap their jobs
  * instead of serializing whole fit pipelines end to end. On a
  * multi-executor cluster this is exactly "parallelize across
  * series/folds/grid-cells" — concurrent job submission from the
  * driver, tasks spread over the cluster.
  *
  * A fresh pool per call keeps nested uses (a grid cell evaluating CV
  * folds, each fold fitting a model) deadlock-free: outer and inner
  * levels never compete for the same fixed threads. Results keep input
  * order; the first failure propagates (unwrapped) after the pool is
  * shut down.
  */
object Par {

  /** Map `f` over `xs` with at most `parallelism` concurrent bodies. */
  def map[A, B](xs: Seq[A], parallelism: Int = 8)(f: A => B): Seq[B] = {
    if (xs.lengthCompare(1) <= 0 || parallelism <= 1) xs.map(f)
    else {
      val pool = Executors.newFixedThreadPool(math.min(xs.size, parallelism))
      // Submission lives inside the try: if submit itself throws mid-loop
      // (RejectedExecutionException, OOM), the catch still cancels what
      // made it in and shuts the pool down instead of leaking it.
      val futures = scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.Future[B]]
      try {
        xs.foreach { x =>
          futures += pool.submit(new Callable[B] { def call(): B = f(x) })
        }
        val out = futures.toSeq.map { fut =>
          try fut.get()
          catch { case e: ExecutionException => throw e.getCause }
        }
        pool.shutdown()
        out
      } catch {
        case t: Throwable =>
          // A failing cell stops the rest of the fan-out: cancel what
          // hasn't started, interrupt what has, and drop the pool — no
          // orphaned Spark job trees keep running in a leaked pool.
          futures.foreach(_.cancel(true))
          pool.shutdownNow()
          throw t
      }
    }
  }
}
