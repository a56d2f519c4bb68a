package graft.load

/** Dedicated bounded executor for DRIVER-SIDE metadata fan-outs —
  * parquet footer opens ([[FileZones]]), manifest/zone-map fetches,
  * batch-dir listings, vacuum deletes (r18, VERDICT r16 soft finding
  * #3): these previously ran as `parallelStream()` on the JVM-global
  * `ForkJoinPool.commonPool`, which (a) contends with any concurrent
  * caller of the same process-wide pool — a large compaction fold's
  * thousands of footer opens would starve every other common-pool user
  * — and (b) sizes itself to the machine's core count, not to what a
  * blocking-I/O metadata mix wants. One shared pool, capped at
  * min(16, cores), owns all of it; a parallel stream executes in the
  * ForkJoin pool that submits it, so the call sites keep their
  * one-line shape.
  *
  * Exception contract preserved: the first failure thrown by the body
  * propagates to the caller with its original type (unwrapped from the
  * pool's ExecutionException), exactly as the common-pool stream
  * propagated it. */
private[graft] object MetaPool {
  private val pool = new java.util.concurrent.ForkJoinPool(
    math.min(16, Runtime.getRuntime.availableProcessors()))

  def forEach[T](xs: Seq[T])(f: T => Unit): Unit = {
    import scala.jdk.CollectionConverters._
    try pool.submit(new Runnable {
      override def run(): Unit = xs.asJava.parallelStream().forEach(t => f(t))
    }).get()
    catch {
      case e: java.util.concurrent.ExecutionException
          if e.getCause != null => throw e.getCause
    }
  }
}
