package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric accumulator for `graft.Bench`: sums shuffle read/write,
  * spill, and input bytes across every task that completes between
  * `reset()` and `snapshot()`. With the listener bus flushed at the
  * boundaries (GraftCoreShims.waitListenerBusEmpty), the window is
  * exactly one benched query — turning SCALE.md's "shuffle-disciplined"
  * claims into per-query measured bytes in the full-fidelity bench
  * JSON. Single-JVM bench-only instrumentation; the engine itself never
  * reads these. */
final class BenchMetricsListener extends SparkListener {
  private val shufRead = new AtomicLong
  private val shufWrite = new AtomicLong
  private val spillDisk = new AtomicLong
  private val spillMem = new AtomicLong
  private val input = new AtomicLong
  private val execMs = new AtomicLong
  private val tasks = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillDisk.addAndGet(m.diskBytesSpilled)
      spillMem.addAndGet(m.memoryBytesSpilled)
      input.addAndGet(m.inputMetrics.bytesRead)
      execMs.addAndGet(m.executorRunTime)
      tasks.incrementAndGet()
    }
  }

  def reset(): Unit =
    Seq(shufRead, shufWrite, spillDisk, spillMem, input, execMs, tasks)
      .foreach(_.set(0L))

  /** (input, shuffleRead, shuffleWrite, spillMemory, spillDisk) bytes */
  def snapshot(): (Long, Long, Long, Long, Long) =
    (input.get, shufRead.get, shufWrite.get, spillMem.get, spillDisk.get)

  /** (sum executorRunTime ms, task count) for the window — the
    * driver-overhead attribution VERDICT r14 #1 asked for: a query
    * whose wall grows while (bytes, execMs, tasks) stay flat is
    * losing its time on the DRIVER (analysis/optimization/planning/
    * scheduling), not in data work — exactly the signature that
    * separates session pollution from a plan regression. */
  def execSnapshot(): (Long, Long) = (execMs.get, tasks.get)
}
