package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only streaming telemetry: prints one `[state]` line per
  * state operator per micro-batch (rows held, bytes used) — the
  * evidence SCALE.md's streaming rows cite. Registered by class name
  * through `spark.sql.streaming.streamingQueryListeners` (Probe wires
  * it when `SPARK_GRAFT_STREAM_LISTENER` is set); session clones
  * inherit the conf, so the isolated state sessions the streaming
  * queries run in report without any hook in the query code itself.
  */
class StateMetricsListener extends StreamingQueryListener {
  import StreamingQueryListener._
  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    p.stateOperators.foreach { so =>
      println(s"[state] query=${p.name} batch=${p.batchId} " +
        s"op=${so.operatorName} rows=${so.numRowsTotal} " +
        s"updated=${so.numRowsUpdated} mem=${so.memoryUsedBytes}")
    }
  }
}
