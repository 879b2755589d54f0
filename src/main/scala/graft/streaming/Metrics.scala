package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming metrics ≙ the reference's Prometheus registry
  * (`rlink/src/metrics/`): per-query input rows, processing rate, and
  * state size collected from the engine's progress events. Attach with
  * `spark.streams.addListener(new GraftMetricsListener)` and scrape
  * `snapshot` from any reporter.
  */
final case class QueryMetrics(
    name: String, batches: Long, inputRows: Long,
    stateRows: Long, lastRowsPerSec: Double)

final class GraftMetricsListener extends StreamingQueryListener {

  private val metrics = new ConcurrentHashMap[String, QueryMetrics]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    metrics.compute(name, (_, prev) => {
      val base = Option(prev).getOrElse(QueryMetrics(name, 0, 0, 0, 0.0))
      val state = p.stateOperators.map(_.numRowsTotal).sum
      QueryMetrics(name, base.batches + 1, base.inputRows + p.numInputRows,
        state, p.processedRowsPerSecond)
    })
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def snapshot: Map[String, QueryMetrics] = {
    import scala.jdk.CollectionConverters._
    metrics.asScala.toMap
  }
}
