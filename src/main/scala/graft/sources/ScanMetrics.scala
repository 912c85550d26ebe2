package graft.sources

import org.apache.spark.sql.connector.metric.{CustomSumMetric, CustomTaskMetric}

/** DSv2 custom scan metrics for the transport path — the observability a
  * 1000-executor deployment actually operates on: every `nats_scan` over a
  * live server reports its wire work into the Spark UI / listener bus,
  * aggregated across tasks by the engine (sum semantics).
  *
  *   - `fetch_rpcs`     — batched wire round-trips (DIRECT.GET batches,
  *                        consumer MSG.NEXT pulls, KV index pages, group
  *                        claims). THE number to watch: it should track
  *                        ceil(msgs/2048), and a regression here (e.g. a
  *                        filter that stopped being pushed) multiplies
  *                        server load long before wall time shows it.
  *   - `msgs_emitted`   — rows delivered to Spark after residual filters.
  *   - `msgs_filtered`  — rows fetched but dropped by residual ts/subject
  *                        re-checks; a high ratio vs emitted means the
  *                        server-side predicate (seq window, filter
  *                        subject) is not carrying its weight.
  *
  * Wired through the standard DSv2 seam: [[NatsTransportScan
  * .supportedCustomMetrics]] declares them, each reader reports via
  * `currentMetricsValues()`, Spark's accumulator plumbing does the rest —
  * no listener, no side channel. */
object ScanMetrics {
  final val FetchRpcs = "fetch_rpcs"
  final val MsgsEmitted = "msgs_emitted"
  final val MsgsFiltered = "msgs_filtered"

  final class FetchRpcsMetric extends CustomSumMetric {
    override def name(): String = FetchRpcs
    override def description(): String = "wire fetch round-trips"
  }
  final class MsgsEmittedMetric extends CustomSumMetric {
    override def name(): String = MsgsEmitted
    override def description(): String = "messages emitted to Spark"
  }
  final class MsgsFilteredMetric extends CustomSumMetric {
    override def name(): String = MsgsFiltered
    override def description(): String = "messages dropped by residual filters"
  }

  /** one task's current counters, in the shape `currentMetricsValues`
    * wants */
  def taskValues(rpcs: Long, emitted: Long,
                 filtered: Long): Array[CustomTaskMetric] = Array(
    new CustomTaskMetric { def name = FetchRpcs; def value = rpcs },
    new CustomTaskMetric { def name = MsgsEmitted; def value = emitted },
    new CustomTaskMetric { def name = MsgsFiltered; def value = filtered })
}
