package graft.streaming

import java.util.concurrent.{Executors, TimeUnit}

/** Periodic producer stats reporting — the reference's StatInterval
  * surface (logspoutkinesis.go:155-161,170): the batch producer logs
  * its counters on a fixed cadence, independent of the flush cadence.
  *
  * Every `intervalSec` the reporter emits ONE line with the interval's
  * counter DELTAS (putAttempts/delivered/dropped since the last tick)
  * plus the running delivered total. The sink is injectable so tests
  * capture lines and production routes to any logger; default stdout,
  * like the reference's log.Println. Daemon-threaded, AutoCloseable;
  * [[ProducerPipeline.start]] ties its lifetime to the query. */
final class ProducerStatsReporter(
    streamName: String, intervalSec: Double,
    sink: String => Unit = line => println(line)) extends AutoCloseable {

  private final case class Snap(attempts: Long, delivered: Long, dropped: Long)
  @volatile private var last = Snap(0L, 0L, 0L)

  private val exec = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, s"graft-kinesis-stats-$streamName")
    t.setDaemon(true)
    t
  })

  def start(): ProducerStatsReporter = {
    val periodMs = math.max(1L, (intervalSec * 1000d).toLong)
    exec.scheduleAtFixedRate(() => tick(), periodMs, periodMs,
      TimeUnit.MILLISECONDS)
    this
  }

  /** One reporting tick (package-visible so specs can drive the cadence
    * deterministically instead of sleeping). */
  private[streaming] def tick(): Unit =
    try {
      val s = InMemoryKinesis.get(streamName)
      val now = Snap(s.putAttempts.get(), s.delivered.get(), s.dropped.get())
      val d = Snap(now.attempts - last.attempts,
        now.delivered - last.delivered, now.dropped - last.dropped)
      last = now
      sink(s"[graft-kinesis-stats] stream=$streamName" +
        s" putAttempts=${d.attempts} delivered=${d.delivered}" +
        s" dropped=${d.dropped} totalDelivered=${now.delivered}")
    } catch {
      case _: IllegalStateException => () // stream deleted; skip the tick
    }

  override def close(): Unit = { exec.shutdownNow(); () }
}
