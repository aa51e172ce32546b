package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Accumulates executor task RUN time vs CPU time for contention evidence the
  * between-query probes cannot collect: bursty external load lands BETWEEN
  * probe brackets (the round-7 series ran uniformly ~1.7× slower with
  * inflation estimates still under 2×), but it cannot hide from the queries
  * themselves — OS descheduling inflates a task's run clock while its CPU
  * clock keeps counting only actual cycles, so the per-query run/cpu ratio
  * rises with contention measured DURING the query.
  *
  * The ratio is shape-dependent (scan and spill stages legitimately wait on
  * I/O), so the comparable signal is the same query across runs, or a run's
  * ratios against a clean-box recording — not an absolute threshold.
  *
  * Listener delivery is asynchronous; snapshots taken right after a query may
  * attribute a trailing task or two to the next window. The probes and state
  * reset between queries give the bus time to drain, and the whole-run totals
  * are exact.
  */
final class TaskClock(spark: SparkSession) {
  private val runMs = new AtomicLong
  private val cpuMs = new AtomicLong
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
      val m = ev.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000L)
      }
    }
  })

  def snapshot(): (Long, Long) = (runMs.get, cpuMs.get)

  /** run/cpu of task time accumulated since `prev`; 0.0 when no CPU time was
    * recorded in the window (nothing ran, or metrics were unavailable). */
  def ratioSince(prev: (Long, Long)): Double = {
    val (r, c) = snapshot()
    val dr = r - prev._1
    val dc = c - prev._2
    if (dc <= 0L) 0.0 else dr.toDouble / dc.toDouble
  }
}
