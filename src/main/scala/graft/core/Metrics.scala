package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Process-wide accumulator of executor task metrics (shuffle + spill bytes),
  * fed by a [[SparkListener]] registered once per SparkContext.
  *
  * Purpose: make performance drift ATTRIBUTABLE. A query whose wall time rises
  * while its shuffle/spill bytes stay flat is host noise; one whose spill
  * grows is a real regression. `Bench` snapshots around every timed run and
  * emits the deltas; `Dedup.clusterPairs` uses it for a per-round breakdown.
  *
  * Listener-bus delivery is asynchronous, so a snapshot taken immediately
  * after an action can miss that action's tail task events — [[settled]]
  * polls until two consecutive reads agree (or a deadline passes).
  */
object MetricsTap {

  /** Monotonic totals at one instant; subtract two for a per-region delta. */
  final case class Snap(shuffleRead: Long, shuffleWrite: Long,
                       memSpill: Long, diskSpill: Long) {
    def -(o: Snap): Snap = Snap(shuffleRead - o.shuffleRead,
      shuffleWrite - o.shuffleWrite, memSpill - o.memSpill, diskSpill - o.diskSpill)
    /** Bytes that crossed a shuffle boundary (read + write). */
    def shuffleBytes: Long = shuffleRead + shuffleWrite
    /** Bytes that left execution memory under pressure (in-memory + on-disk
      * spill sizes; disk > 0 is the signal that a host was memory-starved). */
    def spillBytes: Long = memSpill + diskSpill
  }

  private final class Tap extends SparkListener {
    val sr = new AtomicLong; val sw = new AtomicLong
    val ms = new AtomicLong; val ds = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        sr.addAndGet(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead)
        sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ms.addAndGet(m.memoryBytesSpilled)
        ds.addAndGet(m.diskBytesSpilled)
      }
    }
    def snap: Snap = Snap(sr.get, sw.get, ms.get, ds.get)
  }

  private val taps = new java.util.concurrent.ConcurrentHashMap[SparkContext, Tap]()
  private def tap(spark: SparkSession): Tap =
    taps.computeIfAbsent(spark.sparkContext, sc => {
      val t = new Tap; sc.addSparkListener(t); t
    })

  /** Current totals — may lag in-flight tasks; pair with [[settled]] at the
    * END of a measured region so the delta includes the region's tail. */
  def snapshot(spark: SparkSession): Snap = tap(spark).snap

  /** Totals after the listener bus has gone quiet: polls every 10ms until two
    * consecutive reads agree, bounded by `maxWaitMs`. */
  def settled(spark: SparkSession, maxWaitMs: Long = 300): Snap = {
    val t = tap(spark)
    val deadline = System.nanoTime + maxWaitMs * 1000000L
    var prev = t.snap
    while (System.nanoTime < deadline) {
      Thread.sleep(10)
      val cur = t.snap
      if (cur == prev) return cur
      prev = cur
    }
    prev
  }
}
