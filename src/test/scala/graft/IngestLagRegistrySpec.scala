package graft

import graft.serve.IngestLag
import graft.serve.IngestLag.BatchLag

/** Bounds added when lag metering went default-on (r12): the ledger's
  * source map is LRU-bounded and auto-attached listeners cannot
  * accumulate. These are driver-memory contracts for long-lived sessions
  * ingesting to per-run table paths. */
class IngestLagRegistrySpec extends SparkTestBase {

  private def lag(src: String, batch: Long = 0L) =
    BatchLag(src, batch, rows = 1, minEventMs = 1000L, maxEventMs = 1000L,
      arrivalMs = 2000L, commitMs = 2500L, lagSumMs = 1000L)

  test("source registry evicts least-recently-RECORDED, never an active source") {
    val pre = "ilagreg:active"
    IngestLag.record(lag(pre))
    // churn MaxSources fresh sources, touching the active one between
    // batches — the way a production stream keeps recording while
    // per-run temp paths come and go
    for (i <- 0 until IngestLag.MaxSources) {
      IngestLag.record(lag(s"ilagreg:churn$i"))
      if (i % 16 == 0) IngestLag.record(lag(pre, batch = i + 1))
    }
    assert(IngestLag.batches(pre).nonEmpty,
      "an actively-recording source must survive arbitrary source churn")
    // the total stays bounded, and the evicted ones are the stale churners
    val live = (0 until IngestLag.MaxSources)
      .count(i => IngestLag.batches(s"ilagreg:churn$i").nonEmpty)
    assert(live < IngestLag.MaxSources,
      "older churn sources must have been evicted")
    assert(IngestLag.batches(s"ilagreg:churn${IngestLag.MaxSources - 1}").nonEmpty,
      "the most recent source is never the victim")
    // cleanup
    IngestLag.clear(pre)
    (0 until IngestLag.MaxSources).foreach(i => IngestLag.clear(s"ilagreg:churn$i"))
  }

  test("pending auto-listeners are capped per source; explicit attach is not") {
    val src = "ilagreg:pending"
    val before = spark.streams.listListeners().length
    // 10 writer-style auto attaches whose queries never start — the
    // failed-start retry-loop shape; only the newest 4 may remain pending
    val ls = (0 until 10).map(i =>
      IngestLag.attachListener(spark, s"never_starts_$i", src, autoDetach = true))
    val after = spark.streams.listListeners().length
    assert(after - before <= 4,
      s"pending auto-listeners must be capped, leaked ${after - before}")
    // explicit (non-auto) listeners are caller-managed and unaffected
    val explicit = IngestLag.attachListener(spark, "explicit_q", src)
    assert(spark.streams.listListeners().length == after + 1)
    // cleanup: detach whatever remains
    (ls :+ explicit).foreach(IngestLag.detachListener(spark, _))
    IngestLag.clear(src)
  }

  test("overflow auto-listeners matching an ACTIVE query adopt its runId " +
       "and detach when it terminates") {
    // r13 advice (medium): a listener attached AFTER its query's start
    // event fired can never see QueryStartedEvent, so before the adoption
    // fix an overflow listener kept-because-live had an empty `owned` set —
    // termination never detached it, leaving a permanent bus listener per
    // extra writer() build that double-records every progress event.
    val src = "ilagreg:liveadopt"
    val before = spark.streams.listListeners().length
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adopt").toString
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
      .writeStream.queryName("live_adopt_q").format("noop")
      .option("checkpointLocation", ckpt)
      .start()
    val ls =
      try {
        // 6 auto attaches AFTER start: 4 stay pending (cap), 2 overflow —
        // both match the active name, so both must be kept AND adopted
        val ls = (0 until 6).map(_ =>
          IngestLag.attachListener(spark, "live_adopt_q", src, autoDetach = true))
        assert(spark.streams.listListeners().length - before == 6,
          "listeners naming a live query must never be dropped from the bus")
        ls
      } finally q.stop()
    // the two ADOPTED listeners own the runId now — termination detaches
    // them (bus delivery is async: poll with a deadline)
    val deadline = System.currentTimeMillis() + 15000
    while (spark.streams.listListeners().length - before > 4 &&
           System.currentTimeMillis() < deadline) Thread.sleep(100)
    val leaked = spark.streams.listListeners().length - before
    assert(leaked <= 4,
      s"adopted overflow listeners must detach at termination, $leaked remain " +
        "(expected only the 4 capped pending ones)")
    ls.foreach(IngestLag.detachListener(spark, _))
    IngestLag.clear(src)
  }
}
