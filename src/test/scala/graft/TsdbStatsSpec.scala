package graft

import graft.serve.TsdbStats

/** The /_tsdb/stats-equivalent surface (ref: RestTSDBStatsAction grouped and
  * flat response formats). */
class TsdbStatsSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  private def fx = samplesDF(
    series("name:req,dc:a", Seq(S(1), S(2), N, N, N, N, N, N, N, N)) ++
    series("name:req,dc:b", Seq(S(3), N, N, N, N, N, N, N, N, N)) ++
    series("name:mem,dc:a", Seq(S(4), S(5), S(6), N, N, N, N, N, N, N)))

  test("pair counts: one row per (label, value) with series counts") {
    val rows = TsdbStats.seriesCountByLabelValuePair(fx)
      .orderBy("label", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      ("dc", "a", 2L), ("dc", "b", 1L), ("name", "mem", 1L), ("name", "req", 2L)))
  }

  test("grouped render is valid JSON with headStats and per-label stats") {
    val json = TsdbStats.renderGrouped(fx)
    assert(json.contains(""""headStats":{"numSeries":3,"sampleCount":6"""))
    assert(json.contains(""""minTime":60000"""))
    assert(json.contains(""""dc":{"numSeries":3,"values":["a","b"]"""))
    assert(json.contains(""""valuesStats":{"a":2,"b":1}"""))
  }

  test("flat render carries the three sorted arrays") {
    val json = TsdbStats.renderFlat(fx)
    assert(json.contains(
      """"seriesCountByMetricName":[{"name":"req","value":2},{"name":"mem","value":1}]"""))
    assert(json.contains(""""labelValueCountByLabelName":["""))
    assert(json.contains("""{"name":"dc=a","value":2}"""))
  }

  test("lag-carrying renders append ingestionLag without disturbing the stats") {
    val src = "stats-spec-src"
    graft.serve.IngestLag.clear(src)
    graft.serve.IngestLag.record(graft.serve.IngestLag.BatchLag(
      src, batchId = 0, rows = 3, minEventMs = 1000L, maxEventMs = 3000L,
      arrivalMs = 61000L, commitMs = 61500L, lagSumMs = 177000L))
    for (json <- Seq(TsdbStats.renderGroupedWithLag(fx, src),
                     TsdbStats.renderFlatWithLag(fx, src))) {
      assert(json.contains(""""headStats":{"numSeries":3"""), json.take(120))
      assert(json.contains(""""ingestionLag":{"source":"stats-spec-src""""))
      assert(json.contains(""""maxCoordinatorLagMs":60000"""))
      assert(json.contains(""""maxAppendLagMs":60500"""))
      assert(json.contains(""""avgLagMs":59000"""))
      assert(json.contains(""""droppedBatches":0"""))
    }
    graft.serve.IngestLag.clear(src)
  }

  test("lag ring bounds state and counts evictions (the pendingDropped analogue)") {
    val src = "stats-spec-ring"
    graft.serve.IngestLag.clear(src)
    val n = graft.serve.IngestLag.MaxBatches + 7
    for (i <- 0 until n)
      graft.serve.IngestLag.record(graft.serve.IngestLag.BatchLag(
        src, batchId = i, rows = 1, minEventMs = 0L, maxEventMs = 0L,
        arrivalMs = 1000L + i, commitMs = 1000L + i, lagSumMs = 1000L + i))
    val bs = graft.serve.IngestLag.batches(src)
    assert(bs.size == graft.serve.IngestLag.MaxBatches, "ring must cap state")
    assert(bs.head.batchId == 7 && bs.last.batchId == n - 1, "newest retained")
    assert(graft.serve.IngestLag.dropped(src) == 7L)
    assert(graft.serve.IngestLag.render(src).contains(""""droppedBatches":7"""))
    graft.serve.IngestLag.clear(src)
    assert(graft.serve.IngestLag.dropped(src) == 0L, "clear resets the counter")
  }
}
