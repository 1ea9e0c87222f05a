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
}
