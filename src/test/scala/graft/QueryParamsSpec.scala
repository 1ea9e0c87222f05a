package graft

import graft.lang.m3.M3QL
import graft.serve.{DateMath, QueryParams}

/** Mirrors the reference REST layer's parameter defaults and date-math
  * behavior (RestM3QLAction.java:56-140, BaseTSDBAction.java:48-55,
  * RestPromQLAction.java:290-327). */
class QueryParamsSpec extends SparkTestBase {
  private val now = 1704672000000L // 2024-01-08T00:00:00Z

  test("now and relative offsets") {
    assert(DateMath.parse("now", now) == now)
    assert(DateMath.parse("now-5m", now) == now - 5 * 60000L)
    assert(DateMath.parse("now-1h", now) == now - 3600000L)
    assert(DateMath.parse("now+30s", now) == now + 30000L)
    assert(DateMath.parse("now-7d", now) == now - 7 * 86400000L)
  }

  test("rounding") {
    val t = now + 3 * 3600000L + 25 * 60000L + 9000L // 03:25:09
    assert(DateMath.parse("now/d", t) == now)
    assert(DateMath.parse("now/h", t) == now + 3 * 3600000L)
    assert(DateMath.parse("now/m", t) == now + 3 * 3600000L + 25 * 60000L)
    assert(DateMath.parse("now-1d/d", t) == now - 86400000L)
  }

  test("anchors: epoch millis, ISO date, ISO datetime, || math") {
    assert(DateMath.parse("1704672000000", now) == now)
    assert(DateMath.parse("2024-01-08", now) == now)
    assert(DateMath.parse("2024-01-08T00:00:00", now) == now)
    assert(DateMath.parse("2024-01-08T00:00:00Z", now) == now)
    assert(DateMath.parse("2024-01-07||+1d", now) == now)
    assert(DateMath.parse("2024-01-08T06:30:00||/d", now) == now)
  }

  test("date formats win over epoch millis for year and month anchors") {
    // strict_date_optional_time is tried before epoch_millis
    val y2024 = 1704067200000L // 2024-01-01T00:00:00Z
    assert(DateMath.parse("2024", now) == y2024)
    assert(DateMath.parse("2024-01", now) == y2024)
    assert(DateMath.parse("2024||+7d", now) == now)
  }

  test("implicit count of 1") {
    assert(DateMath.parse("now-m", now) == now - 60000L)
  }

  test("invalid expressions throw") {
    intercept[IllegalArgumentException](DateMath.parse("not-a-date", now))
    intercept[IllegalArgumentException](DateMath.parse("now-5q", now))
    intercept[IllegalArgumentException](DateMath.parse("now/5d", now))
  }

  test("defaults match the reference: start now-5m, end now, step 10s") {
    val g = QueryParams("fetch name:x").grid(now)
    assert(g.startMs == now - 300000L)
    assert(g.endMs == now)
    assert(g.stepMs == 10000L)
  }

  test("start >= end rejected like RestM3QLAction") {
    val e = intercept[IllegalArgumentException](
      QueryParams("q", start = "now", end = "now-5m").grid(now))
    assert(e.getMessage.contains("start time must be before end time"))
  }

  test("instant query: a single evaluation point at `time`") {
    val grid = QueryParams.instant("q", "now-1h", now)
    assert(grid.startMs == now - 3600000L)
    assert(grid.numPoints == 1L)
    assert(grid.alignedEndMs == grid.startMs)
  }

  test("M3QL entry point resolves QueryParams to the evaluation grid") {
    val S = Some(_: Double)
    val N = Option.empty[Double]
    val fx = samplesDF(series("name:m,dc:a",
      Seq(S(1), S(2), S(3), S(4), S(5), S(6), S(7), S(8), S(9), S(10))))
    // the fixture grid is [60000, 660000) at 1m steps; express it as params
    val params = QueryParams("fetch name:m | scale 2",
      start = "60000", end = "660000", stepMs = 60000L)
    val df = M3QL.query(spark, fx, params, nowMs = 0L)
    assertSeries(df, Map("dc:a,name:m" ->
      Seq(S(2), S(4), S(6), S(8), S(10), S(12), S(14), S(16), S(18), S(20))))
  }

  test("explain returns the compiled plan instead of executing") {
    val fx = samplesDF(series("name:m,dc:a",
      Seq(Some(1.0), None, None, None, None, None, None, None, None, None)))
    val plan = M3QL.explain(spark, fx, g, "fetch name:m | sum dc")
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }
}
