package graft

import graft.core.QueryGrid
import graft.lang.m3.M3QL

class MovingDebugSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  test("moving debug") {
    // replicate golden moving_avg: data on [00:00..00:06] at 1m, query [00:01, 00:07)
    val dataGrid = QueryGrid(0L, 7L * 60000L, 60000L)
    val fx = samplesDF(series("name:values,dc:dca1,test:moving_avg",
      Seq(S(1), S(5), S(3), S(8), S(2), S(6), S(4)), dataGrid))
    val qGrid = QueryGrid(60000L, 7L * 60000L, 60000L)
    val out = M3QL.query(spark, fx, qGrid, "fetch test:moving_avg | movingAverage 3m")
    out.orderBy("timestamp").show(20, false)
    val got = toGolden(out, qGrid)
    println(got)
    assert(got("dc:dca1,name:values,test:moving_avg") ==
      Seq(S(1), S(3), S(3), S(16.0 / 3), S(13.0 / 3), S(16.0 / 3)))
  }
}
