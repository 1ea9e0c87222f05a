package graft

import graft.core.QueryGrid
import graft.stages.{Normalizer, SeriesSet}

class NormalizerSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  test("lcm/max common step") {
    assert(Normalizer.commonStep(Seq(60000L, 90000L), 3600000L) == 180000L)
    // LCM beyond range → MAX fallback
    assert(Normalizer.commonStep(Seq(60000L, 77000L), 200000L) == 77000L)
  }

  test("resample consolidates onto coarser grid") {
    val fine = samplesDF(series("name:a", Seq(S(1), S(2), S(3), S(4), S(5), S(6), N, N, N, N)))
    val coarse = QueryGrid(60000L, 60000L * 11, 120000L)  // 2m slots
    val out = toGolden(Normalizer.resample(fine, coarse, "avg"), coarse)
    assert(out("name:a").take(3) == Seq(S(1.5), S(3.5), S(5.5)))
    val sums = toGolden(Normalizer.resample(fine, coarse, "sum"), coarse)
    assert(sums("name:a").take(3) == Seq(S(3), S(7), S(11)))
    val lasts = toGolden(Normalizer.resample(fine, coarse, "last"), coarse)
    assert(lasts("name:a").take(3) == Seq(S(2), S(4), S(6)))
  }

  test("type-aware: counters sum, gauges average") {
    val df = samplesDF(
      series("name:c,type:counter", Seq(S(1), S(2), S(3), S(4), N, N, N, N, N, N)) ++
      series("name:g,type:gauge", Seq(S(1), S(2), S(3), S(4), N, N, N, N, N, N)))
    val coarse = QueryGrid(60000L, 60000L * 11, 120000L)
    val out = toGolden(Normalizer.resampleTypeAware(df, coarse), coarse)
    assert(out("name:c,type:counter").take(2) == Seq(S(3), S(7)))
    assert(out("name:g,type:gauge").take(2) == Seq(S(1.5), S(3.5)))
  }

  test("normalizePair aligns steps then binary op works") {
    val range = QueryGrid(60000L, 60000L * 11, 60000L)
    val fine = samplesDF(series("name:x,side:l", Seq(S(2), S(4), S(6), S(8), N, N, N, N, N, N)))
    val coarse = samplesDF(
      series("name:x,side:r", Seq(S(1), S(2), N, N, N, N, N, N, N, N),
        QueryGrid(60000L, 60000L * 11, 120000L)))
    val (l, r, target) = Normalizer.normalizePair(fine, 60000L, coarse, 120000L, range)
    assert(target.stepMs == 120000L)
    val divided = toGolden(SeriesSet.divide(l, r), target)
    // left avg per 2m slot: (2+4)/2=3, (6+8)/2=7 ; right: 1, 2 → 3, 3.5
    assert(divided.keySet.head.contains("type:ratios"))
    assert(divided.values.head.take(2) == Seq(S(3), S(3.5)))
  }
}
