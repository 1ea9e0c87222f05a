package graft

import graft.core.QueryGrid
import graft.lang.m3.M3QL

/** Golden end-to-end cases through the full parse → compile → execute path,
  * modeled on the reference's golden_dataset_rest_it.yaml conventions
  * (null = absent sample; positional values on the query grid).
  */
class M3GoldenSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  private def fx = samplesDF(
    series("name:m,dc:a,test:t1", Seq(S(1), S(2), S(3), S(4), N, N, S(7), S(8), N, S(10))) ++
    series("name:m,dc:b,test:t1", Seq(S(10), S(20), N, S(40), S(50), N, S(70), N, N, S(100))) ++
    series("name:other,dc:a,test:t2", Seq(S(5), S(5), S(5), S(5), S(5), S(5), S(5), S(5), S(5), S(5))))

  private def run(q: String) = M3QL.query(spark, fx, g, q)

  test("fetch by label") {
    assertSeries(run("fetch test:t1 dc:a"),
      Map("dc:a,name:m,test:t1" -> Seq(S(1), S(2), S(3), S(4), N, N, S(7), S(8), N, S(10))))
  }

  test("fetch wildcard + negation") {
    assertSeries(run("fetch name:oth* dc:!b"),
      Map("dc:a,name:other,test:t2" -> Seq.fill(10)(S(5))))
  }

  test("sum collapses all series") {
    assertSeries(run("fetch name:m | sum"),
      Map("" -> Seq(S(11), S(22), S(3), S(44), S(50), N, S(77), S(8), N, S(110))))
  }

  test("sum by tag keeps grouped label only") {
    assertSeries(run("fetch test:t1 | sum dc"),
      Map("dc:a" -> Seq(S(1), S(2), S(3), S(4), N, N, S(7), S(8), N, S(10)),
          "dc:b" -> Seq(S(10), S(20), N, S(40), S(50), N, S(70), N, N, S(100))))
  }

  test("avg / min / max / count / range across series") {
    assertSeries(run("fetch test:t1 | avg"),
      Map("" -> Seq(S(5.5), S(11), S(3), S(22), S(50), N, S(38.5), S(8), N, S(55))))
    assertSeries(run("fetch test:t1 | max"),
      Map("" -> Seq(S(10), S(20), S(3), S(40), S(50), N, S(70), S(8), N, S(100))))
    // count = series cardinality as a dense constant series over the grid
    assertSeries(run("fetch test:t1 | count"),
      Map("" -> Seq.fill(10)(S(2))))
    assertSeries(run("fetch test:t1 | range"),
      Map("" -> Seq(S(9), S(18), S(0), S(36), S(0), N, S(63), S(0), N, S(90))))
  }

  test("mappers chain") {
    assertSeries(run("fetch test:t2 | scale 2 | offset 1 | sqrt"),
      Map("dc:a,name:other,test:t2" -> Seq.fill(10)(S(math.sqrt(11)))))
  }

  test("value filter sugar") {
    assertSeries(run("fetch test:t1 dc:a | > 4"),
      Map("dc:a,name:m,test:t1" -> Seq(N, N, N, N, N, N, S(7), S(8), N, S(10))))
  }

  test("derivative only at exact-step gaps") {
    assertSeries(run("fetch test:t1 dc:a | derivative"),
      Map("dc:a,name:m,test:t1" -> Seq(N, S(1), S(1), S(1), N, N, N, S(1), N, N)))
  }

  test("integral accumulates") {
    assertSeries(run("fetch test:t1 dc:a | integral"),
      Map("dc:a,name:m,test:t1" -> Seq(S(1), S(3), S(6), S(10), N, N, S(17), S(25), N, S(35))))
  }

  test("transformNull densifies to grid") {
    assertSeries(run("fetch test:t1 dc:a | transformNull 0"),
      Map("dc:a,name:m,test:t1" -> Seq(S(1), S(2), S(3), S(4), S(0), S(0), S(7), S(8), S(0), S(10))))
  }

  test("isNonNull flags presence") {
    assertSeries(run("fetch test:t1 dc:a | isNonNull"),
      Map("dc:a,name:m,test:t1" ->
        Seq(S(1), S(1), S(1), S(1), S(0), S(0), S(1), S(1), S(0), S(1))))
  }

  test("keepLastValue fills forward") {
    assertSeries(run("fetch test:t1 dc:a | keepLastValue"),
      Map("dc:a,name:m,test:t1" -> Seq(S(1), S(2), S(3), S(4), S(4), S(4), S(7), S(8), S(8), S(10))))
  }

  test("macro + binary divide (single right series matches all, adds type:ratios)") {
    assertSeries(run("b = fetch test:t2; fetch test:t1 dc:a | divide(b) dc"),
      Map("dc:a,name:m,test:t1,type:ratios" ->
        Seq(S(0.2), S(0.4), S(0.6), S(0.8), N, N, S(1.4), S(1.6), N, S(2))))
  }

  test("asPercent against macro") {
    assertSeries(run("b = fetch test:t1 dc:a; fetch test:t1 dc:a | asPercent(b)"),
      Map("dc:a,name:m,test:t1,type:ratios" ->
        Seq(S(100), S(100), S(100), S(100), N, N, S(100), S(100), N, S(100))))
  }

  test("inline sub-pipeline as binary argument") {
    assertSeries(run("fetch test:t1 dc:a | diff(fetch test:t1 dc:a)"),
      Map("dc:a,name:m,test:t1" ->
        Seq(S(0), S(0), S(0), S(0), N, N, S(0), S(0), N, S(0))))
  }

  test("percentileOfSeries uses M3 nearest-rank and __percentile label") {
    // at each ts: sorted values of the two t1 series; p50 rank=ceil(0.5*n)
    assertSeries(run("fetch test:t1 | percentileOfSeries 50"),
      Map("__percentile:50" ->
        Seq(S(1), S(2), S(3), S(4), S(50), N, S(7), S(8), N, S(10))))
  }

  test("topK picks highest-current series") {
    val out = run("fetch test:t1 | topK 1 current")
    assertSeries(out.drop("_rank"),
      Map("dc:b,name:m,test:t1" -> Seq(S(10), S(20), N, S(40), S(50), N, S(70), N, N, S(100))))
  }

  test("alias interpolation") {
    val out = run("fetch test:t2 | alias \"dc is {{.dc}}\"")
    assert(out.select("alias").distinct().collect().map(_.getString(0)).toSeq == Seq("dc is a"))
  }

  test("mapKey renames label") {
    assertSeries(run("fetch test:t2 | mapKey dc zone"),
      Map("name:other,test:t2,zone:a" -> Seq.fill(10)(S(5))))
  }

  test("unimplemented stage throws UnsupportedOperationException") {
    intercept[UnsupportedOperationException](run("fetch test:t1 | anomalies"))
  }

  test("unknown stage throws IllegalArgumentException") {
    intercept[IllegalArgumentException](run("fetch test:t1 | noSuchStage"))
  }

  test("moving average over time window") {
    // reference window is [t-2m, t) EXCLUSIVE of t: first grid point has an
    // empty window (nothing before it) → absent; rest see only 5s
    assertSeries(run("fetch test:t2 | movingAverage 2m"),
      Map("dc:a,name:other,test:t2" -> (N +: Seq.fill(9)(S(5)))))
  }

  test("timeshift widens scan then truncates") {
    // shift series forward 1m: value at t becomes value from t-1m
    assertSeries(run("fetch test:t1 dc:a | timeshift 1m"),
      Map("dc:a,name:m,test:t1" -> Seq(N, S(1), S(2), S(3), S(4), N, N, S(7), S(8), N)))
  }
}
