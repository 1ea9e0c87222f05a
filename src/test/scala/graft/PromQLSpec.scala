package graft

import graft.lang.prom.PromQL

class PromQLSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  private def fx = samplesDF(
    series("name:req,dc:a", Seq(S(1), S(2), S(3), S(4), S(5), S(6), S(7), S(8), S(9), S(10))) ++
    series("name:req,dc:b", Seq(S(2), S(4), S(6), S(8), S(10), S(12), S(14), S(16), S(18), S(20))) ++
    series("name:mem,dc:a", Seq(S(5), S(4), S(3), S(2), S(1), S(2), S(3), S(4), S(5), S(6))))

  private def run(q: String) = PromQL.query(spark, fx, g, q)

  test("instant selector with matchers") {
    assertSeries(run("""req{dc="a"}"""),
      Map("dc:a,name:req" -> Seq(S(1), S(2), S(3), S(4), S(5), S(6), S(7), S(8), S(9), S(10))))
  }

  test("regex and negative matchers") {
    assertSeries(run("""req{dc=~"a|c"}"""),
      Map("dc:a,name:req" -> Seq(S(1), S(2), S(3), S(4), S(5), S(6), S(7), S(8), S(9), S(10))))
    assertSeries(run("""req{dc!="a"}"""),
      Map("dc:b,name:req" -> Seq(S(2), S(4), S(6), S(8), S(10), S(12), S(14), S(16), S(18), S(20))))
  }

  test("sum by (dc)") {
    assertSeries(run("""sum by (dc) (req)"""),
      Map("dc:a" -> Seq(S(1), S(2), S(3), S(4), S(5), S(6), S(7), S(8), S(9), S(10)),
          "dc:b" -> Seq(S(2), S(4), S(6), S(8), S(10), S(12), S(14), S(16), S(18), S(20))))
  }

  test("sum collapses") {
    assertSeries(run("""sum(req)"""),
      Map("" -> Seq(S(3), S(6), S(9), S(12), S(15), S(18), S(21), S(24), S(27), S(30))))
  }

  test("rate over monotonic counter") {
    // req dc:a increases by 1 per 60s → 1/60 per second everywhere after 1st pt
    val out = toGolden(run("""rate(req{dc="a"}[2m])"""))
    // decimal-exact smoothing quantizes at 1e-9 (OracleSafe parity)
    val vals = out("dc:a,name:req").flatten
    assert(vals.nonEmpty && vals.forall(v => math.abs(v - 1.0 / 60) < 1e-8))
  }

  test("increase scales rate by window") {
    val out = toGolden(run("""increase(req{dc="a"}[2m])"""))
    val vals = out("dc:a,name:req").flatten
    assert(vals.forall(v => math.abs(v - 2.0) < 1e-6))
  }

  test("avg_over_time window aggregate") {
    assertSeries(run("""avg_over_time(mem{dc="a"}[2m])"""),
      Map("dc:a,name:mem" -> Seq(S(5), S(4.5), S(4), S(3), S(2), S(5.0 / 3), S(2), S(3), S(4), S(5))))
  }

  test("scalar arithmetic on vector") {
    assertSeries(run("""mem{dc="a"} * 2"""),
      Map("dc:a,name:mem" -> Seq(S(10), S(8), S(6), S(4), S(2), S(4), S(6), S(8), S(10), S(12))))
  }

  test("math functions") {
    assertSeries(run("""sqrt(req{dc="b"})"""),
      Map("dc:b,name:req" ->
        Seq(2.0, 4, 6, 8, 10, 12, 14, 16, 18, 20).map(v => S(math.sqrt(v)))))
  }

  test("vector / vector division (single right series projects onto all)") {
    // right side is one series → match everything; Prometheus vector math
    // NEVER rewrites labels (no M3 type:ratios injection)
    val out = toGolden(run("""req{dc="a"} / mem{dc="a"}"""))
    assert(out.keySet == Set("dc:a,name:req"))
    assert(out("dc:a,name:req").head.contains(0.2))
  }

  test("vector * vector keeps the matched input labels untouched") {
    val out = toGolden(run("""req{dc="a"} * mem{dc="a"}"""))
    assert(out.keySet == Set("dc:a,name:req"))
    assert(out("dc:a,name:req").head.contains(5.0))   // 1 * 5
    assert(out("dc:a,name:req")(4).contains(5.0))     // 5 * 1
  }

  test("trailing input after a complete expression raises") {
    intercept[PromQL.PromParseError](PromQL.parse("""req{dc="a"} extra"""))
    intercept[PromQL.PromParseError](PromQL.parse("""req{dc="a"} ) extra"""))
  }

  test("without grouping modifier raises like the reference") {
    // ref: PromSourceBuilderVisitor.java:258-259
    intercept[UnsupportedOperationException](PromQL.parse("""sum without (mode) (req)"""))
  }

  test("vector subtraction emits points only where both sides exist") {
    // PromQL vector matching: no zero-fill of absent operands (unlike the M3
    // diff default) — a hole on either side means no output point
    val holes = samplesDF(
      series("name:a,dc:x", Seq(S(10), S(20), N, N, N, N, N, N, N, N)) ++
      series("name:b,dc:x", Seq(N, S(5), S(7), N, N, N, N, N, N, N)))
    val out = toGolden(PromQL.query(spark, holes, g, "a - b"))
    assert(out.values.head == Seq(N, S(15), N, N, N, N, N, N, N, N))
  }

  test("unimplemented prom function throws") {
    intercept[UnsupportedOperationException](run("""holt_winters(req[2m])"""))
  }
}
