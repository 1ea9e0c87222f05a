package graft

import graft.lang.m3.M3QL
import graft.stages.SeriesSet
import org.apache.spark.SparkException
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Reference-exact binary projection semantics
  * (AbstractBinaryProjectionStage + SubtractStage/DivideStage overrides). */
class BinaryProjectionSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  test("diff default zero-fills the absent side over the timestamp union") {
    // ref SubtractStage.processSampleValues: keepNans=false → null becomes 0.0
    val l = samplesDF(series("name:m,dc:a", Seq(S(10), S(20), N, N, N, N, N, N, N, N)))
    val r = samplesDF(series("name:e,dc:a", Seq(N, S(5), S(7), N, N, N, N, N, N, N)))
    assertSeries(SeriesSet.diff(l, r, Seq("dc")),
      Map("name:m,dc:a".split(",").sorted.mkString(",") ->
        Seq(S(10), S(15), S(-7), N, N, N, N, N, N, N)))
  }

  test("diff keepNans drops points where either side is absent") {
    val l = samplesDF(series("name:m,dc:a", Seq(S(10), S(20), N, N, N, N, N, N, N, N)))
    val r = samplesDF(series("name:e,dc:a", Seq(N, S(5), S(7), N, N, N, N, N, N, N)))
    assertSeries(SeriesSet.diff(l, r, Seq("dc"), keepNans = true),
      Map("dc:a,name:m" -> Seq(N, S(15), N, N, N, N, N, N, N, N)))
  }

  test("diff treats NaN samples as absent") {
    val l = samplesDF(series("name:m,dc:a",
      Seq(Some(Double.NaN), S(20), Some(Double.NaN), N, N, N, N, N, N, N)))
    val r = samplesDF(series("name:e,dc:a",
      Seq(S(5), S(5), Some(Double.NaN), N, N, N, N, N, N, N)))
    // ts0: left NaN→null, keepNans=false → 0-5; ts2: both NaN → no point
    assertSeries(SeriesSet.diff(l, r, Seq("dc")),
      Map("dc:a,name:m" -> Seq(S(-5), S(15), N, N, N, N, N, N, N, N)))
  }

  test("diff sums multiple right series sharing a match group") {
    // ref SubtractStage.mergeMatchingSeries: Double::sum per timestamp
    val l = samplesDF(
      series("name:m,dc:a", Seq(S(100), N, N, N, N, N, N, N, N, N)) ++
      series("name:m,dc:b", Seq(S(200), N, N, N, N, N, N, N, N, N)))
    val r = samplesDF(
      series("name:e1,dc:a", Seq(S(1), N, N, N, N, N, N, N, N, N)) ++
      series("name:e2,dc:a", Seq(S(2), N, N, N, N, N, N, N, N, N)) ++
      series("name:e3,dc:b", Seq(S(10), N, N, N, N, N, N, N, N, N)))
    assertSeries(SeriesSet.diff(l, r, Seq("dc")),
      Map("dc:a,name:m" -> Seq(S(97), N, N, N, N, N, N, N, N, N),
          "dc:b,name:m" -> Seq(S(190), N, N, N, N, N, N, N, N, N)))
  }

  test("diff with empty right operand yields empty output") {
    val l = samplesDF(series("name:m,dc:a", Seq(S(1), N, N, N, N, N, N, N, N, N)))
    val r = samplesDF(series("name:e,dc:a", Seq(S(1), N, N, N, N, N, N, N, N, N)))
      .where("value > 100")
    assert(SeriesSet.diff(l, r, Seq("dc")).count() == 0)
  }

  test("divide raises when a match group holds more than one divisor") {
    // ref DivideStage.mergeMatchingSeries: IllegalArgumentException
    val l = samplesDF(
      series("name:m,dc:a", Seq(S(1), N, N, N, N, N, N, N, N, N)) ++
      series("name:m,dc:b", Seq(S(1), N, N, N, N, N, N, N, N, N)))
    val r = samplesDF(
      series("name:e1,dc:a", Seq(S(1), N, N, N, N, N, N, N, N, N)) ++
      series("name:e2,dc:a", Seq(S(2), N, N, N, N, N, N, N, N, N)) ++
      series("name:e3,dc:b", Seq(S(3), N, N, N, N, N, N, N, N, N)))
    val e = intercept[Exception](SeriesSet.divide(l, r, Seq("dc")).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("must have exactly one divisor")),
      s"unexpected error: $e")
  }

  test("no-tag matching uses the common label keys of both operands") {
    // left series carry `host` which the right side lacks → common keys
    // across every series = {dc} (ref: extractCommonTagKeys /
    // Labels.findCommonLabelNames); full-label matching would pair nothing
    val l = samplesDF(
      series("dc:a,host:h1", Seq(S(10), N, N, N, N, N, N, N, N, N)) ++
      series("dc:b,host:h2", Seq(S(20), N, N, N, N, N, N, N, N, N)))
    val r = samplesDF(
      series("dc:a", Seq(S(2), N, N, N, N, N, N, N, N, N)) ++
      series("dc:b", Seq(S(4), N, N, N, N, N, N, N, N, N)))
    // common keys across every series = {dc}; full-label matching would match
    // nothing, common-key matching pairs dc:a with dc:a
    assertSeries(SeriesSet.divide(l, r),
      Map("dc:a,host:h1,type:ratios" -> Seq(S(5), N, N, N, N, N, N, N, N, N),
          "dc:b,host:h2,type:ratios" -> Seq(S(5), N, N, N, N, N, N, N, N, N)))
  }

  test("a single right series matches everything even when it lacks the key") {
    // ref process() right.size()==1 short-circuits BEFORE key extraction
    val l = samplesDF(series("name:m,dc:a", Seq(S(10), N, N, N, N, N, N, N, N, N)))
    val r = samplesDF(series("name:total", Seq(S(2), N, N, N, N, N, N, N, N, N)))
    assertSeries(SeriesSet.divide(l, r, Seq("dc")),
      Map("dc:a,name:m,type:ratios" -> Seq(S(5), N, N, N, N, N, N, N, N, N)))
  }

  test("a single right group projects left series that lack the key") {
    // ref processWithoutLabelMatching takes ALL left series, no key filter
    val l = samplesDF(
      series("name:m,dc:a", Seq(S(10), N, N, N, N, N, N, N, N, N)) ++
      series("name:m2", Seq(S(20), N, N, N, N, N, N, N, N, N))) // no dc
    val r = samplesDF(
      series("name:e1,dc:x", Seq(S(2), N, N, N, N, N, N, N, N, N)) ++
      series("name:e2,dc:x", Seq(N, S(9), N, N, N, N, N, N, N, N))) // same group
    assertSeries(SeriesSet.diff(l, r, Seq("dc")),
      Map("dc:a,name:m" -> Seq(S(8), S(-9), N, N, N, N, N, N, N, N),
          "name:m2"     -> Seq(S(18), S(-9), N, N, N, N, N, N, N, N)))
  }

  test("explicit-key matching drops series missing the key") {
    val l = samplesDF(
      series("name:m,dc:a", Seq(S(10), N, N, N, N, N, N, N, N, N)) ++
      series("name:m2", Seq(S(99), N, N, N, N, N, N, N, N, N))) // no dc → dropped
    val r = samplesDF(
      series("name:e,dc:a", Seq(S(2), N, N, N, N, N, N, N, N, N)) ++
      series("name:e,dc:b", Seq(S(4), N, N, N, N, N, N, N, N, N)))
    assertSeries(SeriesSet.divide(l, r, Seq("dc")),
      Map("dc:a,name:m,type:ratios" -> Seq(S(5), N, N, N, N, N, N, N, N, N)))
  }

  test("divideSeries is an alias of divide (ref M3ASTConverter:45,299)") {
    val fx = samplesDF(series("name:m,dc:a", Seq(S(4), S(6), N, N, N, N, N, N, N, N)))
    assertSeries(
      M3QL.query(spark, fx, g, "b = fetch name:m; fetch name:m | divideSeries(b)"),
      Map("dc:a,name:m,type:ratios" -> Seq(S(1), S(1), N, N, N, N, N, N, N, N)))
  }

  test("keepNans flag parses strictly through the language") {
    val fx = samplesDF(series("name:m,dc:a", Seq(S(1), S(2), N, N, N, N, N, N, N, N)))
    // boolean accepted
    assert(M3QL.query(spark, fx, g,
      "b = fetch name:m; fetch name:m | diff(b) true").count() > 0)
    // non-boolean first arg after the ref is an error (ref
    // M3ASTConverter.extractKeepNansParameter → parseBooleanStrict)
    val e = intercept[IllegalArgumentException](
      M3QL.query(spark, fx, g, "b = fetch name:m; fetch name:m | diff(b) dc"))
    assert(e.getMessage.contains("expects argument 1 of type bool"))
  }

  test("building a binary projection plan runs no Spark job (no driver probe)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    val l = samplesDF(series("name:m,dc:a", Seq(S(1), N, N, N, N, N, N, N, N, N)))
    val r = samplesDF(series("name:e,dc:a", Seq(S(2), N, N, N, N, N, N, N, N, N)))
    spark.sparkContext.addSparkListener(listener)
    try {
      SeriesSet.divide(l, r, Seq("dc"))
      SeriesSet.diff(l, r, Seq("dc"), keepNans = true)
      SeriesSet.asPercent(l, r, Seq("dc"))
      // plan construction is synchronous; a probe job would have fired its
      // listener event by the time the stages returned — allow a short drain
      Thread.sleep(500)
      assert(counter.get() == 0,
        s"plan construction launched ${counter.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
