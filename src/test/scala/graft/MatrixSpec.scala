package graft

import graft.serve.Matrix

class MatrixSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  test("matrix json matches reference response contract") {
    val df = samplesDF(
      series("name:m,dc:a", Seq(S(1.5), S(2), N, S(4))) ++
      series("name:m,dc:b", Seq(S(10), N, N, N)))
    val json = Matrix.render(df, g, includeMetadata = true)
    assert(json.startsWith("""{"status":"success","data":{"resultType":"matrix","result":["""))
    assert(json.contains(""""values":[[60,"1.5"],[120,"2"],[240,"4"]]"""))
    assert(json.contains(""""values":[[60,"10"]]"""))
    assert(json.contains(s""""step":${g.stepMs},"start":${g.startMs},"end":${g.endMs}"""))
    // metric map present with both labels
    assert(json.contains(""""dc":"a""""))
    // valid JSON (parse with the JVM's built-in javascript-ish check: rough)
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("alias column flows into the response") {
    val df = graft.stages.LabelOps.alias(
      samplesDF(series("name:m,dc:a", Seq(S(1)))), "hello {{.dc}}")
    val json = Matrix.render(df, g)
    assert(json.contains(""""alias":"hello a""""))
  }
}
