package graft

import org.apache.spark.sql.functions._

/** SAX contract the oracle doesn't pin: shape semantics (a ramp maps to
  * a sorted word, a flat series to the deterministic all-'d' cell), word
  * length, and partition invariance. */
class SaxSpec extends SparkTestBase {

  private def series(vals: Seq[Double]) = {
    val rows = vals.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) }
    spark.createDataFrame(rows).toDF("user_id", "t", "x")
  }

  test("monotone ramp symbolizes to a non-decreasing word spanning a..d") {
    val w = graft.stages.SeriesStats.sax(series((1 to 64).map(_.toDouble)),
        word = 8)
      .collect().head.getString(1)
    assert(w.length == 8)
    assert(w.sorted == w, s"ramp word must be sorted: $w")
    assert(w.head == 'a' && w.last == 'd', s"ramp must span the alphabet: $w")
  }

  test("flat series maps to the deterministic all-'d' cell") {
    val w = graft.stages.SeriesStats.sax(series(Seq.fill(32)(5.0)), word = 4)
      .collect().head.getString(1)
    assert(w == "dddd", s"flat word $w")
  }

  test("short series emits one symbol per present segment") {
    // n=3 < word=8: segments floor(rank*8/3) hit 0,2,5 — three symbols
    val w = graft.stages.SeriesStats.sax(series(Seq(1.0, 2.0, 3.0)), word = 8)
      .collect().head.getString(1)
    assert(w.length == 3, s"short-series word $w")
  }

  test("sax words are partition-invariant") {
    val base = spark.range(200).select(
      (col("id") % 5).as("user_id"), (col("id") / 5).as("t"),
      (sin(col("id").cast("double") * 0.37) * 10.0 +
        (col("id") % 5).cast("double")).as("x"))
    def words(p: Int) =
      graft.stages.SeriesStats.sax(base.repartition(p), word = 8)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(words(1) == words(13))
  }
}
