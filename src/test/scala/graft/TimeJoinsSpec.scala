package graft

import graft.stages.TimeJoins
import org.apache.spark.sql.functions._

class TimeJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    ("a", 100L, "p1"), ("a", 200L, "p2"), ("a", 50L, "p0"),
    ("b", 150L, "p3")).toDF("k", "ts", "tag")
  private def right = Seq(
    ("a", 90L, 1.0), ("a", 200L, 2.0), ("b", 160L, 3.0)).toDF("k", "ts", "v")

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val out = TimeJoins.asofJoin(left, right, Seq("k"))
      .select("k", "ts", "tag", "r_ts", "r_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("a", 50L, "p0", None, None),                // nothing at-or-before 50
      ("a", 100L, "p1", Some(90L), Some(1.0)),
      ("a", 200L, "p2", Some(200L), Some(2.0)),    // same-instant match included
      ("b", 150L, "p3", None, None)))              // b's only click is AFTER
  }

  test("asofJoin tolerance nulls out stale matches but keeps the left row") {
    val out = TimeJoins.asofJoin(left, right, Seq("k"), toleranceMs = Some(5L))
      .select("k", "ts", "r_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2))))
      .sortBy(t => (t._1, t._2)).toSeq
    // only the exact-instant (a,200) match is within 5ms; all lefts survive
    assert(out.map(_._3) == Seq(None, None, Some(200L), None))
  }

  test("asofJoin result does not depend on physical layout") {
    val shuffled = TimeJoins.asofJoin(left.repartition(7), right.repartition(5), Seq("k"))
      .select("k", "ts", "r_v").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).sortBy(t => (t._1, t._2)).toSeq
    assert(shuffled.map(_._3) == Seq(None, Some(1.0), Some(2.0), None))
  }

  test("asofJoin forward direction picks the earliest right at-or-after") {
    val out = TimeJoins.asofJoin(left, right, Seq("k"), forward = true)
      .select("k", "ts", "tag", "r_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("a", 50L, "p0", Some(90L)),     // nearest future right
      ("a", 100L, "p1", Some(200L)),
      ("a", 200L, "p2", Some(200L)),   // same-instant inclusive
      ("b", 150L, "p3", Some(160L))))
    // forward tolerance: only matches within 10ms survive
    val tol = TimeJoins.asofJoin(left, right, Seq("k"),
        toleranceMs = Some(10L), forward = true)
      .select("k", "ts", "r_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2))))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(tol.map(_._3) == Seq(None, None, Some(200L), Some(160L)))
  }

  test("asofJoin never backfills a NULL payload field from an older right row") {
    val l = Seq(("a", 30L)).toDF("k", "ts")
    val r = Seq(("a", 10L, Option(5.0)), ("a", 20L, Option.empty[Double]))
      .toDF("k", "ts", "v")
    // the match IS the ts=20 row; its v is NULL and must stay NULL — a
    // per-column carry would resurrect 5.0 from ts=10, a row that never
    // existed
    val row = TimeJoins.asofJoin(l, r, Seq("k")).select("r_ts", "r_v").collect().head
    assert(row.getLong(0) == 20L)
    assert(row.isNullAt(1))
  }

  test("rangeJoin equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(_ => ("k" + rnd.nextInt(4), rnd.nextLong(5000L), rnd.nextInt(1000)))
      .toDF("k", "ts", "id")
    val r = (1 to 300).map(_ => ("k" + rnd.nextInt(4), rnd.nextLong(5000L), rnd.nextDouble()))
      .toDF("k", "ts", "v")
    val w = 700L
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ts", "id", "r_ts", "r_v").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getInt(2), x.getLong(3), x.getDouble(4)))
        .toSeq.sorted
    val bucketed = canon(TimeJoins.rangeJoin(l, r, Seq("k"), w))
    val naive = canon(l.join(
      r.select(col("k"), col("ts").as("r_ts"), col("v").as("r_v")), Seq("k"))
      .where(col("r_ts") >= col("ts") - w && col("r_ts") <= col("ts")))
    assert(bucketed.nonEmpty && bucketed == naive)
  }

  test("rangeJoin emits every pair inside [t-w, t], bucket edges included") {
    // w=100. (a,50)→[-50,50]: none; (a,100)→[0,100]: a@90 (crosses the
    // bucket edge); (a,200)→[100,200]: a@200 (right-boundary inclusive);
    // (b,150)→[50,150]: b@160 is in the future — excluded.
    val out = TimeJoins.rangeJoin(left, right, Seq("k"), windowMs = 100L)
      .select("k", "ts", "tag", "r_ts", "r_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).sortBy(t => (t._1, t._2, t._4)).toSeq
    assert(out == Seq(
      ("a", 100L, "p1", 90L, 1.0),
      ("a", 200L, "p2", 200L, 2.0)))
  }

  test("funnel: cascade, window expiry, pre-entry steps, missing middle step") {
    val ev = Seq(
      // u1 completes in order within the window
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // u2: click BEFORE the first view never counts; the later one does
      (2L, "click", 50L), (2L, "view", 100L), (2L, "click", 150L),
      // u3: purchase with no click — a skipped middle step stops the cascade
      (3L, "view", 100L), (3L, "purchase", 200L),
      // u4: click outside the window of the first view
      (4L, "view", 100L), (4L, "click", 5000L),
      // u5 never enters the funnel (no view)
      (5L, "click", 100L), (5L, "purchase", 200L))
      .toDF("user_id", "event_type", "tm")
    val out = TimeJoins.funnel(ev, Seq("view", "click", "purchase"),
        windowMs = 1000L)
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4)))
      .toSeq
    assert(out == Seq(
      (1L, Some(100L), Some(200L), Some(300L), 3),
      (2L, Some(100L), Some(150L), None, 2),
      (3L, Some(100L), None, None, 1),
      (4L, Some(100L), None, None, 1)))
  }

  test("funnel: a step at exactly the window edge counts; reuse of one ts for two steps") {
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 1000L), (1L, "purchase", 1000L))
      .toDF("user_id", "event_type", "tm")
    val out = TimeJoins.funnel(ev, Seq("view", "click", "purchase"), 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    // click at t0+window is inside the closed window; purchase at the SAME
    // instant satisfies ts >= click (simultaneous step completion)
    assert(out == Seq((1L, 0L, 1000L, 1000L, 3)))
  }

  test("autocorrelation: perfect alternation gives acf(1) = -1, acf(2) = +1") {
    val ev = (0L until 10L).map(t => (1L, t, if (t % 2 == 0) 1.0 else -1.0))
      .toDF("user_id", "t", "x")
    val out = graft.stages.SeriesStats.autocorrelation(ev, maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getInt(1), r.getDouble(2))).toSeq
    // mean 0; lag-1 pairs all opposite-sign (9 of them / 10 squared terms),
    // lag-2 all same-sign (8/10)
    assert(out == Seq((1, -0.9), (2, 0.8)))
  }

  test("autocorrelation skips pairs across holes but keeps the full denominator") {
    // periods 0,1,3 — lag 1 pairs only (0,1); period 2 missing
    val ev = Seq((1L, 0L, 2.0), (1L, 1L, 4.0), (1L, 3L, 6.0))
      .toDF("user_id", "t", "x")
    val out = graft.stages.SeriesStats.autocorrelation(ev, maxLag = 1)
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toSeq
    // mean 4; centered (-2, 0, 2); num = (-2)(0) = 0; den = 8
    assert(out == Seq((1, 0.0)))
  }

  test("cusumChangePoint locates a clean level shift at the last low period") {
    // 5 periods at 0, then 5 at 10: |CUSUM| peaks at t=4
    val ev = (0L until 10L).map(t => (1L, t, if (t < 5) 0.0 else 10.0))
      .toDF("user_id", "t", "value")
    val out = graft.stages.SeriesStats.cusumChangePoint(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // scaled by N·1e9: 10·S_5 − 5·S_N = 0 − 5·50e9 = −2.5e11
    assert(out == Seq((1L, 4L, -2.5e11)))
  }

  test("seasonalDecompose recovers a linear trend + zero-sum weekly pattern") {
    // x = 10 + 0.5t + s(t mod 7), s sums to 0 over the 7 phases: the
    // centered 7-mean reproduces the linear part exactly (each phase
    // appears once per window), so seasonal == s and residual == 0 up to
    // the 1e-9 quantization grain
    val s7 = Array(3.0, -2.0, 1.0, 0.0, -1.0, 2.0, -3.0)
    val ev = (0L until 28L).map(t => (1L, t, 10.0 + 0.5 * t + s7((t % 7).toInt)))
      .toDF("user_id", "t", "x")
    val out = graft.stages.SeriesStats.seasonalDecompose(ev, period = 7)
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // trend defined on the interior t = 3..24
    assert(out.map(_._1).toSeq == (3L to 24L))
    out.foreach { case (t, trend, seasonal, resid) =>
      assert(math.abs(trend - (10.0 + 0.5 * t)) < 1e-8, s"t=$t trend=$trend")
      assert(math.abs(seasonal - s7((t % 7).toInt)) < 1e-8, s"t=$t s=$seasonal")
      assert(math.abs(resid) < 1e-8, s"t=$t resid=$resid")
    }
  }

  test("seasonalDecompose emits no trend rows across gaps") {
    // a missing period breaks every window that would span it
    val ev = ((0L until 10L) ++ (11L until 21L)).map(t => (1L, t, 1.0))
      .toDF("user_id", "t", "x")
    val ts = graft.stages.SeriesStats.seasonalDecompose(ev, period = 3)
      .collect().map(_.getLong(1)).toSet
    // windows centered at 9, 10 (absent), 11, 12 need t=10 — wait: period 3,
    // h=1: center 9 needs {8,9,10} → missing; 11 needs {10,11,12} → missing
    assert(!ts.contains(9L) && !ts.contains(11L) && !ts.contains(10L))
    assert(ts.contains(8L) && ts.contains(12L))
  }

  test("seasonalAnomalies flags a planted spike, stays silent on clean seasonality") {
    val s7 = Array(3.0, -2.0, 1.0, 0.0, -1.0, 2.0, -3.0)
    def x(t: Long, spike: Boolean) =
      10.0 + 0.5 * t + s7((t % 7).toInt) + (if (spike && t == 14L) 40.0 else 0.0)
    // user 1 clean, user 2 with a one-period spike at t=14
    val ev = (0L until 28L).flatMap(t =>
      Seq((1L, t, x(t, spike = false)), (2L, t, x(t, spike = true))))
      .toDF("user_id", "t", "x")
    val out = graft.stages.SeriesStats.seasonalAnomalies(ev, period = 7, z = 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // clean series: zero residual variance → filtered, nothing flagged
    assert(!out.exists(_._1 == 1L), out.mkString(","))
    // spiked series flags t=14 with a positive z
    val hit = out.filter(r => r._1 == 2L && r._2 == 14L)
    assert(hit.nonEmpty && hit.head._3 > 3.0, out.mkString(","))
  }

  test("robustTrend: Theil-Sen shrugs off an outlier that wrecks the mean slope") {
    // clean line slope 2 with one wild outlier at t=5
    val ev = (0L until 11L).map(t =>
      (1L, t, if (t == 5L) 1000.0 else 2.0 * t)).toDF("user_id", "t", "x")
    val out = graft.stages.SeriesStats.robustTrend(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).head
    // 55 pairs; median pairwise slope stays exactly 2
    assert(out._4 == 55L)
    assert(out._3 == 2.0, s"sen_slope ${out._3}")
    // S: all pairs increasing except those crossing the spike downward —
    // still strongly positive
    assert(out._2 > 30L, s"mk_s ${out._2}")

    // perfectly decreasing series: S = -n_pairs, negative slope
    val dec = (0L until 10L).map(t => (2L, t, -3.0 * t)).toDF("user_id", "t", "x")
    val o2 = graft.stages.SeriesStats.robustTrend(dec).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).head
    assert(o2 == ((-45L, -3.0, 45L)))
  }

  test("retentionCohorts: first-touch cohorts, offset 0 is cohort size") {
    // period 100: u1 first in p0, active p0/p1/p3; u2 first in p0, active
    // p0 only; u3 first in p1, active p1/p3 (offset 2 from ITS cohort)
    val ev = Seq(
      (1L, 10L), (1L, 150L), (1L, 160L), (1L, 350L),
      (2L, 50L),
      (3L, 110L), (3L, 390L))
      .toDF("user_id", "tm")
    val out = TimeJoins.retentionCohorts(ev, periodMs = 100L)
      .orderBy("cohort", "period_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 0L, 2L),   // u1, u2
      (0L, 1L, 1L),   // u1
      (0L, 3L, 1L),   // u1
      (1L, 0L, 1L),   // u3
      (1L, 2L, 1L)))  // u3
  }
}
