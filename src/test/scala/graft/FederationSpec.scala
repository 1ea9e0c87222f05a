package graft

import graft.serve.Federation
import graft.serve.Federation.PartitionWindow

/** Federation merge-policy determinism.
  *
  * The overlapping-window (coordinator) path must dedup duplicated samples
  * with the FIRST-partition-wins policy deterministically (ref:
  * TimeSeriesUnfoldAggregator.java:270-276) — when two overlapping
  * partitions carry CONFLICTING values for the same (series, ts), the
  * earliest-starting partition's value survives, every run.
  */
class FederationSpec extends SparkTestBase {

  test("overlap dedup: earliest partition wins on conflicting values") {
    // p0 starts first and says 1.0 at t1/t2; p1 overlaps and says 99.0
    val p0 = samplesDF(series("name:m,dc:a", Seq(Some(1.0), Some(1.0), None)))
    val p1 = samplesDF(series("name:m,dc:a", Seq(None, Some(99.0), Some(3.0))))
    val parts = Seq(
      PartitionWindow("p0", g.startMs, g.startMs + 5 * g.stepMs) -> p0,
      PartitionWindow("p1", g.startMs + g.stepMs, g.startMs + 8 * g.stepMs) -> p1)
    assert(Federation.hasOverlappingPartitions(parts.map(_._1)))
    for (_ <- 1 to 3) { // determinism: same survivor on repeated evaluation
      assertSeries(
        Federation.query(spark, parts, g, "fetch name:m"),
        Map("dc:a,name:m" -> (Seq(Some(1.0), Some(1.0), Some(3.0)) ++ Seq.fill(7)(None))))
    }
  }

  test("unknown resolved partition raises the catalog 404 equivalent") {
    val ex = intercept[Federation.PartitionNotFoundException](
      Federation.requirePartitions(Set("idx_a", "idx_b"), Seq("idx_a", "nonexistent_index")))
    assert(ex.getMessage == "no such index [nonexistent_index]")
    Federation.requirePartitions(Set("idx_a"), Seq("idx_a", "idx_a")) // known: no raise
  }

  test("overlap dedup: order of the parts seq does not change the survivor") {
    val p0 = samplesDF(series("name:m,dc:a", Seq(Some(7.0))))
    val p1 = samplesDF(series("name:m,dc:a", Seq(Some(13.0))))
    val w0 = PartitionWindow("p0", g.startMs, g.startMs + 5 * g.stepMs)
    val w1 = PartitionWindow("p1", g.startMs + g.stepMs, g.startMs + 8 * g.stepMs)
    // p0 starts earlier regardless of seq order → 7.0 survives both ways
    val want = Map("dc:a,name:m" -> (Seq(Some(7.0)) ++ Seq.fill(9)(None)))
    assertSeries(Federation.query(spark, Seq(w0 -> p0, w1 -> p1), g, "fetch name:m"), want)
    assertSeries(Federation.query(spark, Seq(w1 -> p1, w0 -> p0), g, "fetch name:m"), want)
  }

  test("overlap dedup: identical startMs ties break on window, not seq order") {
    // two windows with the SAME start — the survivor must not depend on how
    // the caller happens to list them; tie-break is (startMs, endMs, name)
    val pa = samplesDF(series("name:m,dc:a", Seq(Some(7.0))))
    val pb = samplesDF(series("name:m,dc:a", Seq(Some(13.0))))
    val wa = PartitionWindow("pa", g.startMs, g.startMs + 3 * g.stepMs)
    val wb = PartitionWindow("pb", g.startMs, g.startMs + 8 * g.stepMs)
    // wa sorts first (same start, earlier end) → 7.0 survives both ways
    val want = Map("dc:a,name:m" -> (Seq(Some(7.0)) ++ Seq.fill(9)(None)))
    assertSeries(Federation.query(spark, Seq(wa -> pa, wb -> pb), g, "fetch name:m"), want)
    assertSeries(Federation.query(spark, Seq(wb -> pb, wa -> pa), g, "fetch name:m"), want)
  }
}
