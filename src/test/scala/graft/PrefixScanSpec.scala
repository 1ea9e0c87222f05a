package graft

import graft.core.Dist
import org.apache.spark.sql.functions._

/** Pins the two-phase distributed prefix sum (core.Dist.prefixScan):
  * byte-identical to a serial pass for SIGNED values at any partition
  * count, and — r15, VERDICT r14 item 7 — the phase-2 offsets window is
  * never an unpartitioned global window (the "No Partition Defined"
  * WindowExec warning class): with no key columns it partitions by a
  * constant, moving only the BOUNDED per-range-partition totals (one row
  * per partition × key group) to a single task, never the data. */
class PrefixScanSpec extends SparkTestBase {
  import spark.implicits._

  test("prefixScan equals a serial signed cumulative sum at any partition count") {
    // signed values: partition totals must aggregate the value, not max(_scan)
    val rows = (1L to 400L).map(i => (i, if (i % 3 == 0) -2L * i else i))
    val serial = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).tail
    val expect = rows.map(_._1).zip(serial).toMap
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("k", "v").repartition(parts)
      val got = Dist.prefixScan(df, Seq(col("k")), col("v"), Seq(col("k")))
        .select("k", "_scan").as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("phase-2 offsets window is partitioned (no global-window plan node)") {
    val df = (1L to 100L).map(i => (i, i)).toDF("k", "v").repartition(13)
    val out = Dist.prefixScan(df, Seq(col("k")), col("v"), Seq(col("k")))
    out.count() // execute so the final plan (incl. AQE) is available
    val plan = out.queryExecution.executedPlan.toString
    // an UNPARTITIONED window renders windowspecdefinition(<order> ASC ...,
    // frame) with no leading partition expression; both windows here must
    // carry one (phase 1: _pid [+ keys]; phase 2: the constant / keys)
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(specs.nonEmpty, s"no window in plan:\n$plan")
    specs.foreach { s =>
      val beforeOrder = s.split(" ASC| DESC").head
      // a partitioned spec lists partition expr(s) before the first order
      // column, i.e. at least one comma-separated term precedes it
      assert(beforeOrder.contains(","),
        s"unpartitioned window spec '$s' in plan:\n$plan")
    }
  }
}
