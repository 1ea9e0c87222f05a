package graft

import graft.pipelines.Sketches
import org.apache.spark.sql.functions._

/** HLL contract the oracle doesn't pin: estimation accuracy vs exact
  * distinct counts, partition invariance (register max is order-free), and
  * the small-range correction branch. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("estimate lands within 3 standard errors of the exact count") {
    // m=64 → se ≈ 1.04/sqrt(64) ≈ 13%; 3σ ≈ 39%
    val df = spark.range(20000).select(
      (col("id") % 2).cast("string").as("g"),
      (col("id") % 5000).as("v"))
    val got = Sketches.hllDistinct(df, col("v"), Seq(col("g")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // each group sees 2500 distinct values
    got.values.foreach { e =>
      assert(math.abs(e - 2500.0) / 2500.0 < 0.39, s"estimate $e vs 2500")
    }
  }

  test("register state is partition-invariant") {
    val base = spark.range(5000).select(lit("x").as("g"), (col("id") % 700).as("v"))
    val a = Sketches.hllDistinct(base.repartition(1), col("v"), Seq(col("g")))
      .collect().map(_.getDouble(1)).head
    val b = Sketches.hllDistinct(base.repartition(17), col("v"), Seq(col("g")))
      .collect().map(_.getDouble(1)).head
    assert(a == b)
  }

  test("merging disjoint groups' registers equals the direct global sketch") {
    val df = spark.range(8000).select(
      (col("id") % 3).cast("string").as("g"), (col("id") % 1100).as("v"))
    val direct = Sketches.hllDistinct(df, col("v"), Seq(lit(1).as("one")))
      .collect().map(_.getDouble(1)).head
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(
        Sketches.hllRegisters(df, col("v"), Seq(col("g"))), Seq.empty),
      Seq.empty).collect().map(_.getDouble(0)).head
    assert(merged == direct, s"merged $merged != direct $direct")
  }

  test("cms never under-counts; tight at generous width, loose when crowded") {
    val df = spark.range(3000).select(
      concat(lit("v"), (col("id") % 50).cast("string")).as("v"), lit(1L).as("wt"))
    val probes = df.groupBy("v").agg(sum("wt").as("exact"))
    // width 256 >> 50 values: estimates may still collide but never under
    val wide = Sketches.cmsEstimate(
        Sketches.cmsCounters(df, col("v"), col("wt")), probes, col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(wide.forall { case (exact, est) => est >= exact })
    // width 4 << 50 values: collisions are forced, some estimate must exceed
    val tight = Sketches.cmsEstimate(
        Sketches.cmsCounters(df, col("v"), col("wt"), w = 4),
        probes, col("v"), w = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tight.forall { case (exact, est) => est >= exact })
    assert(tight.exists { case (exact, est) => est > exact })
  }

  test("cms counters merge by addition into the direct counters") {
    val df = spark.range(4000).select(
      (col("id") % 2).as("half"),
      concat(lit("v"), (col("id") % 90).cast("string")).as("v"), lit(1L).as("wt"))
    val direct = Sketches.cmsCounters(df, col("v"), col("wt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.cmsCounters(df.where(col("half") === 0), col("v"), col("wt"))
      .union(Sketches.cmsCounters(df.where(col("half") === 1), col("v"), col("wt")))
      .groupBy("j", "b").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct)
  }

  test("histogram quantiles land within one bucket width of exact") {
    val df = spark.range(10000).select((col("id").cast("double") / 7.0).as("v"))
    val est = Sketches.histQuantiles(
        Sketches.histCounts(df, col("v"), scale = 1.0), Seq(0.5, 0.9), scale = 1.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // exact nearest-rank: value at ceil(p*n) of 0/7, 1/7, ... 9999/7
    def exact(p: Double): Double = (math.ceil(p * 10000).toLong - 1) / 7.0
    Seq(0.5, 0.9).foreach { p =>
      assert(math.abs(est(p) - exact(p)) <= 1.0, s"p=$p est=${est(p)} exact=${exact(p)}")
    }
  }

  test("histogram counts merge by addition into the direct histogram") {
    val df = spark.range(5000).select((col("id") % 2).as("half"),
      (col("id").cast("double") / 3.0).as("v"))
    val direct = Sketches.histCounts(df, col("v"), 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Sketches.histCounts(df.where(col("half") === 0), col("v"), 1.0)
      .union(Sketches.histCounts(df.where(col("half") === 1), col("v"), 1.0))
      .groupBy("b").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct)
  }

  test("small cardinalities route through the linear-counting branch") {
    val tiny = spark.range(1000).select(lit("x").as("g"), (col("id") % 7).as("v"))
    val e = Sketches.hllDistinct(tiny, col("v"), Seq(col("g")))
      .collect().map(_.getDouble(1)).head
    // linear counting m*ln(m/V) is near-exact at 7 of 64 buckets filled
    assert(math.abs(e - 7.0) < 2.0, s"small-range estimate $e vs 7")
  }

  test("kmv estimate lands within 3 standard errors of the exact count") {
    // k=256 → se ≈ 1/sqrt(k-2) ≈ 6.3%; 3σ ≈ 19%
    val df = spark.range(40000).select((col("id") % 10000).as("v"))
    val e = Sketches.kmvEstimate(
        Sketches.kmvSketch(df, col("v"), Seq.empty), Seq.empty)
      .collect().map(_.getDouble(0)).head
    assert(math.abs(e - 10000.0) / 10000.0 < 0.19, s"kmv estimate $e vs 10000")
  }

  test("kmv below k slots is the exact distinct count; sketch is partition-invariant") {
    val tiny = spark.range(2000).select((col("id") % 97).as("v"))
    val e = Sketches.kmvEstimate(
        Sketches.kmvSketch(tiny, col("v"), Seq.empty), Seq.empty)
      .collect().map(_.getDouble(0)).head
    assert(e == 97.0, s"exact branch gave $e")
    val big = spark.range(30000).select((col("id") % 8000).as("v"))
    val a = Sketches.kmvSketch(big.repartition(1), col("v"), Seq.empty)
      .orderBy("_h").collect().map(_.getLong(0)).toSeq
    val b = Sketches.kmvSketch(big.repartition(17), col("v"), Seq.empty)
      .orderBy("_h").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 256)
  }

  test("kmv overlap estimates track exact set algebra within 3σ") {
    // A = [0, 6000), B = [3000, 9000): |A∪B| = 9000, |A∩B| = 3000
    val df = spark.range(40000).select((col("id") % 9000).as("v"))
    val skA = Sketches.kmvSketch(df.where(col("v") < 6000), col("v"), Seq.empty)
    val skB = Sketches.kmvSketch(df.where(col("v") >= 3000), col("v"), Seq.empty)
    val r = Sketches.kmvOverlap(skA, skB).collect().head
    val (ea, eb, eu, ei) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(ea - 6000.0) / 6000.0 < 0.19, s"est_a $ea")
    assert(math.abs(eb - 6000.0) / 6000.0 < 0.19, s"est_b $eb")
    assert(math.abs(eu - 9000.0) / 9000.0 < 0.19, s"est_union $eu")
    // intersection samples ~k/3 hashes → wider band
    assert(math.abs(ei - 3000.0) / 3000.0 < 0.35, s"est_inter $ei")
  }

  test("streaming kmv bucket states reduce to the batch sketch") {
    val df = spark.range(30000).select((col("id") % 8000).as("v"))
    val red = graft.streaming.KmvStream.finalizeSketch(
        graft.streaming.KmvStream.kmvBuckets(df, col("v")))
      .orderBy("_h").collect().map(_.getLong(0)).toSeq
    val batch = Sketches.kmvSketch(df, col("v"), Seq.empty)
      .orderBy("_h").collect().map(_.getLong(0)).toSeq
    assert(red == batch && red.size == 256)
  }

  test("kmv overlap of small exact sets is exact") {
    val a = spark.range(100).select(col("id").as("v"))       // [0, 100)
    val b = spark.range(150).select((col("id") + 60).as("v")) // [60, 210)
    val r = Sketches.kmvOverlap(
      Sketches.kmvSketch(a, col("v"), Seq.empty),
      Sketches.kmvSketch(b, col("v"), Seq.empty)).collect().head
    assert(r.getDouble(0) == 100.0 && r.getDouble(1) == 150.0 &&
      r.getDouble(2) == 210.0 && r.getDouble(3) == 40.0)
  }
}
