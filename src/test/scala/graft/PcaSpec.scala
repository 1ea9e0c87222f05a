package graft

import graft.pipelines.Pca
import org.apache.spark.sql.functions._

/** PCA contract the oracle doesn't pin: the learned component recovers the
  * dominant variance axis, projections are centered, and the distributed
  * mean/Gram passes are partition-invariant. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  /** 4-d cloud with variance concentrated on axis 0 (spread ±50) and only
    * ±0.5-scale jitter elsewhere — deterministic, no RNG. */
  private def cloud = spark.range(100).select(
    col("id").as("vec_id"),
    array(
      (col("id").cast("double") - 49.5).cast("float"),
      ((col("id") % 7).cast("double") / 7.0 - 0.5).cast("float"),
      ((col("id") % 5).cast("double") / 5.0 - 0.5).cast("float"),
      ((col("id") % 3).cast("double") / 3.0 - 0.5).cast("float"))
      .as("embedding"))

  test("pc1 recovers the dominant axis and projections are centered") {
    val proj = Pca.pc1Projections(cloud, iters = 10, dim = 4)
    val rows = proj.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 100)
    // projections onto the dominant axis span ~±50; mean is ~0
    val vals = rows.map(_._2)
    assert(math.abs(vals.sum / vals.length) < 1e-6)
    assert(vals.map(math.abs).max > 45.0, s"max |pc1| = ${vals.map(math.abs).max}")
    // pc1 must be monotone in the id (the dominant axis IS id−49.5),
    // up to a global sign flip
    val sorted = rows.sortBy(_._1).map(_._2)
    val diffs = sorted.zip(sorted.tail).map { case (a, b) => b - a }
    assert(diffs.forall(_ > 0) || diffs.forall(_ < 0))
  }

  test("pc2 recovers the second axis, decorrelated from pc1") {
    // axis 0 dominates (±50), axis 1 is second (±5 via id*7 mod pattern),
    // axes 2-3 are noise-scale
    val c2 = spark.range(100).select(
      col("id").as("vec_id"),
      array(
        (col("id").cast("double") - 49.5).cast("float"),
        (((col("id") * 7) % 100).cast("double") / 10.0 - 4.95).cast("float"),
        ((col("id") % 5).cast("double") / 5.0 - 0.5).cast("float"),
        ((col("id") % 3).cast("double") / 3.0 - 0.5).cast("float"))
        .as("embedding"))
    val rows = graft.pipelines.Pca.pc2Projections(c2, iters = 20, dim = 4)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // pc1 spans the ±50 axis, pc2 the ±5 axis
    assert(rows.map(r => math.abs(r._1)).max > 45.0)
    val p2max = rows.map(r => math.abs(r._2)).max
    assert(p2max > 4.0 && p2max < 10.0, s"pc2 span $p2max")
    // sample correlation of the two projections is ~0 (deflation removed v1)
    val n = rows.length
    val (m1, m2) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val cov = rows.map(r => (r._1 - m1) * (r._2 - m2)).sum / n
    val s1 = math.sqrt(rows.map(r => (r._1 - m1) * (r._1 - m1)).sum / n)
    val s2 = math.sqrt(rows.map(r => (r._2 - m2) * (r._2 - m2)).sum / n)
    assert(math.abs(cov / (s1 * s2)) < 0.05, s"corr ${cov / (s1 * s2)}")
  }

  test("fused triangular Gram accumulator equals the declarative explode pass bit for bit") {
    // negatives, mixed magnitudes, values large enough that floor(ci*cj*1e9)
    // terms reach ~1e11 — exercises the flush path's arithmetic; and a
    // 13-partition layout so per-partition partials genuinely merge
    val emb = spark.range(257).select(
      col("id").as("vec_id"),
      array(
        (col("id").cast("double") - 128.0).cast("float"),
        (sin(col("id").cast("double") * 0.37) * 9.5).cast("float"),
        ((col("id") % 11).cast("double") - 5.0).cast("float"),
        (-col("id").cast("double") / 3.0).cast("float"))
        .as("embedding"))
    val m = Array(0.1, -2.5, 0.0, 42.0) // any centering vector: same c both paths
    for (parts <- Seq(1, 13)) {
      val centered = Pca.centeredOf(emb.repartition(parts), m, "vec_id", "embedding")
      val fast = Pca.gram(centered, 4)
      val slow = Pca.gramDeclarative(centered, 4)
      for (i <- 0 until 4; j <- 0 until 4)
        assert(fast(i)(j) == slow(i)(j),
          s"g($i)($j) parts=$parts: ${fast(i)(j)} != ${slow(i)(j)}")
    }
  }

  test("Gram accumulator multi-flush path (headroom exhaustion) stays bit-exact") {
    // r15 (ADVICE r14): magnitudes chosen so ONE row's |floor(ci*cj*1e9)|
    // ≈ 2.6e18 — under the 4.0e18 per-value bound, but two rows exhaust the
    // Long.MaxValue/2 headroom, so a 1-partition pass over 6 rows flushes
    // mid-stream ≥2 times; this exercises the BigInt merge + acc reset that
    // the 257-row spec above never reaches (~4e15 of 4.6e18 spent).
    val big = spark.range(6).select(
      col("id").as("vec_id"),
      array(
        (col("id").cast("double") * 100.0 + 50500.0).cast("float"),
        (col("id").cast("double") * (-50.0) - 25000.0).cast("float"))
        .as("embedding"))
    val m = Array(0.0, 0.0)
    val centered = Pca.centeredOf(big.repartition(1), m, "vec_id", "embedding")
    val fast = Pca.gram(centered, 2)
    val slow = Pca.gramDeclarative(centered, 2)
    for (i <- 0 until 2; j <- 0 until 2)
      assert(fast(i)(j) == slow(i)(j),
        s"g($i)($j): ${fast(i)(j)} != ${slow(i)(j)}")
    // and the loud saturation guard: a value past the per-lane bound throws
    // instead of silently saturating toLong
    val over = spark.range(1).select(
      col("id").as("vec_id"),
      array(lit(3.0e9f), lit(0.0f)).as("embedding"))
    val oc = Pca.centeredOf(over, m, "vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] { Pca.gram(oc, 2) }
    assert(e.getMessage != null)
  }

  test("mean/Gram passes are partition-invariant") {
    val a = Pca.pc1Projections(cloud.repartition(1), iters = 5, dim = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Pca.pc1Projections(cloud.repartition(13), iters = 5, dim = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("jl projection preserves expected squared norms and is partition-invariant") {
    // 200 vectors of dim 64, varied magnitudes
    val emb = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (sin(i.cast("double") * 0.7 + col("id").cast("double") * 0.13) *
          (lit(1.0) + (col("id") % 5).cast("double"))).cast("float"))
        .as("embedding"))
    val y = Pca.jlProject(emb).collect()
    val yNorm = y.map(r => (1 to 16).map(c => {
      val v = r.getDouble(c); v * v
    }).sum)
    val xNorm = emb.select(
        aggregate(col("embedding"), lit(0.0),
          (a, v) => a + v.cast("double") * v.cast("double")).as("n"))
      .collect().map(_.getDouble(0))
    // E[‖y‖²] = ‖x‖² for Achlioptas signs; corpus-mean ratio should be near 1
    val ratio = yNorm.sum / xNorm.sum
    assert(ratio > 0.7 && ratio < 1.3, s"norm-preservation ratio $ratio")
    // per-row op ⇒ byte-identical under any partitioning
    val a = Pca.jlProject(emb.repartition(1)).collect().map(_.toSeq).toSet
    val b = Pca.jlProject(emb.repartition(13)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
