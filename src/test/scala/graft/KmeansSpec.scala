package graft

import graft.pipelines.Similarity
import org.apache.spark.sql.functions._

/** Portable k-means properties the cluster_topics_kmeans oracle doesn't pin:
  * partition invariance, separation recovery, and monotone inertia. */
class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  /** Three well-separated blobs in 4-d (deterministic offsets, no RNG). */
  private def blobs = spark.range(90).select(
    col("id").as("vec_id"),
    transform(sequence(lit(0), lit(3)), i =>
      ((col("id") % 3) * 10 + (col("id") + i) % 2 * 0.25).cast("float"))
      .as("embedding"))

  test("kmeansTopics never splits a separated blob across clusters") {
    val out = Similarity.kmeansTopics(blobs, k = 3, iters = 2)
    assert(out.count() == 90)
    // every vector of a blob lands in ONE cluster (blobs may merge when the
    // hash seeding drops two seeds into one blob — standard Lloyd — but a
    // blob must never split)
    val purity = out.withColumn("blob", col("vec_id") % 3)
      .groupBy("blob").agg(countDistinct("cluster").as("nc"))
      .as[(Long, Long)].collect()
    assert(purity.forall(_._2 == 1L))
    val nClusters = out.select("cluster").distinct().count()
    assert(nClusters >= 2 && nClusters <= 3)
  }

  test("kmeansTopics is partition-invariant") {
    val a = Similarity.kmeansTopics(blobs.repartition(1), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.kmeansTopics(blobs.repartition(11), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("total inertia does not increase with more Lloyd rounds") {
    def inertia(iters: Int): Double =
      Similarity.kmeansTopics(blobs, k = 4, iters = iters)
        .agg(sum("dist2")).as[Double].head()
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1 + 1e-9, s"inertia rose: $i1 -> $i3")
  }

  test("kcenterCoreset picks farthest-first with non-increasing radius") {
    // 1-d line embedded in 2-d: 0@0, 1@1, 2@4, 3@10 — from seed 0 the greedy
    // must walk 3 (d²=100), then 2 (min-d² to {0,3}: 16), then 1 (1).
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(4.0f, 0.0f)), (3L, Array(10.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterCoreset(pts, k = 4, seedId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy(_._3)
    assert(got.map(_._1).toSeq == Seq(0L, 3L, 2L, 1L), got.mkString(","))
    assert(got.map(_._2).toSeq == Seq(0.0, 100.0, 16.0, 1.0))
    // covering radius is non-increasing after the seed
    val radii = got.drop(1).map(_._2)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a })
    // k > n: returns all points, no crash
    assert(Similarity.kcenterCoreset(pts, k = 10, seedId = 0L).count() == 4)
  }
}
