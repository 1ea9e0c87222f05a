package graft

import graft.pipelines.Dedup
import org.apache.spark.sql.functions._

/** The bucketed-index contract: a shingle index written with bucketBy makes
  * the shingle-keyed candidate join exchange-free — both sides read
  * pre-hashed buckets, so the plan shows SortMergeJoin over two bucketed
  * scans with NO Exchange between scan and join. This is the co-located-join
  * technique the 100TB dedup pipeline rests on.
  */
class BucketedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val table = "graft_test_shingle_idx"

  test("bucketed shingle index joins without a shuffle and matches inline dedup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap here at all"),
      (4L, "completely different text with no overlap here at all indeed"),
      (5L, "unrelated content entirely")).toDF("doc_id", "text")

    spark.sql(s"DROP TABLE IF EXISTS $table")
    Dedup.writeShingleIndex(docs, n = 3, table = table, buckets = 4)

    // the candidate join over the persisted index must be exchange-free on
    // the join key: bucketed scans satisfy the join's hash distribution
    val sh = spark.table(table)
    val joined = sh.as("a").join(sh.as("b"), "shingle")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(shingle"),
      s"bucketed self-join must not re-shuffle on shingle:\n$plan")

    // same answers as the inline (session-persisted) pair generator
    val fromIndex = Dedup.ngramJaccardPairsFromIndex(spark, table, threshold = 0.3, maxDf = 100)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3, maxDf = 100)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex == inline && fromIndex.contains((1L, 2L)) && fromIndex.contains((3L, 4L)),
      s"index pairs $fromIndex != inline pairs $inline")

    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
