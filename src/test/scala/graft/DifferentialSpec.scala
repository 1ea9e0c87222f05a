package graft

import graft.lang.m3.M3QL
import org.apache.spark.sql.functions._

/** Differential correctness runs — the Spark analogue of the reference's
  * pushdown-on-vs-off oracle (multi_index_pushdown_comparison_rest_it.yaml):
  * the same query must produce identical results under different physical
  * configurations (1 shuffle partition vs many, repartitioned input, codegen
  * on/off). Catches any operator whose result depends on partitioning or
  * evaluation mode — the property that makes results stable from local[4]
  * to a 1000-executor cluster.
  */
class DifferentialSpec extends SparkTestBase {
  private val S = Some(_: Double)
  private val N = Option.empty[Double]

  private def fx = samplesDF(
    series("name:m,dc:a", Seq(S(1), S(2), S(3), S(4), N, N, S(7), S(8), N, S(10))) ++
    series("name:m,dc:b", Seq(S(10), S(20), N, S(40), S(50), N, S(70), N, N, S(100))) ++
    series("name:x,dc:a", Seq(S(5), S(4), S(3), S(2), S(1), S(2), S(3), S(4), S(5), S(6))))

  private val queries = Seq(
    "fetch name:m | sum dc",
    "fetch name:m | movingAverage 3m",
    "fetch name:m | transformNull 0 | integral",
    "b = fetch name:x; fetch name:m dc:a | asPercent(b) dc",
    "fetch name:m | percentileOfSeries 75",
    "fetch name:m | topK 1 sum",
    "fetch name:m | summarize 2m avg true | derivative")

  private def runAll(partitions: Int, codegen: Boolean,
                     aqe: Boolean = true): Seq[Map[String, Seq[Option[Double]]]] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    spark.conf.set("spark.sql.codegen.wholeStage", codegen)
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    try queries.map { q =>
      val df = M3QL.query(spark, fx.repartition(partitions), g, q)
      toGolden(df.drop("_rank"), g)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      spark.conf.set("spark.sql.codegen.wholeStage", true)
      spark.conf.set("spark.sql.adaptive.enabled", true)
    }
  }

  test("results identical across partitioning, codegen, and AQE configurations") {
    val base = runAll(partitions = 1, codegen = true)
    val manyParts = runAll(partitions = 7, codegen = true)
    val noCodegen = runAll(partitions = 4, codegen = false)
    // AQE re-plans joins at runtime (broadcast/build-side flips) — results
    // must not depend on which physical strategy it lands on
    val noAqe = runAll(partitions = 4, codegen = true, aqe = false)
    queries.indices.foreach { i =>
      assert(base(i) == manyParts(i), s"partitioning changed result of: ${queries(i)}")
      assert(base(i) == noCodegen(i), s"codegen mode changed result of: ${queries(i)}")
      assert(base(i) == noAqe(i), s"AQE mode changed result of: ${queries(i)}")
    }
  }

  private val promQueries = Seq(
    "topk(1, m)",
    """m{dc="a"} / on(dc) x""",
    "m * on(dc) group_left x",
    "(m > 3) or x",
    "predict_linear(m[3m], 60)",
    "holt_winters(m[5m], 0.5, 0.5)",
    "quantile(0.5, m)",
    """count_values("v", m)""",
    "increase(m[3m])",
    "delta(x[3m])",
    "mad_over_time(x[2m])",
    "irate(m[2m])",
    """sum_over_time(x[2m] @ 300)""",
    "m - scalar(x)",
    "m / time()",
    "vector(scalar(x) * 2)",
    "m > bool scalar(x)",
    "limitk(1, m)",
    "limit_ratio(0.5, m)",
    """sort_by_label(m, "dc")""",
    "double_exponential_smoothing(m[5m], 0.5, 0.5)",
    // the round-7 carried-subquery paths: selector carry, carried pointwise
    // chain with a filter, carried aggregation, and a no-carry rate inner —
    // all ride per-series windows + joins that must not depend on layout
    "sum_over_time(m[2m:1m])",
    "sum_over_time((m * 2 > 8)[2m:1m])",
    "max_over_time(sum(m)[2m:1m])",
    "max_over_time(rate(m[2m])[4m:1m])")

  private def runProm(partitions: Int,
                      aqe: Boolean = true): Seq[Map[String, Seq[Option[Double]]]] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    try promQueries.map { q =>
      toGolden(graft.lang.prom.PromQL.query(spark, fx.repartition(partitions), g, q)
        .drop("_rank"), g)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      spark.conf.set("spark.sql.adaptive.enabled", true)
    }
  }

  test("PromQL results identical across partitionings and AQE modes") {
    val base = runProm(1)
    val many = runProm(7)
    // vector matching is the path where AQE's build-side choice once
    // changed observable behavior — pin result invariance
    val noAqe = runProm(4, aqe = false)
    promQueries.indices.foreach { i =>
      assert(base(i) == many(i), s"partitioning changed result of: ${promQueries(i)}")
      assert(base(i) == noAqe(i), s"AQE mode changed result of: ${promQueries(i)}")
    }
  }

  test("sequence packing prefix sum identical across partitionings") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, ("tok " * (i % 17 + 1).toInt).trim))
      .toDF("doc_id", "text")
    def pack(n: Int): Seq[(Long, Long, Long)] =
      graft.pipelines.TextAnalysis.packSequences(docs.repartition(n), budgetTokens = 64L)
        .select("doc_id", "start_offset", "shard_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val serial = pack(1)
    assert(serial == pack(7), "partitioning changed the packing prefix sum")
    // spot-check the serial semantics: doc 1 starts at 0, shard boundaries
    // at multiples of 64
    assert(serial.head == ((1L, 0L, 0L)))
    assert(serial.forall { case (_, off, shard) => shard == off / 64 })
  }

  test("connected components identical across partitionings") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("doc_id_a", "doc_id_b")
    def cl(n: Int): Set[(Long, Long)] =
      graft.pipelines.Dedup.clusterPairs(pairs.repartition(n))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cl(1) == cl(7), "partitioning changed cluster assignment")
  }

  test("bigram LM scores identical across partitionings") {
    import spark.implicits._
    val docs = (1L to 60L).map(i =>
        (i, (1 to (i % 9 + 2).toInt).map(j => s"w${(i + j) % 13}").mkString(" "),
          "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def score(n: Int): Seq[(Long, Long, Double)] =
      graft.pipelines.TextAnalysis.lmScore(docs.repartition(n))
        .select("doc_id", "n_bigrams", "lm_score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // the decimal-folded mean must be bit-identical however rows land
    assert(score(1) == score(7), "partitioning changed an LM score")
  }

  test("prefixScan matches a serial fold on signed values, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map(i => (i, rnd.between(-50L, 50L)))
    val df = rows.toDF("id", "delta")
    val serial = rows.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (id, d)) =>
      (id, acc + d) }.drop(1).toMap
    for (n <- Seq(1, 7, 32)) {
      val got = graft.core.Dist.prefixScan(
          df.repartition(n), Seq(col("id")), col("delta"), Seq(col("id")))
        .select("id", "_scan").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == serial, s"signed prefix scan diverged at $n partitions")
    }
  }

  test("asof join identical across partitionings") {
    import spark.implicits._
    val left = (1L to 100L).map(i => ("k" + i % 5, i * 10L, i)).toDF("k", "ts", "id")
    val right = (1L to 40L).map(i => ("k" + i % 5, i * 23L, i * 1.5)).toDF("k", "ts", "v")
    def run(n: Int): Seq[(String, Long, Option[Double])] =
      graft.stages.TimeJoins.asofJoin(left.repartition(n), right.repartition(n), Seq("k"))
        .select("k", "ts", "r_v").collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toSeq.sortBy(t => (t._1, t._2))
    assert(run(1) == run(9), "partitioning changed an as-of match")
  }
}
