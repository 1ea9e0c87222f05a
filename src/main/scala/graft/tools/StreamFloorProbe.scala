package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the streaming family's FIXED FLOOR (r12 verdict item 5): how
  * much of a registry streaming query's ~1.8s isolated-warm cost is Spark's
  * own start/trigger/commit machinery versus our row work or sizing.
  *
  * Probes, each drained min-of-N on a 2-file / 20-row json source (so row
  * work is ~zero and ONLY the machinery is on the clock):
  *   - `floor_stateless`: readStream → memory sink, append — stream start
  *     + 2 offset/commit log round-trips, no state store.
  *   - `floor_stateful_8` / `floor_stateful_4`: the same source through an
  *     update-mode groupBy count at 8 / 4 shuffle partitions — adds
  *     per-trigger state-store commits (the registry drain's default 8 and
  *     the small-key queries' 4).
  *   - `floor_nodata_off`: stateful_4 with
  *     `spark.sql.streaming.noDataMicroBatches.enabled=false` — AvailableNow
  *     appends a final NO-DATA micro-batch (one more offset+commit+state
  *     round-trip) that update-mode monotone-snapshot queries never need.
  *
  * Then three real registry queries (min-of-2 warm) for the comparison
  * line. Run: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.StreamFloorProbe`.
  * Findings land in OPERATORS.md next to the state-shuffle sweep. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // r14 (guide §2/§6): let AQE re-plan CACHED frames too — the default
      // pins every memoized frame to the raw shuffle layout (32 one-task
      // partitions here), so each consumer stage pays full task fan-out to
      // read a few MB; with AQE the cached layout coalesces to the advisory
      // partition size (size-adaptive — big frames keep their partitions).
      // Output VALUES never depend on partitioning (DifferentialSpec /
      // PartitionInvarianceSpec pin this); measured: retrieval_bm25 warm
      // 1.6-1.8s -> 0.8-0.9s.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // GRAFT_FLOOR_DIR relocates the staging/checkpoint dirs (e.g. to
    // /dev/shm) to isolate how much of the floor is checkpoint-log fsync
    val base = sys.env.get("GRAFT_FLOOR_DIR") match {
      case Some(d) => java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(d), "graft_floor")
      case None => java.nio.file.Files.createTempDirectory("graft_floor")
    }
    val src = s"$base/src"
    // two files => two triggers under maxFilesPerTrigger=1, the registry
    // queries' standard multi-trigger state-carry shape
    spark.range(20).selectExpr("id AS k", "id * 2 AS v")
      .coalesce(2).write.mode("overwrite").json(src)

    var ckptSeq = 0
    def drainOnce(parts: Int, stateful: Boolean, noData: Boolean): Double = {
      ckptSeq += 1
      val ckpt = s"$base/ckpt$ckptSeq"
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val prevNoData =
        spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noData.toString)
      val t0 = System.nanoTime()
      try {
        val in = spark.readStream.option("maxFilesPerTrigger", 1)
          .schema("k BIGINT, v BIGINT").json(src)
        val out = if (stateful) in.groupBy(pmod(col("k"), lit(8)).as("g"))
          .agg(count(lit(1)).as("n"), max("v").as("mv")) else in
        val q = out.writeStream.format("memory")
          .queryName(s"floor_out$ckptSeq")
          .outputMode(if (stateful) "update" else "append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(); q.stop()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        prevNoData match {
          case Some(v) =>
            spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
          case None =>
            spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
        }
        spark.sql(s"DROP TABLE IF EXISTS floor_out$ckptSeq")
      }
      (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Double): Double = Seq.fill(n)(f).min

    // one untimed warm-up so codegen/JIT/parquet-free JSON paths are hot
    drainOnce(8, stateful = true, noData = true)

    val floors = Seq(
      "floor_stateless" -> minOf(3)(drainOnce(8, stateful = false, noData = true)),
      "floor_stateful_8" -> minOf(3)(drainOnce(8, stateful = true, noData = true)),
      "floor_stateful_4" -> minOf(3)(drainOnce(4, stateful = true, noData = true)),
      // r14: the 4-vs-8 sweep never probed BELOW 4 — for the handful-of-keys
      // sketch streams the remaining commit fan-out at 4 may still dominate
      "floor_stateful_2" -> minOf(3)(drainOnce(2, stateful = true, noData = true)),
      "floor_stateful_1" -> minOf(3)(drainOnce(1, stateful = true, noData = true)),
      "floor_nodata_off_4" -> minOf(3)(drainOnce(4, stateful = true, noData = false)))

    val queries = Seq("streaming_kmv_distinct", "streaming_hll_distinct",
      "streaming_ingest_roundtrip")
    val regTimes = queries.map { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (shared derived inputs, codegen)
      n -> minOf(2)(once())
    }

    println("| probe | min sec |")
    println("|---|---|")
    (floors ++ regTimes).foreach { case (n, s) => println(f"| $n | $s%.2f |") }
    graft.core.Memo.clearSession(spark)
    spark.stop()
  }
}
