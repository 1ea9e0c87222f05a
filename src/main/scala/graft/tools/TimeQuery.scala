package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registry query N times in a single session — the
  * bench's warm-run shape without the full suite. Usage:
  * `runMain graft.tools.TimeQuery <name> [sfDir] [n]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
    // ad-hoc conf A/B: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        require(kv.contains("="), s"bad SPARK_GRAFT_EXTRA_CONF entry (no '='): $kv")
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[timequery] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$c)")
    }
    graft.core.Memo.clearSession(spark)
    spark.stop()
  }
}
