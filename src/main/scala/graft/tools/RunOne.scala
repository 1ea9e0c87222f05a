package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query and show result/plan.
  * usage: runMain graft.tools.RunOne <queryName> [sfDir] [explain|show|count]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "show"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    mode match {
      case "explain" => df.explain("formatted")
      case "count"   => println(s"rows=${df.count()}")
      case "time"    =>
        // two timed evaluations after a warmup, mirroring Bench's min-of-N
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val times = Seq(once(), once())
        println(f"secs_min=${times.min}%.2f secs=${times.mkString(",")}")
      case s if s.startsWith("save:") =>
        // dump result parquet for ad-hoc DuckDB oracle comparison
        df.coalesce(1).write.mode("overwrite").parquet(s.stripPrefix("save:"))
        println(s"saved rows=${spark.read.parquet(s.stripPrefix("save:")).count()}")
      case _         => df.show(30, truncate = false); println(s"rows=${df.count()}")
    }
    spark.stop()
  }
}
